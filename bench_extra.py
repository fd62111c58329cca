"""Round-7 optimization harness (guide §1): per-query noop-sink isolation,
repeated timings, and .explain("formatted") capture for every headline
query. Does NOT touch bench.py (frozen for measurement).

Usage:
  python bench_extra.py plans [out_dir]         # capture explain for all queries
  python bench_extra.py time  [n] [q1 q2 ...]   # time each query n times (noop sink)
  python bench_extra.py cdc   [n]               # time the CDC replay n times
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_items",
    "reduce_multiop_orders",
    "window_lag_diff",
    "sessionize_events",
    "tumbling_hourly",
    "token_stats_by_lang",
    "ngram_jaccard_docs",
    "minhash_lsh_docs",
    "embedding_topk",
    "q7_volume_shipping",
    "q21_waiting_suppliers",
]


def make_session():
    from bench import make_session as bench_session

    return bench_session(int(CPUS))


def capture_plans(out_dir: str, suffix: str = "", names=None):
    import __spark_entry__ as entry_mod
    from datavec_spark.cache import release_tracked

    spark = make_session()
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    for name in names or HEADLINE:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(plan)
        release_tracked()
        print(f"wrote {name} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


def time_queries(n: int, names=None):
    import __spark_entry__ as entry_mod
    from datavec_spark.cache import release_tracked

    spark = make_session()
    qs = entry_mod.queries()
    names = names or HEADLINE
    # warm-up (mirrors bench.py)
    qs[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    release_tracked()
    out = {}
    for name in names:
        samples = []
        for _ in range(n):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            release_tracked()
        out[name] = samples
        print(f"{name}: {samples} (min {min(samples)})")
    print(json.dumps({"times": out,
                      "total_min": round(sum(min(v) for v in out.values()), 3)}))
    spark.stop()


def time_cdc(n: int):
    from bench import cdc_fixture, run_cdc_replay

    spark = make_session()
    n_ev = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "500000"))
    fx = cdc_fixture(spark, n_ev, n_base=100000, n_repos=2000, paths_per_repo=100)
    samples = []
    for _ in range(n):
        r = run_cdc_replay(spark, fx)
        samples.append(r["wall_sec"])
        print(f"cdc_replay: {r['wall_sec']} s ({r['events_per_sec']} ev/s)")
    print(json.dumps({"cdc_replay": samples, "min": min(samples)}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "plans":
        out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "plans", "r07")
        suffix = sys.argv[3] if len(sys.argv) > 3 else ""
        capture_plans(out, suffix, sys.argv[4:] or None)
    elif mode == "time":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        time_queries(n, sys.argv[3:] or None)
    elif mode == "cdc":
        time_cdc(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
