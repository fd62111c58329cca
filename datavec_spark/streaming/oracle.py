"""Pure-Python replay oracle for the CDC engine.

Replays base rows + events sequentially in `seq` order (the reference
semantics of a binlog), deduplicating by `seq`, applying last-writer-wins
per (repo, path) and schema-evolution ops in commit order. The expected
final state is the set of (repo, path, sha256(content)) plus the final
schema — the per-row invariant demanded by BASELINE.json `input_hint`.

Mirrors DataVec's expected-rows execution tests
(datavec-spark/src/test/java/org/datavec/spark/transform/ExecutionTest.java:55-69)
and schema round-trip tests (transform/schema/TestJsonYaml.java).
"""

from __future__ import annotations

from datavec_spark.streaming.datagen import sha256_hex

BASE_SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]

_WIDEN_OK = {("int", "long"), ("float", "double"), ("int", "double")}


def replay(base_rows: list[dict], events: list[dict]):
    """Returns (final_rows: dict[(repo,path)] -> row dict, schema: list[(name,type)]).

    Events may contain duplicate seqs (applied once) and arrive in any
    order in the list — they are sorted by seq (binlog commit order)."""
    schema = list(BASE_SCHEMA)
    state: dict[tuple[str, str], dict] = {}
    for r in base_rows:
        state[(r["repo"], r["path"])] = {**r, "seq": 0}

    seen: set[int] = set()
    for ev in sorted(events, key=lambda e: e["seq"]):
        if ev["seq"] in seen:
            continue
        seen.add(ev["seq"])
        op = ev["op"]
        if op in ("add_column", "rename_column", "widen_column"):
            sc = ev["schema_change"]
            names = [n for n, _ in schema]
            if op == "add_column":
                assert sc["col_name"] not in names
                schema.append((sc["col_name"], sc["new_type"]))
            elif op == "rename_column":
                i = names.index(sc["col_name"])
                schema[i] = (sc["new_name"], schema[i][1])
            else:
                i = names.index(sc["col_name"])
                assert (schema[i][1], sc["new_type"]) in _WIDEN_OK
                schema[i] = (schema[i][0], sc["new_type"])
            continue
        key = (ev["repo"], ev["path"])
        if op == "delete":
            state.pop(key, None)
        else:  # insert / update: full-row image, LWW by seq
            state[key] = {
                "repo": ev["repo"],
                "path": ev["path"],
                "commit": ev["commit"],
                "lang": ev["lang"],
                "content": ev["content"],
                "seq": ev["seq"],
            }
    return state, schema


def expected_key_hashes(state: dict) -> set[tuple[str, str, str]]:
    return {(r["repo"], r["path"], sha256_hex(r["content"])) for r in state.values()}
