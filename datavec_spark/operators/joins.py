"""Join: DataVec Join-spec semantics on Catalyst joins.

Reference (transform/join/Join.java:35): equi-join on n key columns where
left names may differ from right; types Inner/LeftOuter/RightOuter/FullOuter;
output schema = left columns ++ right-minus-right-keys (Join.java:181-204);
key value taken from whichever side is non-null (joinExamples, 214-265).

Lowering: df.join with a key-equality condition; the key columns are
coalesced (outer joins) and right keys dropped. Catalyst picks
broadcast-hash / shuffled-hash / sort-merge and AQE handles skew — the
reference's manual cogroup+cartesian (SparkTransformExecutor.java:332-354,
one unconditional shuffle, no broadcast, no skew handling) is obsolete.
`broadcast_right=True` force-plans a broadcast for known-small dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datavec_spark.operators.transforms import op

_JOIN_TYPES = {
    "Inner": "inner",
    "LeftOuter": "left_outer",
    "RightOuter": "right_outer",
    "FullOuter": "full_outer",
}


def join(
    left: DataFrame,
    right: DataFrame,
    join_type: str,
    left_keys: list[str],
    right_keys: list[str] | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    right_keys = right_keys or left_keys
    r = F.broadcast(right) if broadcast_right else right
    lk = [f"__lk_{i}" for i in range(len(left_keys))]
    l_aliased = left
    cond = None
    for lkey, rkey in zip(left_keys, right_keys):
        c = left[lkey] == right[rkey]
        cond = c if cond is None else (cond & c)
    joined = l_aliased.join(r, on=cond, how=_JOIN_TYPES[join_type])
    # output schema: left ++ right-minus-right-keys, with key values coalesced
    out_cols = []
    for c in left.columns:
        if c in left_keys:
            rkey = right_keys[left_keys.index(c)]
            out_cols.append(F.coalesce(left[c], right[rkey]).alias(c))
        else:
            out_cols.append(left[c])
    for c in right.columns:
        if c not in right_keys:
            out_cols.append(right[c])
    return joined.select(*out_cols)


@op("join")
def _join_op(df, right_df, join_type, left_keys, right_keys=None, broadcast_right=False):
    return join(df, right_df, join_type, left_keys, right_keys, broadcast_right)
