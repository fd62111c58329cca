"""Geo ops: IP→location lookup and coordinate-string reductions.

Reference parity:
- IPAddressToLocationTransform / IPAddressToCoordinatesTransform
  (datavec-geo/.../transform/geo/IPAddressToLocationTransform.java:46,
  IPAddressToCoordinatesTransform.java:30, tested in
  datavec-geo/src/test/.../TestGeoTransforms.java): IP string → location
  attribute (city/country/coordinates...) via a GeoIP database. The
  reference embeds a MaxMind reader per executor; here the database is an
  ordinary *IP-range lookup table* (lo_ip, hi_ip, city, country, lat, lon —
  the public GeoLite CSV shape) and the lookup is a BROADCAST range join:
  the GeoIP table is a few hundred MB at worst, tiny next to a 100 TB fact
  side, so every executor probes its local copy — no shuffle of the big
  side, which is exactly how a cluster-scale IP enrichment should run.
- CoordinatesReduction (datavec-geo/.../reduce/geo/CoordinatesReduction.java:42,
  test TestGeoReduction.java): a "lat<delim>lon" string column reduced
  per-component with a ReduceOp, re-emitted as "x<delim>y".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datavec_spark.operators.transforms import op

IP_LOOKUP_COLUMNS = ["lo_ip", "hi_ip", "city", "country", "latitude", "longitude"]


def ipv4_to_long(col) -> F.Column:
    """Dotted-quad IPv4 string → long, JVM-side."""
    parts = F.split(col, r"\.")
    return (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )


def _as_lookup_df(df: DataFrame, lookup) -> DataFrame:
    """lookup: a DataFrame with IP_LOOKUP_COLUMNS, or a serializable
    list-of-dicts (the op-spec path), or a parquet path string."""
    spark = df.sparkSession
    if isinstance(lookup, DataFrame):
        return lookup
    if isinstance(lookup, str):
        return spark.read.parquet(lookup)
    return spark.createDataFrame(
        [tuple(r[c] for c in IP_LOOKUP_COLUMNS) for r in lookup],
        "lo_ip long, hi_ip long, city string, country string, latitude double, longitude double",
    )


_LOCATION_EXPRS = {
    # LocationType.java values; *_ID variants fall back to the same field
    # (the range table carries names, not GeoNames ids)
    "CITY": lambda d: F.col("city"),
    "COUNTRY": lambda d: F.col("country"),
    "COORDINATES": lambda d: F.concat_ws(
        d, F.col("latitude").cast("string"), F.col("longitude").cast("string")
    ),
}


def ip_lookup(df: DataFrame, column: str, lookup, location_type: str = "CITY",
              delimiter: str = ":", out: str | None = None) -> DataFrame:
    """Enrich `column` (IPv4 string) with a location attribute via a
    broadcast range join on lo_ip <= ip <= hi_ip. Rows with no matching
    range get NULL (the reference throws per-row; at pipeline scale NULL +
    a downstream FilterInvalidValues is the usable contract)."""
    lk = _as_lookup_df(df, lookup)
    loc = _LOCATION_EXPRS[location_type.upper().replace("_ID", "")](delimiter)
    ip = ipv4_to_long(F.col(column))
    out = out or column
    joined = df.join(
        F.broadcast(lk.select("lo_ip", "hi_ip", loc.alias("_loc"))),
        (ip >= F.col("lo_ip")) & (ip <= F.col("hi_ip")),
        "left",
    )
    keep = [c for c in df.columns if c != out]  # in-place when out == column
    return joined.select(*[F.col(c) for c in keep], F.col("_loc").alias(out))


@op("ip_to_location")  # IPAddressToLocationTransform.java:46
def _ip_to_location(df, column, lookup, location_type="CITY", delimiter=":", out=None):
    return ip_lookup(df, column, lookup, location_type, delimiter, out)


@op("ip_to_coordinates")  # IPAddressToCoordinatesTransform.java:30
def _ip_to_coordinates(df, column, lookup, delimiter=":", out=None):
    return ip_lookup(df, column, lookup, "COORDINATES", delimiter, out)


_COORD_AGGS = {
    "Sum": F.sum, "Min": F.min, "Max": F.max, "Mean": F.avg,
    "Count": F.count, "Stdev": F.stddev_samp,
}


@op("coordinates_reduction")  # CoordinatesReduction.java:42
def _coordinates_reduction(df, key_columns, column, reduce_ops, out_names,
                           delimiter=":"):
    """Per-component reduction of a "x<delim>y" coordinate string column:
    split → cast double → one agg per (op, out_name) → re-joined string
    (TestGeoReduction.java: Sum over 1#5..4#8 → "10.0#26.0")."""
    if isinstance(reduce_ops, str):
        reduce_ops = [reduce_ops]
    if isinstance(out_names, str):
        out_names = [out_names]
    parts = F.split(F.col(column), delimiter)
    x = F.element_at(parts, 1).cast("double")
    y = F.element_at(parts, 2).cast("double")
    aggs = []
    for opname, out in zip(reduce_ops, out_names):
        agg = _COORD_AGGS[opname]
        aggs.append(
            F.concat_ws(delimiter, agg(x).cast("string"), agg(y).cast("string")).alias(out)
        )
    return df.groupBy(*key_columns).agg(*aggs)
