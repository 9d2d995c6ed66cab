"""GeoIP/ASN/RIR enrichment — MaxMind-style lookups as a broadcast
range join.

Reference: capture does per-session MaxMind lookups at save time
(capture/db.c:267-340,710-775) producing geo.country_iso_code, as.*,
RIR. Spark shape: the geo database is a (cidr -> attributes) dimension;
with ips stored numerically a lookup is `ip BETWEEN lo AND hi` — a
broadcast non-equi join. The dim is MB-scale (GeoLite ~4M ranges), well
inside broadcast budget, and the fact side never shuffles.

For very hot paths an alternative is mapping each range to its /16
prefix buckets and equi-joining on the bucket first (prefix + residual
range check) — implemented here as `geo_enrich_bucketed` since a plain
theta-join degrades to BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def geo_dim_from_cidrs(
    spark: SparkSession, rows: list[tuple[str, str, int, str, str]]
) -> DataFrame:
    """Build the numeric-range geo dimension from (cidr, country,
    as_number, as_org, rir) tuples."""
    out = []
    for cidr, country, asn, org, rir in rows:
        net = ipaddress.ip_network(cidr, strict=False)
        out.append(
            (
                int(net.network_address),
                int(net.broadcast_address),
                country,
                asn,
                org,
                rir,
            )
        )
    return spark.createDataFrame(
        out, "ip_lo long, ip_hi long, country string, as_number long, as_org string, rir string"
    )


def geo_enrich(
    fact: DataFrame, geo: DataFrame, *, ip_num_col: str, how: str = "left"
) -> DataFrame:
    """Plain broadcast range join (BroadcastNestedLoopJoin): fine for
    small dims / exploratory use."""
    ip = fact[ip_num_col]
    return fact.join(
        F.broadcast(geo), (ip >= geo.ip_lo) & (ip <= geo.ip_hi), how
    )


def geo_enrich_bucketed(
    fact: DataFrame, geo: DataFrame, *, ip_num_col: str
) -> DataFrame:
    """Equi-join on the /16 bucket + residual range check.

    Each geo range explodes to the /16 buckets it covers; the fact ip
    equi-joins on its own /16 — a hash join, not a nested loop. Ranges
    wider than /16 produce multiple bucket rows (bounded: a /8 is 256
    buckets). This is the 100 TB shape.
    """
    bucket = (F.col("ip_lo") / 65536).cast("long")
    bucket_hi = (F.col("ip_hi") / 65536).cast("long")
    geo_b = geo.withColumn(
        "bucket", F.explode(F.sequence(bucket, bucket_hi))
    )
    ip = fact[ip_num_col]
    return fact.join(
        F.broadcast(geo_b),
        ((ip / 65536).cast("long") == geo_b.bucket)
        & (ip >= geo_b.ip_lo)
        & (ip <= geo_b.ip_hi),
        "left",
    ).drop("bucket")


def geo6_dim_from_cidrs(
    spark: SparkSession, rows: list[tuple[str, str, int, str, str]]
) -> DataFrame:
    """v6 flavor of the geo dimension: ranges as 32-char canonical-hex
    bounds (fixed-width hex compares lexicographically in address
    order — the same domain expr.compiler uses for v6 predicates, so
    store and query agree). GeoLite v6 blocks drop straight in."""
    out = []
    for cidr, country, asn, org, rir in rows:
        net = ipaddress.ip_network(cidr, strict=False)
        out.append(
            (
                format(int(net.network_address), "032x"),
                format(int(net.broadcast_address), "032x"),
                country,
                asn,
                org,
                rir,
            )
        )
    return spark.createDataFrame(
        out,
        "hex_lo string, hex_hi string, country string, as_number long, "
        "as_org string, rir string",
    )


def geo6_enrich_bucketed(
    fact: DataFrame, geo6: DataFrame, *, ip_col: str
) -> DataFrame:
    """v6 lookup as equi-bucket + residual range, mirroring the v4
    shape: bucket = the first 4 hex chars (the /16 of v6 — real-world
    v6 allocations are /32..../64, so a block rarely spans more than a
    few buckets, and a /12 regional allocation caps at 16). The fact
    side derives (bucket, hex) scan-side from the string ip; hash join,
    no nested loop, dim broadcasts."""
    from moloch_spark.expr.compiler import ip6_str_to_hex

    b_lo = F.conv(F.substring(F.col("hex_lo"), 1, 4), 16, 10).cast("long")
    b_hi = F.conv(F.substring(F.col("hex_hi"), 1, 4), 16, 10).cast("long")
    geo_b = geo6.withColumn("bucket", F.explode(F.sequence(b_lo, b_hi)))
    h = ip6_str_to_hex(fact[ip_col])
    fact_h = fact.withColumn("_h", h).withColumn(
        "_bucket", F.conv(F.substring(F.col("_h"), 1, 4), 16, 10).cast("long")
    )
    return (
        fact_h.join(
            F.broadcast(geo_b),
            (F.col("_bucket") == geo_b.bucket)
            & (F.col("_h") >= geo_b.hex_lo)
            & (F.col("_h") <= geo_b.hex_hi),
            "left",
        )
        .drop("_h", "_bucket", "bucket")
    )
