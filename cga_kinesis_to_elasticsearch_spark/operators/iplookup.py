"""Longest-prefix-match CIDR enrichment (GeoIP/ASN-style lookup).

Log-analytics engines enrich client IPs against a network dimension
(GeoIP city/ASN blocks: millions of CIDR ranges, each ``start <= ip <=
end`` with a prefix length). The reference's domain (CloudFront /
router access logs, ``grok.go`` ROUTERACCESS captures a client IP)
implies exactly this join shape; Elasticsearch ships it as the
``geoip`` ingest processor. Semantics: an IP can fall inside several
nested networks (a /16 inside a /8); the MOST SPECIFIC (longest
prefix) wins, ties broken deterministically.

Spark-first plan — the naive expression is a range join (``ip BETWEEN
start AND end``) which Spark executes as BroadcastNestedLoopJoin:
every fact row probes every network row. Instead:

1. every real CIDR table has prefix_len >= some floor (here /8), so
   the first octet of the IP equals the first octet of the network
   start for every candidate range — an EQUI-join key. Joining on
   ``octet1`` turns the plan into a BroadcastHashJoin that only
   range-checks the handful of networks sharing the bucket. (With a
   lower floor, bucket on the floor-width prefix and explode each
   network into its covered buckets — same trick, still equi-join.)
2. the range predicate then prunes to true candidates, and
3. ``max_by(net, struct(prefix_len, -tiebreak))`` picks the longest
   prefix per fact row in the same aggregation that needs the result —
   no window over the fact table, no second shuffle.

The dimension broadcasts (GeoIP is ~MBs); the fact table never
shuffles for the lookup itself — at 100 TB the only exchange is
whatever aggregation the caller runs afterwards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["ip_to_long", "cidr_bounds", "enrich_longest_prefix"]


def ip_to_long(o1: Column, o2: Column, o3: Column, o4: Column) -> Column:
    """Pack four octet columns into the canonical 32-bit integer."""
    return (
        o1.cast("long") * F.lit(16777216)
        + o2.cast("long") * F.lit(65536)
        + o3.cast("long") * F.lit(256)
        + o4.cast("long")
    )


def cidr_bounds(base_long: Column, prefix_len: Column) -> tuple[Column, Column]:
    """``[start, end]`` of the network containing ``base_long`` at
    ``prefix_len`` — mask arithmetic on longs (no bit ops on ints that
    would differ across engines): block = 2^(32-prefix)."""
    block = F.pow(F.lit(2.0), F.lit(32) - prefix_len.cast("int")).cast("long")
    start = F.floor(base_long / block) * block
    return start.cast("long"), (start + block - F.lit(1)).cast("long")


def enrich_longest_prefix(
    facts: DataFrame,
    networks: DataFrame,
    ip_long_col: str = "ip_long",
    octet1_col: str = "octet1",
) -> DataFrame:
    """Attach the most-specific matching network to every fact row.

    ``networks`` must carry ``octet1`` (bucket key; prefix floor /8),
    ``net_start``/``net_end`` (long bounds), ``prefix_len`` and
    ``net_key`` (tiebreak + identity) plus any payload columns. Rows
    with no matching network keep NULL payloads (left outer — the
    missing-key tolerance contract of every enrichment in this engine,
    cf. ``operators/enrichment.py``).

    Returns ``facts`` columns + ``net_key``, ``prefix_len`` and the
    network payload of the winning (longest-prefix, then smallest
    ``net_key``) range.
    """
    payload = [c for c in networks.columns if c != octet1_col]
    # range predicate INSIDE the left join: a fact whose /8 bucket has
    # networks but whose ip is outside all of them must still survive
    # with NULL payloads, not vanish
    cand = facts.join(
        F.broadcast(networks),
        on=(facts[octet1_col] == networks[octet1_col])
        & facts[ip_long_col].between(F.col("net_start"), F.col("net_end")),
        how="left",
    )
    # longest prefix wins; smaller net_key breaks ties. One aggregation
    # keyed by the fact row's identity — max_by over a rank struct, no
    # window sort over the fact table.
    rank = F.struct(
        F.coalesce(F.col("prefix_len"), F.lit(-1)).alias("p"),
        (-F.coalesce(F.col("net_key"), F.lit(0))).alias("t"),
    )
    fact_cols = [c for c in facts.columns]
    return (
        cand.groupBy(*[facts[c] for c in fact_cols])
        .agg(
            *[
                F.max_by(F.col(c), rank).alias(c)
                for c in payload
                if c not in fact_cols
            ]
        )
    )
