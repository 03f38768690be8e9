"""ES aggregation / index-lifecycle tail, part 3: ``top_hits``
(per-bucket top documents), ILM-style rollover generation planning
(the index-lifecycle companion of the reference's day-partitioned
retention, main.go:216-254), and ``nested`` / ``reverse_nested``
aggregation over array-of-struct documents.

Float discipline (house rule): money closes as cent-scaled BIGINTs;
doubles appear only in final rounded closures evaluated identically on
both engines.

Reference context: the reference ships records into day-partitioned
Elasticsearch indices and drops expired ones (main.go:216-254).
Rollover-by-size is the other half of real ES index lifecycle
management; top_hits / nested aggs are what its users run over the
indexed documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .declared import _t, q

# ---------------------------------------------------------------------------
# top_hits: per-bucket top documents with their source fields.
# ---------------------------------------------------------------------------

_TOP_HITS_ORACLE = """
WITH ranked AS (
  SELECT event_type, event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY round(value * 100) DESC, event_id
         ) AS hit_rank
  FROM events
)
SELECT event_type, hit_rank, event_id, user_id, value_cents, ts_str
FROM ranked WHERE hit_rank <= 3
ORDER BY event_type, hit_rank
"""


@q("top_hits_by_type", _TOP_HITS_ORACLE)
def _top_hits_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``top_hits`` aggregation: inside every ``terms`` bucket
    (event_type), the top-3 documents by value with their _source
    fields — the "show me example docs per bucket" aggregation
    (distinct from ``collapse``, which flattens the whole result
    list, and from ``top_metrics``, which returns metrics only).

    Scale shape: one exchange on the bucket key; the rank window and
    the k<=3 filter run inside it, so only 3 full rows per bucket
    survive the scan. Ties break on event_id for determinism (ES
    breaks ties by internal doc id)."""
    events = _t(spark, sf_dir, "events")
    ranked = events.select(
        "event_type",
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    ).withColumn(
        "hit_rank",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("value_cents").desc(), F.col("event_id")
            )
        ),
    )
    return ranked.where(F.col("hit_rank") <= 3).select(
        "event_type", "hit_rank", "event_id", "user_id", "value_cents", "ts_str"
    )


# ---------------------------------------------------------------------------
# ILM rollover: write-alias generations from a max_docs condition.
# ---------------------------------------------------------------------------

_ROLLOVER_MAX_DOCS = 400

_ROLLOVER_ORACLE = f"""
WITH ranked AS (
  SELECT event_type AS alias,
         row_number() OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) - 1 AS rn,
         ts
  FROM events
),
gens AS (
  SELECT alias, rn // {_ROLLOVER_MAX_DOCS} AS generation, ts
  FROM ranked
)
SELECT alias,
       CAST(generation AS BIGINT) AS generation,
       alias || '-' || lpad(CAST(generation + 1 AS VARCHAR), 6, '0')
         AS index_name,
       CAST(count(*) AS BIGINT) AS doc_count,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM gens
GROUP BY alias, generation
ORDER BY alias, generation
"""


@q("index_rollover_plan", _ROLLOVER_ORACLE)
def _index_rollover_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ILM rollover planning: each write alias (event_type) rolls
    to a new backing index ``alias-NNNNNN`` every ``max_docs = 400``
    documents in arrival order — the size-based half of index
    lifecycle management (the reference implements only the time-based
    half: day-partitioned indices + retention drops, main.go:216-254).
    Output is the per-generation summary an ILM explain would show:
    backing index name, doc count, first/last timestamp.

    Scale shape: one exchange on the alias key; generation assignment
    is a row_number window inside it ((rn-1) // max_docs — exact
    rollover at the boundary), and the per-generation rollup shares
    the same partitioning. Per-alias ordering is the same per-shard
    arrival order the reference relies on (T3)."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gens = events.select(
        F.col("event_type").alias("alias"),
        ((F.row_number().over(w) - 1) / _ROLLOVER_MAX_DOCS)
        .cast("bigint")
        .alias("generation"),
        "ts",
    )
    return (
        gens.groupBy("alias", "generation")
        .agg(
            F.count("*").alias("doc_count"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
        .select(
            "alias",
            "generation",
            F.concat(
                F.col("alias"),
                F.lit("-"),
                F.lpad((F.col("generation") + 1).cast("string"), 6, "0"),
            ).alias("index_name"),
            "doc_count",
            "first_ts",
            "last_ts",
        )
    )


# ---------------------------------------------------------------------------
# nested / reverse_nested over array-of-struct order documents.
# ---------------------------------------------------------------------------

_NESTED_ORACLE = """
WITH matched AS (
  SELECT o.o_orderstatus AS status, o.o_orderkey,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
)
SELECT status,
       CAST(count(*) AS BIGINT) AS nested_hits,
       CAST(sum(qty) AS BIGINT) AS sum_qty,
       CAST(sum(price_cents) AS BIGINT) AS sum_price_cents,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS parent_orders
FROM matched
GROUP BY status
ORDER BY status
"""


@q("nested_lineitem_agg", _NESTED_ORACLE)
def _nested_lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``nested`` + ``reverse_nested`` aggregation: orders are
    indexed as parent documents with an array-of-struct ``items``
    nested field (the ES nested mapping); the agg descends into the
    nested scope filtered to returned items (l_returnflag = 'R'),
    counts/sums at nested-doc granularity, then ``reverse_nested``
    climbs back to count the distinct PARENT orders containing at
    least one matching item.

    The engine genuinely materializes the nested document shape
    (groupBy + collect_list(struct(...))) and aggregates by exploding
    the nested array — proving array-of-struct documents round-trip
    through the engine — while the oracle states the same answer over
    the flat relational shape.

    Scale shape: one exchange builds the nested docs (the same
    shuffle an ES indexer pays to co-locate children with parents);
    explode is narrow; the final rollup reduces to one row per
    status. distinct-parent counting dedups (status, orderkey) pairs,
    never documents."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    items = lineitem.select(
        "l_orderkey",
        F.struct(
            F.col("l_returnflag").alias("returnflag"),
            F.round("l_quantity").cast("bigint").alias("qty"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("price_cents"),
        ).alias("item"),
    )
    nested_docs = (
        orders.join(items, orders.o_orderkey == items.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.collect_list("item").alias("items"))
    )
    matched = nested_docs.select(
        F.col("o_orderstatus").alias("status"),
        "o_orderkey",
        F.explode(
            F.filter("items", lambda it: it.returnflag == "R")
        ).alias("item"),
    )
    return (
        matched.groupBy("status")
        .agg(
            F.count("*").alias("nested_hits"),
            F.sum("item.qty").alias("sum_qty"),
            F.sum("item.price_cents").alias("sum_price_cents"),
            F.countDistinct("o_orderkey").alias("parent_orders"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# geotile_grid / geohash_grid: Kibana maps' cluster-layer bucketing
# ---------------------------------------------------------------------------

# degrees from c_custkey via the repo's coprime-multiplier synth
_GRID_LATLON = (
    "(-6000 + (c_custkey * 7) % 12000) / 100.0 AS lat, "
    "(-18000 + (c_custkey * 13) % 36000) / 100.0 AS lon"
)

_GEOTILE_ORACLE = f"""
WITH pts AS (SELECT c_acctbal, {_GRID_LATLON} FROM customer),
keyed AS (
    SELECT '5/' ||
           CAST(CAST(floor((lon + 180.0) / 360.0 * 32.0) AS BIGINT)
                AS VARCHAR) || '/' ||
           CAST(CAST(floor((1.0 - ln(tan(radians(lat))
                                     + 1.0 / cos(radians(lat))) / pi())
                           / 2.0 * 32.0) AS BIGINT) AS VARCHAR)
               AS tile,
           c_acctbal
    FROM pts
), b AS (
    SELECT tile, count(*) AS doc_count,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM keyed GROUP BY tile
)
SELECT tile, doc_count, avg_bal
FROM b
ORDER BY doc_count DESC, tile ASC
LIMIT 20
"""


@q("es_aggs_geotile_grid", _GEOTILE_ORACLE)
def _es_aggs_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geotile_grid`` — Kibana maps' cluster layer: the "z/x/y"
    Web-Mercator slippy-map tile key, top-``size`` cells by
    doc_count (tile-key tiebreak), with a sub-aggregated metric per
    cell. The oracle recomputes the identical projection chain
    (floor of the same ln/tan double expression), so the tile
    geometry — not just the grouping — is pinned cross-engine; tile
    edges are irrational mercator points, so real coordinates cannot
    straddle an edge by rounding.

    Scale shape: the tile key is one codegen projection; the grid is
    a plain partial-agg shuffle + TakeOrdered(size) — identical
    physics to a terms agg at any zoom."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_acctbal",
        F.struct(
            ((F.lit(-6000) + (F.col("c_custkey") * 7) % 12000) / 100.0)
            .alias("lat"),
            ((F.lit(-18000) + (F.col("c_custkey") * 13) % 36000) / 100.0)
            .alias("lon"),
        ).alias("loc"),
    )
    from ..operators.querydsl import run_search_body

    out = run_search_body(cust, {
        "aggs": {"tiles": {
            "geotile_grid": {"field": "loc", "precision": 5, "size": 20},
            "aggs": {"bal": {"avg": {"field": "c_acctbal"}}},
        }},
    })
    return out.select(
        F.col("tiles").alias("tile"),
        "doc_count",
        F.round("bal", 2).alias("avg_bal"),
    )


_GEOHASH_ORACLE = f"""
WITH pts AS (SELECT {_GRID_LATLON} FROM customer),
qz AS (
    SELECT least(CAST(floor((lon + 180.0) / 360.0 * 256.0) AS BIGINT),
                 255) AS lonq,
           least(CAST(floor((lat + 90.0) / 180.0 * 128.0) AS BIGINT),
                 127) AS latq
    FROM pts
), coded AS (
    SELECT (((lonq >> 7) & 1) << 14) + (((lonq >> 6) & 1) << 12)
         + (((lonq >> 5) & 1) << 10) + (((lonq >> 4) & 1) << 8)
         + (((lonq >> 3) & 1) << 6) + (((lonq >> 2) & 1) << 4)
         + (((lonq >> 1) & 1) << 2) + (((lonq >> 0) & 1) << 0)
         + (((latq >> 6) & 1) << 13) + (((latq >> 5) & 1) << 11)
         + (((latq >> 4) & 1) << 9) + (((latq >> 3) & 1) << 7)
         + (((latq >> 2) & 1) << 5) + (((latq >> 1) & 1) << 3)
         + (((latq >> 0) & 1) << 1) AS code
    FROM qz
), keyed AS (
    SELECT substring('0123456789bcdefghjkmnpqrstuvwxyz',
                     CAST(((code >> 10) & 31) + 1 AS INT), 1)
        || substring('0123456789bcdefghjkmnpqrstuvwxyz',
                     CAST(((code >> 5) & 31) + 1 AS INT), 1)
        || substring('0123456789bcdefghjkmnpqrstuvwxyz',
                     CAST(((code >> 0) & 31) + 1 AS INT), 1) AS cell
    FROM coded
), b AS (SELECT cell, count(*) AS doc_count FROM keyed GROUP BY cell)
SELECT cell, doc_count FROM b
ORDER BY doc_count DESC, cell ASC
LIMIT 15
"""


@q("es_aggs_geohash_grid", _GEOHASH_ORACLE)
def _es_aggs_geohash_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geohash_grid`` — the classic geohash cell bucketing
    (precision = key length, 5 bits/char, lon-first bit
    interleaving, base32 without a/i/l/o). After one quantizing
    floor per axis the whole key is integer arithmetic, so every
    engine buckets identically — the oracle replays the exact bit
    interleave. Validated against the canonical test vector
    (57.64911, 10.40744) -> u4pruydqqvj in tests.

    Scale shape: same as geotile_grid — codegen key projection, one
    partial-agg shuffle, TakeOrdered(size)."""
    cust = _t(spark, sf_dir, "customer").select(
        F.struct(
            ((F.lit(-6000) + (F.col("c_custkey") * 7) % 12000) / 100.0)
            .alias("lat"),
            ((F.lit(-18000) + (F.col("c_custkey") * 13) % 36000) / 100.0)
            .alias("lon"),
        ).alias("loc"),
    )
    from ..operators.querydsl import run_search_body

    out = run_search_body(cust, {
        "aggs": {"cells": {
            "geohash_grid": {"field": "loc", "precision": 3, "size": 15},
        }},
    })
    return out.select(F.col("cells").alias("cell"), "doc_count")


# ---------------------------------------------------------------------------
# time_series: the TSDB per-series bucket (ES 8.7)
# ---------------------------------------------------------------------------

_TIME_SERIES_ORACLE = """
WITH b AS (
    SELECT CAST(user_id AS VARCHAR) || '|' || event_type AS tsid,
           count(*) AS doc_count,
           round(avg(value), 6) AS avg_value,
           round(max(value), 4) AS max_value
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    GROUP BY 1
)
SELECT tsid, doc_count, avg_value, max_value
FROM b
ORDER BY doc_count DESC, tsid ASC
LIMIT 12
"""


@q("es_aggs_time_series", _TIME_SERIES_ORACLE)
def _es_aggs_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``time_series`` (ES 8.7 TSDB): one bucket per time series —
    the ``_tsid`` dimension combination — with per-series metrics;
    the busiest 12 series here. ES reads the dimension set from the
    mapping's ``time_series_dimension`` fields; the stand-in takes
    the same contract as ``run_esql(ts_dimensions=..)`` via the
    body's ``dimensions`` extension. Docs missing any dimension have
    no _tsid, like TSDB.

    Scale shape: identical physics to multi_terms — one codegen key
    projection, one partial-agg shuffle, TakeOrdered(size)."""
    ev = _t(spark, sf_dir, "events")
    from ..operators.querydsl import run_search_body

    out = run_search_body(ev, {
        "aggs": {"series": {
            "time_series": {
                "dimensions": ["user_id", "event_type"], "size": 12,
            },
            "aggs": {
                "avg_value": {"avg": {"field": "value"}},
                "max_value": {"max": {"field": "value"}},
            },
        }},
    })
    return out.select(
        F.col("series").alias("tsid"),
        "doc_count",
        F.round("avg_value", 6).alias("avg_value"),
        F.round("max_value", 4).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# composite pagination over geotile_grid cells (the maps export shape)
# ---------------------------------------------------------------------------

_COMPOSITE_GEOTILE_ORACLE = f"""
WITH pts AS (SELECT c_acctbal, {_GRID_LATLON} FROM customer),
keyed AS (
    SELECT '4/' ||
           CAST(CAST(floor((lon + 180.0) / 360.0 * 16.0) AS BIGINT)
                AS VARCHAR) || '/' ||
           CAST(CAST(floor((1.0 - ln(tan(radians(lat))
                                     + 1.0 / cos(radians(lat))) / pi())
                           / 2.0 * 16.0) AS BIGINT) AS VARCHAR)
               AS tile,
           c_acctbal
    FROM pts
), b AS (
    SELECT tile, count(*) AS doc_count,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM keyed GROUP BY tile
)
SELECT tile, doc_count, avg_bal
FROM b
WHERE tile > '4/3/9'
ORDER BY tile ASC
LIMIT 10
"""


@q("es_search_composite_geotile", _COMPOSITE_GEOTILE_ORACLE)
def _es_search_composite_geotile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``composite`` pagination with a ``geotile_grid`` source — how
    a maps backend EXPORTS every cluster cell without a giant single
    response: resumable after-key pages over the tile keys. Tile
    keys page lexicographically here (deterministic and resumable,
    same bucket contents; ES pages by the packed tile long —
    documented divergence in the source gate).

    Scale shape: the after predicate applies to the key expression
    BELOW the aggregation, so a resumed page never re-aggregates
    earlier cells; one partial-agg shuffle + TakeOrdered(size)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_acctbal",
        F.struct(
            ((F.lit(-6000) + (F.col("c_custkey") * 7) % 12000) / 100.0)
            .alias("lat"),
            ((F.lit(-18000) + (F.col("c_custkey") * 13) % 36000) / 100.0)
            .alias("lon"),
        ).alias("loc"),
    )
    from ..operators.querydsl import run_search_body

    out = run_search_body(cust, {
        "aggs": {"page": {"composite": {
            "size": 10,
            "sources": [
                {"tile": {"geotile_grid": {
                    "field": "loc", "precision": 4,
                }}},
            ],
            "after": {"tile": "4/3/9"},
        }, "aggs": {"avg_bal": {"avg": {"field": "c_acctbal"}}}}},
    })
    return out.select(
        "tile", "doc_count", F.round("avg_bal", 2).alias("avg_bal")
    )


# ---------------------------------------------------------------------------
# geo_line: per-bucket ordered tracks (Kibana maps' path layer)
# ---------------------------------------------------------------------------

_GEO_LINE_ORACLE = """
WITH pts AS (
    SELECT user_id, ts,
           CAST(-18000 + (event_id * 13) % 36000 AS BIGINT) AS lon,
           CAST(-6000 + (event_id * 7) % 12000 AS BIGINT) AS lat
    FROM events WHERE user_id IS NOT NULL
), b AS (
    SELECT user_id, count(*) AS doc_count,
           list(CAST(lon AS VARCHAR) || ' ' || CAST(lat AS VARCHAR)
                ORDER BY ts) AS pl
    FROM pts GROUP BY user_id
), cut AS (
    SELECT user_id, doc_count, pl[1:5] AS pl5 FROM b
)
SELECT user_id, doc_count,
       len(pl5) AS n_points,
       array_to_string(pl5, ';') AS track
FROM cut
ORDER BY doc_count DESC, user_id ASC
LIMIT 8
"""


@q("es_aggs_geo_line", _GEO_LINE_ORACLE)
def _es_aggs_geo_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geo_line`` (Kibana maps' track layer): each bucket's points
    as an ordered path — here the first 5 positions of each of the 8
    busiest users' event tracks, time-ordered. Coordinates are
    INTEGER centi-degrees so the "lon lat" point strings are exact in
    every engine (the repo's geo determinism rule).

    Scale shape: collect_list + array_sort per bucket with the
    ES-pinned 10000-point cap — per-group state is bounded like ES's
    own geo_line; one partial-agg shuffle on the bucket key."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select(
        "user_id", "ts",
        F.struct(
            (F.lit(-6000) + (F.col("event_id") * 7) % 12000)
            .cast("long").alias("lat"),
            (F.lit(-18000) + (F.col("event_id") * 13) % 36000)
            .cast("long").alias("lon"),
        ).alias("loc"),
    )
    from ..operators.querydsl import run_search_body

    out = run_search_body(ev, {
        "aggs": {"u": {
            "terms": {"field": "user_id", "size": 8},
            "aggs": {"trk": {"geo_line": {
                "field": "loc",
                "sort": {"field": "ts"},
                "size": 5,
            }}},
        }},
    })
    return out.select(
        F.col("u").alias("user_id"),
        "doc_count",
        F.size("trk.points").alias("n_points"),
        F.array_join("trk.points", ";").alias("track"),
    )


# ---------------------------------------------------------------------------
# ip_range: client-address slicing (the router-log dashboard cut)
# ---------------------------------------------------------------------------

_IP_RANGE_ORACLE = """
WITH f AS (
  SELECT user_id,
         ((10 + user_id % 4) * 16777216 + (user_id % 200) * 65536
          + (event_id % 250) * 256 + ((event_id // 250) % 250))
             AS ip_long
  FROM events
)
SELECT * FROM (
  SELECT '10.0.0.0/8' AS block, count(*) AS doc_count,
         count(DISTINCT user_id) AS users
  FROM f WHERE ip_long >= 167772160 AND ip_long < 184549376
  UNION ALL
  SELECT '11.0.0.0-12.0.0.0', count(*), count(DISTINCT user_id)
  FROM f WHERE ip_long >= 184549376 AND ip_long < 201326592
  UNION ALL
  SELECT '12.64.0.0/10', count(*), count(DISTINCT user_id)
  FROM f WHERE ip_long >= 205520896 AND ip_long < 209715200
  UNION ALL
  SELECT '13.0.0.0-*', count(*), count(DISTINCT user_id)
  FROM f WHERE ip_long >= 218103808
)
ORDER BY block
"""


@q("es_aggs_ip_range", _IP_RANGE_ORACLE)
def _es_aggs_ip_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ip_range`` — client-address slicing over an ip-string
    column, the cut every router-log dashboard runs (the reference's
    gorouter access logs carry the client address, main.go:447).
    Ranges as half-open dotted-quad {from, to} or CIDR {mask} blocks
    (the mask folds to its aligned [base, base+2^(32-bits)) span at
    plan time); a non-IPv4 value lands in no bucket — the same
    malformed-value rule as the ES|QL TO_IP / CIDR_MATCH layer.

    Scale shape: the dotted-quad -> long fold is one codegen
    expression; range arms explode per matching block and the count
    is one partial-agg shuffle — identical physics to a range agg."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.concat_ws(
            ".",
            (F.lit(10) + F.col("user_id") % 4).cast("string"),
            (F.col("user_id") % 200).cast("string"),
            (F.col("event_id") % 250).cast("string"),
            ((F.col("event_id") / 250).cast("long") % 250)
            .cast("string"),
        ).alias("client_ip"),
    )
    from ..operators.querydsl import run_search_body

    out = run_search_body(ev, {
        "aggs": {"blocks": {
            "ip_range": {"field": "client_ip", "ranges": [
                {"mask": "10.0.0.0/8"},
                {"from": "11.0.0.0", "to": "12.0.0.0"},
                {"mask": "12.64.0.0/10"},
                {"from": "13.0.0.0"},
            ]},
            "aggs": {"users": {"cardinality": {"field": "user_id"}}},
        }},
    })
    return out.select(
        F.col("blocks").alias("block"), "doc_count", "users"
    ).orderBy("block")


# ---------------------------------------------------------------------------
# frequent_item_sets: exact pair-layer co-occurrence mining
# ---------------------------------------------------------------------------

_FIS_ORACLE = """
WITH f AS (
    SELECT 'type=' || event_type AS i1,
           'band=' || CASE WHEN value >= 10 THEN 'high'
                           WHEN value >= 3 THEN 'mid'
                           ELSE 'low' END AS i2,
           'cohort=' || CAST(user_id % 5 AS VARCHAR) AS i3
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
      AND user_id IS NOT NULL
), n AS (SELECT count(*) AS total FROM f),
pairs AS (
    SELECT CASE WHEN i1 < i2 THEN i1 || ',' || i2
                ELSE i2 || ',' || i1 END AS k FROM f
    UNION ALL
    SELECT CASE WHEN i1 < i3 THEN i1 || ',' || i3
                ELSE i3 || ',' || i1 END FROM f
    UNION ALL
    SELECT CASE WHEN i2 < i3 THEN i2 || ',' || i3
                ELSE i3 || ',' || i2 END FROM f
), b AS (
    SELECT k, count(*) AS doc_count FROM pairs GROUP BY k
)
SELECT k AS sets, doc_count,
       round(doc_count / (SELECT total FROM n), 6) AS support
FROM b
WHERE doc_count >= ceil(0.02 * (SELECT total FROM n))
ORDER BY doc_count DESC, sets ASC
LIMIT 12
"""


@q("es_aggs_frequent_item_sets", _FIS_ORACLE)
def _es_aggs_frequent_item_sets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``frequent_item_sets`` (ES 8.4, the ML co-occurrence miner) —
    the engine's DETERMINISTIC EXACT reading: the frequent PAIR
    layer (which event types co-occur with which value bands and
    user cohorts), computed exactly and reproducibly where ES mines
    approximately over a doc sample; set sizes ES only approximates
    are rejected loudly, not imitated.

    Scale shape: pair combinations generate IN-ROW from the tiny
    per-doc item array (no self-join, no doc-id shuffle), then one
    partial-agg shuffle on the pair key + TakeOrdered(size)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    ).select(
        F.col("event_type").alias("type"),
        F.when(F.col("value") >= 10, "high")
        .when(F.col("value") >= 3, "mid")
        .otherwise("low")
        .alias("band"),
        (F.col("user_id") % 5).cast("string").alias("cohort"),
    )
    from ..operators.querydsl import run_search_body

    out = run_search_body(ev, {
        "aggs": {"sets": {"frequent_item_sets": {
            "fields": [
                {"field": "type"}, {"field": "band"},
                {"field": "cohort"},
            ],
            "minimum_support": 0.02,
            "size": 12,
        }}},
    })
    return out.select(
        "sets", "doc_count", F.round("support", 6).alias("support")
    )


# ---------------------------------------------------------------------------
# the TSDB rollup: time_series > date_histogram > rate
# ---------------------------------------------------------------------------

_TSDB_ROLLUP_ORACLE = """
WITH f AS (
    SELECT CAST(user_id AS VARCHAR) || '|' || event_type AS tsid,
           date_trunc('day', ts) AS d, value
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), top AS (
    SELECT tsid, count(*) AS n FROM f GROUP BY tsid
    ORDER BY n DESC, tsid ASC LIMIT 6
)
SELECT f.tsid, strftime(d, '%Y-%m-%d') AS day,
       count(*) AS doc_count,
       round(sum(value) * (3600.0 / 86400.0), 6) AS value_per_hour
FROM f JOIN top USING (tsid)
GROUP BY 1, 2
ORDER BY tsid, day
"""


@q("es_aggs_tsdb_rollup", _TSDB_ROLLUP_ORACLE)
def _es_aggs_tsdb_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TSDB metric-rollup composition on the ``_search`` side:
    ``time_series > date_histogram > rate`` — per-series daily value
    rates for the busiest 6 series, ES's canonical metrics-dashboard
    shape (the aggregation face of the ES|QL ``TS`` command). Zero
    bespoke code: the three existing aggs compose through the
    per-level bucket framework, proving the TSDB surface is built
    from orthogonal pieces.

    Scale shape: one partial-agg shuffle per level over an
    already-collapsing frame; the rate is a plan-time constant
    multiplier on the bucket sum."""
    ev = _t(spark, sf_dir, "events")
    from ..operators.querydsl import run_search_body

    out = run_search_body(ev, {
        "aggs": {"series": {
            "time_series": {
                "dimensions": ["user_id", "event_type"], "size": 6,
            },
            "aggs": {"per_day": {
                "date_histogram": {
                    "field": "ts", "calendar_interval": "day",
                },
                "aggs": {"value_per_hour": {"rate": {
                    "field": "value", "unit": "hour",
                }}},
            }},
        }},
    })
    return out.filter(F.col("agg_path") == "series>per_day").select(
        F.col("series").alias("tsid"),
        F.date_format("per_day", "yyyy-MM-dd").alias("day"),
        "doc_count",
        F.round("value_per_hour", 6).alias("value_per_hour"),
    ).orderBy("tsid", "day")
