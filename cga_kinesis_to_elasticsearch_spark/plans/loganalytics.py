"""Access-log enrichment queries under the DuckDB oracle: CIDR
longest-prefix IP lookup and prioritized-regex User-Agent
classification — the two enrichments a weblog pipeline (the
reference's CloudFront/router domain, ES ``geoip`` / ``user_agent``
ingest processors) applies to every record.

The events fixture has no ip/ua columns, so both queries synthesize
those shapes identically on both sides from (event_id, user_id) —
same technique as the URL / boilerplate / PII queries in webmix.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import iplookup as IP
from ..operators import useragent as UA
from .declared import q
from .northstar import _tp

# ---------------------------------------------------------------------------
# CIDR longest-prefix enrichment
# ---------------------------------------------------------------------------
# ip octets derived from (user_id, event_id): o1 in 10..13 so several
# /8 buckets exist; nation 0..3 owns the /8s, nations 4..24 own /16s
# nested inside them — longest-prefix MUST prefer the /16 when both
# match, which the oracle verifies.

_IP_SQL = (
    "10 + user_id % 4",  # o1
    "user_id % 200",  # o2
    "event_id % 250",  # o3
    "(event_id // 250) % 250",  # o4
)

_CIDR_ORACLE = f"""
WITH f AS (
  SELECT event_id, user_id,
         ({_IP_SQL[0]}) AS o1,
         (({_IP_SQL[0]}) * 16777216 + ({_IP_SQL[1]}) * 65536
          + ({_IP_SQL[2]}) * 256 + ({_IP_SQL[3]})) AS ip_long
  FROM events
),
nets AS (
  SELECT n_nationkey AS net_key,
         CAST(CASE WHEN n_nationkey < 4 THEN 8 ELSE 16 END AS BIGINT)
           AS prefix_len,
         CASE WHEN n_nationkey < 4 THEN 10 + n_nationkey
              ELSE 10 + n_nationkey % 4 END AS octet1,
         CASE WHEN n_nationkey < 4 THEN 0
              ELSE (n_nationkey * 8) % 200 END AS octet2,
         n_name AS net_name
  FROM nation
),
b AS (
  SELECT net_key, prefix_len, octet1, net_name,
         octet1 * 16777216 + octet2 * 65536 AS net_start,
         octet1 * 16777216 + octet2 * 65536
           + CAST(pow(2, 32 - prefix_len) AS BIGINT) - 1 AS net_end
  FROM nets
),
m AS (
  SELECT f.event_id, f.user_id, b.net_key, b.prefix_len, b.net_name,
         row_number() OVER (
           PARTITION BY f.event_id
           ORDER BY b.prefix_len DESC, b.net_key ASC
         ) AS rn
  FROM f JOIN b
    ON f.o1 = b.octet1 AND f.ip_long BETWEEN b.net_start AND b.net_end
)
SELECT net_name, prefix_len,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM m WHERE rn = 1
GROUP BY net_name, prefix_len
ORDER BY n_events DESC, net_name
"""


def _synth_ip_facts(events: DataFrame) -> DataFrame:
    o1 = (F.lit(10) + F.col("user_id") % 4).cast("long")
    o2 = (F.col("user_id") % 200).cast("long")
    o3 = (F.col("event_id") % 250).cast("long")
    o4 = ((F.col("event_id") / 250).cast("long") % 250).cast("long")
    return events.select(
        "event_id",
        "user_id",
        o1.alias("octet1"),
        IP.ip_to_long(o1, o2, o3, o4).alias("ip_long"),
    )


def _synth_networks(nation: DataFrame) -> DataFrame:
    key = F.col("n_nationkey").cast("long")
    prefix = F.when(key < 4, F.lit(8)).otherwise(F.lit(16))
    o1 = F.when(key < 4, F.lit(10) + key).otherwise(F.lit(10) + key % 4)
    o2 = F.when(key < 4, F.lit(0)).otherwise((key * 8) % 200)
    base = IP.ip_to_long(o1, o2, F.lit(0), F.lit(0))
    start, end = IP.cidr_bounds(base, prefix)
    return nation.select(
        key.alias("net_key"),
        prefix.cast("int").alias("prefix_len"),
        o1.cast("long").alias("octet1"),
        F.col("n_name").alias("net_name"),
        start.alias("net_start"),
        end.alias("net_end"),
    )


@q("ip_cidr_enrich", _CIDR_ORACLE)
def ip_cidr_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cites reference grok.go ROUTERACCESS (client-IP capture): the
    enrichment a router-access pipeline applies per record. Broadcast
    equi-join on the /8 bucket + in-bucket range check + max_by
    longest-prefix — no fact shuffle until the final small aggregate."""
    facts = _synth_ip_facts(_tp(spark, sf_dir, "events"))
    nets = _synth_networks(_tp(spark, sf_dir, "nation"))
    enriched = IP.enrich_longest_prefix(facts, nets)
    return (
        enriched.where(F.col("net_key").isNotNull())
        .groupBy("net_name", "prefix_len")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_events").desc(), "net_name")
    )


# ---------------------------------------------------------------------------
# User-Agent classification
# ---------------------------------------------------------------------------
# ua synthesized from (user_id): 8 templates x version user_id % 30.
# Template 3 (Edge) embeds Chrome/ and templates 0/3 embed Safari/ —
# the priority chain (bot > edge > chrome > firefox > safari) is what
# the oracle's identical CASE order verifies.

_UA_SQL = """
CASE user_id % 8
  WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/'
              || CAST(100 + user_id % 30 AS VARCHAR) || '.0.0.0 Safari/537.36'
  WHEN 1 THEN 'Mozilla/5.0 (X11; Linux x86_64; rv:' || CAST(90 + user_id % 30 AS VARCHAR)
              || '.0) Gecko/20100101 Firefox/' || CAST(90 + user_id % 30 AS VARCHAR) || '.0'
  WHEN 2 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/'
              || CAST(14 + user_id % 4 AS VARCHAR) || '.1 Safari/605.1.15'
  WHEN 3 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/'
              || CAST(100 + user_id % 30 AS VARCHAR) || '.0.0.0 Safari/537.36 Edg/'
              || CAST(100 + user_id % 30 AS VARCHAR) || '.0'
  WHEN 4 THEN 'Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)'
  WHEN 5 THEN 'curl/' || CAST(7 + user_id % 2 AS VARCHAR) || '.88.0'
  WHEN 6 THEN 'python-requests/2.' || CAST(25 + user_id % 7 AS VARCHAR)
  ELSE '-'
END
"""

_UA_ORACLE = f"""
WITH u AS (SELECT event_id, user_id, {_UA_SQL} AS ua FROM events),
c AS (
  SELECT event_id, user_id,
    CASE
      WHEN regexp_matches(ua, 'Googlebot') THEN 'googlebot'
      WHEN regexp_matches(ua, '^curl/') THEN 'curl'
      WHEN regexp_matches(ua, '^python-requests/') THEN 'python-requests'
      WHEN regexp_matches(ua, 'Edg/') THEN 'edge'
      WHEN regexp_matches(ua, 'Chrome/') THEN 'chrome'
      WHEN regexp_matches(ua, 'Firefox/') THEN 'firefox'
      WHEN regexp_matches(ua, 'Safari/') THEN 'safari'
      ELSE 'other'
    END AS ua_family,
    CASE
      WHEN regexp_matches(ua, 'Googlebot')
        THEN TRY_CAST(regexp_extract(ua, 'Googlebot/([0-9]+)', 1) AS INTEGER)
      WHEN regexp_matches(ua, '^curl/')
        THEN TRY_CAST(regexp_extract(ua, '^curl/([0-9]+)', 1) AS INTEGER)
      WHEN regexp_matches(ua, '^python-requests/')
        THEN TRY_CAST(regexp_extract(ua, '^python-requests/([0-9]+)', 1) AS INTEGER)
      WHEN regexp_matches(ua, 'Edg/')
        THEN TRY_CAST(regexp_extract(ua, 'Edg/([0-9]+)', 1) AS INTEGER)
      WHEN regexp_matches(ua, 'Chrome/')
        THEN TRY_CAST(regexp_extract(ua, 'Chrome/([0-9]+)', 1) AS INTEGER)
      WHEN regexp_matches(ua, 'Firefox/')
        THEN TRY_CAST(regexp_extract(ua, 'Firefox/([0-9]+)', 1) AS INTEGER)
      WHEN regexp_matches(ua, 'Safari/')
        THEN TRY_CAST(NULLIF(regexp_extract(ua, 'Version/([0-9]+)', 1), '') AS INTEGER)
      ELSE NULL
    END AS ua_major,
    (regexp_matches(ua, 'Googlebot') OR regexp_matches(ua, '^curl/')
      OR regexp_matches(ua, '^python-requests/')) AS ua_is_bot
  FROM u
)
SELECT ua_family, ua_is_bot,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(ua_major) AS min_major,
       MAX(ua_major) AS max_major
FROM c
GROUP BY ua_family, ua_is_bot
ORDER BY n_events DESC, ua_family
"""


def _synth_ua(events: DataFrame) -> DataFrame:
    uid = F.col("user_id")
    v100 = (F.lit(100) + uid % 30).cast("string")
    v90 = (F.lit(90) + uid % 30).cast("string")
    arm = uid % 8
    ua = (
        F.when(
            arm == 0,
            F.concat(
                F.lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/"),
                v100,
                F.lit(".0.0.0 Safari/537.36"),
            ),
        )
        .when(
            arm == 1,
            F.concat(
                F.lit("Mozilla/5.0 (X11; Linux x86_64; rv:"),
                v90,
                F.lit(".0) Gecko/20100101 Firefox/"),
                v90,
                F.lit(".0"),
            ),
        )
        .when(
            arm == 2,
            F.concat(
                F.lit("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/"),
                (F.lit(14) + uid % 4).cast("string"),
                F.lit(".1 Safari/605.1.15"),
            ),
        )
        .when(
            arm == 3,
            F.concat(
                F.lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/"),
                v100,
                F.lit(".0.0.0 Safari/537.36 Edg/"),
                v100,
                F.lit(".0"),
            ),
        )
        .when(
            arm == 4,
            F.lit("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"),
        )
        .when(
            arm == 5,
            F.concat(F.lit("curl/"), (F.lit(7) + uid % 2).cast("string"), F.lit(".88.0")),
        )
        .when(
            arm == 6,
            F.concat(F.lit("python-requests/2."), (F.lit(25) + uid % 7).cast("string")),
        )
        .otherwise(F.lit("-"))
    )
    return events.select("event_id", "user_id", ua.alias("ua"))


@q("ua_classify_stats", _UA_ORACLE)
def ua_classify_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cites reference grok.go ROUTERACCESS (UA capture): classify UA
    strings with the priority-ordered rule chain (bots first, Edge
    before Chrome, Chrome before Safari). One codegen'd CASE chain —
    no join, no Python, the only shuffle is the final tiny aggregate."""
    ua = _synth_ua(_tp(spark, sf_dir, "events"))
    classed = UA.with_ua_class(ua, "ua")
    return (
        classed.groupBy("ua_family", "ua_is_bot")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("ua_major").alias("min_major"),
            F.max("ua_major").alias("max_major"),
        )
        .orderBy(F.col("n_events").desc(), "ua_family")
    )
