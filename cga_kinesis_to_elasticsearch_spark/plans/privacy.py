"""Privacy declared queries: pseudonymization consistency proof and
deterministic-Laplace DP noisy release (operators/privacy.py), closing
the privacy family around the existing k-anonymity audit and
right-to-be-forgotten sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.privacy import laplace_noise, pseudonymize
from .declared import _t, q

_SALT = "pseud0"

# Consistency proof: tokenization must preserve the grouping structure
# — per event_type, distinct tokens == distinct users, and the vault
# is exactly one row per distinct user corpus-wide.
_PSEUD_ORACLE = f"""
WITH t AS (
  SELECT event_type, user_id,
         md5('{_SALT}:' || CAST(user_id AS VARCHAR)) AS user_token
  FROM events
),
v AS (SELECT COUNT(DISTINCT user_id) AS vault_rows FROM events)
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_token) AS n_tokens,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(user_token) AS min_token,
       (SELECT vault_rows FROM v) AS vault_rows
FROM t
GROUP BY event_type
ORDER BY event_type
"""


@q("pseudonymize_consistency", _PSEUD_ORACLE)
def pseudonymize_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize user_id with the keyed vault split, then prove the
    grouping structure survived: per event_type the tokenized distinct
    count equals the original distinct count, and the vault holds one
    row per user. Tokenization is narrow codegen; the vault is one
    distinct-aggregate."""
    events = _t(spark, sf_dir, "events")
    tokenized, vault = pseudonymize(events, "user_id", _SALT)
    vault_rows = vault.agg(F.count(F.lit(1)).alias("vault_rows"))
    orig = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return (
        tokenized.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id_token").alias("n_tokens"),
            F.min("user_id_token").alias("min_token"),
        )
        .join(orig, "event_type")
        .crossJoin(F.broadcast(vault_rows))
        .select(
            "event_type", "n_events", "n_tokens", "n_users", "min_token",
            "vault_rows",
        )
        .orderBy("event_type")
    )


_DP_B = 2.0
_DP_SALT = "dp0"
_HEXD = 7
_HSCALE = float(16**_HEXD)

_DP_ORACLE = f"""
WITH c AS (
  SELECT event_type, COUNT(*) AS true_count FROM events GROUP BY event_type
),
u AS (
  SELECT event_type, true_count,
         CAST(('0x' || substr(md5('{_DP_SALT}:' || event_type), 1, {_HEXD}))::BIGINT
              AS DOUBLE) / {_HSCALE} AS uu
  FROM c
),
n AS (
  SELECT event_type, true_count,
         -{_DP_B} * (CASE WHEN uu - 0.5 < 0 THEN -1.0 ELSE 1.0 END)
           * ln(greatest(least(1.0 - 2.0 * abs(uu - 0.5), 1.0), 1.0 / {_HSCALE}))
           AS noise
  FROM u
)
SELECT event_type,
       round(true_count + noise, 6) AS noisy_count,
       round(noise, 6) AS noise
FROM n ORDER BY event_type
"""


@q("dp_noisy_counts", _DP_ORACLE)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace(b=2) noisy per-type counts with the deterministic keyed
    draw (reproducible release; swap the salt for a secret key for
    real DP). One partial-agg shuffle; noise is a per-group scalar
    expression."""
    events = _t(spark, sf_dir, "events")
    c = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_count"))
    noise = laplace_noise(F.col("event_type"), _DP_SALT, _DP_B)
    return c.select(
        "event_type",
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        F.round(noise, 6).alias("noise"),
    ).orderBy("event_type")
