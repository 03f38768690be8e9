"""Weak-supervision queries (operators/weaklabel.py) with exact SQL
oracles: per-doc majority labels and the LF-bank diagnostics triple.
Every rule and every metric is integer-exact until one final rounded
division, so both engines hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.weaklabel import lf_diagnostics, weak_label_votes
from .declared import _t, q

# The SQL mirror of default_lf_bank(); [0-9] is ASCII in every engine.
_LF_SQL = """
  SELECT doc_id,
         CASE WHEN n_chars < 150 THEN -1 ELSE 0 END AS lf_short,
         CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END AS lf_longform,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lf_english,
         CASE WHEN source IN ('src0','src1','src2') THEN -1 ELSE 0 END
           AS lf_noisy_source,
         CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) >= 5
              THEN -1 ELSE 0 END AS lf_digit_heavy
  FROM documents
"""

_VOTES_ORACLE = f"""
WITH lf AS ({_LF_SQL}),
v AS (
  SELECT doc_id,
         CAST((lf_short = 1) AS BIGINT) + CAST((lf_longform = 1) AS BIGINT)
         + CAST((lf_english = 1) AS BIGINT)
         + CAST((lf_noisy_source = 1) AS BIGINT)
         + CAST((lf_digit_heavy = 1) AS BIGINT) AS n_pos,
         CAST((lf_short = -1) AS BIGINT) + CAST((lf_longform = -1) AS BIGINT)
         + CAST((lf_english = -1) AS BIGINT)
         + CAST((lf_noisy_source = -1) AS BIGINT)
         + CAST((lf_digit_heavy = -1) AS BIGINT) AS n_neg
  FROM lf
)
SELECT doc_id, n_pos, n_neg,
       CASE WHEN n_pos > n_neg THEN 1 WHEN n_pos < n_neg THEN -1
            ELSE 0 END::BIGINT AS label,
       CASE WHEN n_pos + n_neg > 0
            THEN round(abs(n_pos - n_neg) * 1.0 / (n_pos + n_neg), 9)
            ELSE 0.0 END AS confidence
FROM v
"""


@q("weak_label_votes", _VOTES_ORACLE)
def _weak_label_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snorkel-style label model (majority vote) over the 5-LF bank:
    per document (n_pos, n_neg, label in {+1,-1,0}, confidence =
    |margin|/votes-cast). One narrow codegen pass over the corpus —
    the vote matrix is projection attributes, never per-LF joins."""
    return weak_label_votes(_t(spark, sf_dir, "documents"))


_DIAG_ORACLE = f"""
WITH lf AS ({_LF_SQL}),
v AS (
  SELECT *,
         CAST((lf_short = 1) AS BIGINT) + CAST((lf_longform = 1) AS BIGINT)
         + CAST((lf_english = 1) AS BIGINT)
         + CAST((lf_noisy_source = 1) AS BIGINT)
         + CAST((lf_digit_heavy = 1) AS BIGINT) AS p,
         CAST((lf_short = -1) AS BIGINT) + CAST((lf_longform = -1) AS BIGINT)
         + CAST((lf_english = -1) AS BIGINT)
         + CAST((lf_noisy_source = -1) AS BIGINT)
         + CAST((lf_digit_heavy = -1) AS BIGINT) AS m
  FROM lf
),
agg AS (
  SELECT count(*) AS n,
         {", ".join(
             f'''sum(CAST(({c} <> 0) AS BIGINT)) AS {c}_fired,
         sum(CAST(({c} <> 0 AND p + m > 1) AS BIGINT)) AS {c}_overlap,
         sum(CAST(({c} <> 0 AND ((({c} = 1) AND m >= 1)
                   OR (({c} <> 1) AND p >= 1))) AS BIGINT)) AS {c}_conflict'''
             for c in (
                 "lf_short", "lf_longform", "lf_english",
                 "lf_noisy_source", "lf_digit_heavy",
             )
         )}
  FROM v
)
SELECT lf, CAST(fired AS BIGINT) AS fired,
       round(fired * 1.0 / n, 9) AS coverage,
       round(overlap * 1.0 / n, 9) AS overlap,
       round(conflict * 1.0 / n, 9) AS conflict
FROM (
  {" UNION ALL ".join(
      f"SELECT n, '{c}' AS lf, {c}_fired AS fired, {c}_overlap AS overlap, "
      f"{c}_conflict AS conflict FROM agg"
      for c in (
          "lf_short", "lf_longform", "lf_english",
          "lf_noisy_source", "lf_digit_heavy",
      )
  )}
)
ORDER BY lf
"""


@q("labeling_function_diagnostics", _DIAG_ORACLE)
def _labeling_function_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snorkel LFAnalysis triple per labeling function — coverage /
    overlap / conflict fractions plus raw fired counts. One corpus
    scan reduces to a single 16-column row (map-side-combined integer
    sums); the per-LF unpivot and divisions run on that row alone."""
    return lf_diagnostics(_t(spark, sf_dir, "documents"))
