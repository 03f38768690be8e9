"""Dedup clustering query: LSH candidate pairs -> connected components
-> canonical document per cluster, oracle-checked end to end.

Spark runs iterative min-label propagation
(operators/components.py); DuckDB computes the same fixpoint with a
recursive CTE (label flooding along symmetrized edges, min per node) —
same result by construction, different execution models, which is
exactly what the oracle is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D
from ..operators.components import connected_components
from .declared import q
from .northstar import _MH_N, _minhash_sql, _norm_sql, _shingle_sql, _tp

_PAIRS_SQL = f"""
    sig AS (
      SELECT doc_id,
             {_minhash_sql(_shingle_sql(_norm_sql('text')), 0)} AS mh0,
             {_minhash_sql(_shingle_sql(_norm_sql('text')), 1)} AS mh1,
             {_minhash_sql(_shingle_sql(_norm_sql('text')), 2)} AS mh2,
             {_minhash_sql(_shingle_sql(_norm_sql('text')), 3)} AS mh3
      FROM documents),
    banded AS (
      SELECT doc_id, 0 AS band_id, mh0 || '|' || mh1 AS band_key FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band_id, mh2 || '|' || mh3 AS band_key FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id)
"""

_COMPONENTS_ORACLE = f"""
WITH RECURSIVE
{_PAIRS_SQL},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs),
    cc(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, cc.lbl FROM cc JOIN edges e ON cc.node = e.src)
SELECT node AS doc_id,
       min(lbl) AS component,
       (min(lbl) = node) AS is_canonical
FROM cc GROUP BY node
"""


@q("dedup_components", _COMPONENTS_ORACLE)
def _dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, "text", "doc_id", n_hashes=_MH_N)
    pairs = D.lsh_candidate_pairs(sig, "doc_id", n_hashes=_MH_N, band_size=2)
    labels = connected_components(
        docs, pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return labels.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("component") == F.col("id")).alias("is_canonical"),
    )
