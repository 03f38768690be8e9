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


_FUZZY_DEDUP_ORACLE = f"""
WITH RECURSIVE
{_PAIRS_SQL},
    t AS (
      SELECT doc_id,
             list_distinct(string_split({_norm_sql('text')}, ' ')) AS toks
      FROM documents),
    verified AS (
      SELECT p.id_a, p.id_b
      FROM pairs p
      JOIN t a ON a.doc_id = p.id_a
      JOIN t b ON b.doc_id = p.id_b
      WHERE len(list_intersect(a.toks, b.toks)) * 10
            >= len(list_distinct(list_concat(a.toks, b.toks))) * 7),
    edges AS (SELECT id_a AS src, id_b AS dst FROM verified
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM verified),
    cc(node, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, cc.lbl FROM cc JOIN edges e ON cc.node = e.src),
    comp AS (SELECT node AS doc_id, min(lbl) AS component FROM cc GROUP BY node),
    sizes AS (SELECT component, count(*) AS cluster_size
              FROM comp GROUP BY component)
SELECT c.doc_id, c.component, s.cluster_size,
       (c.component = c.doc_id) AS kept
FROM comp c JOIN sizes s USING (component)
"""


@q("fuzzy_dedup_keep", _FUZZY_DEDUP_ORACLE)
def _fuzzy_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fuzzy-dedup recipe (operators/dedup.fuzzy_dedup): LSH
    candidates -> exact-Jaccard verify (integer threshold 7/10, which
    provably rejects some LSH collisions on this corpus) -> connected
    components -> canonical keep-list. The oracle replays every stage
    in SQL, including the verify filter and the recursive-CTE fixpoint."""
    docs = _tp(spark, sf_dir, "documents")
    return D.fuzzy_dedup(
        docs, "text", "doc_id", n_hashes=_MH_N, band_size=2,
        threshold_num=7, threshold_den=10,
    )


@q("dedup_components", _COMPONENTS_ORACLE)
def _dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs -> connected components -> canonical doc.
    Label propagation runs over the EDGE-SUBGRAPH vertices only (pair
    endpoints, a corpus-fraction); singletons rejoin via one left
    join — at scale each propagation round shuffles the candidate
    graph, never the corpus."""
    docs = _tp(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, "text", "doc_id", n_hashes=_MH_N)
    # materialize the tiny pair set once (endpoints + every propagation
    # round would otherwise re-run the signature/banding pipeline)
    pairs = D.lsh_candidate_pairs(
        sig, "doc_id", n_hashes=_MH_N, band_size=2
    ).localCheckpoint()
    endpoints = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    labels = connected_components(
        endpoints, pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    ).select(F.col("id").alias("doc_id"), "component")
    comp = F.coalesce("component", F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            comp.alias("component"),
            (comp == F.col("doc_id")).alias("is_canonical"),
        )
    )


_NEARDUP_IDX_ORACLE = f"""
WITH
{_PAIRS_SQL.replace("pairs AS (", "__unused_pairs AS (")},
b AS (SELECT doc_id, band_id, band_key FROM banded),
b1 AS (SELECT * FROM b WHERE doc_id % 2 = 0),
w1 AS (SELECT band_id, band_key, min(doc_id) AS bw FROM b1 GROUP BY 1, 2),
k1 AS (SELECT b1.doc_id FROM b1 JOIN w1 USING (band_id, band_key)
       GROUP BY b1.doc_id HAVING bool_and(bw = b1.doc_id)),
i1 AS (SELECT b1.band_id, b1.band_key, b1.doc_id AS first_id
       FROM b1 JOIN k1 USING (doc_id)),
b2 AS (SELECT * FROM b WHERE doc_id % 2 = 1),
w2 AS (SELECT band_id, band_key, min(doc_id) AS bw FROM b2 GROUP BY 1, 2),
e2 AS (SELECT b2.doc_id, coalesce(i1.first_id, w2.bw) AS eff
       FROM b2
       JOIN w2 USING (band_id, band_key)
       LEFT JOIN i1 USING (band_id, band_key)),
k2 AS (SELECT doc_id FROM e2 GROUP BY doc_id HAVING bool_and(eff = doc_id))
SELECT d.doc_id,
       CAST(d.doc_id % 2 AS BIGINT) AS batch,
       (d.doc_id IN (SELECT doc_id FROM k1)
        OR d.doc_id IN (SELECT doc_id FROM k2)) AS kept
FROM documents d
"""


@q("neardup_index_batches", _NEARDUP_IDX_ORACLE)
def _neardup_index_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent cross-batch NEAR-dup index (sinks/neardupindex.py):
    two sequential batches (even then odd doc ids) deduped against the
    same stored LSH band index; output is every doc's (batch, kept)
    verdict. The oracle replays both batches' greedy first-writer-wins
    band semantics — including cross-batch suppression through the
    stored index — in pure SQL."""
    import shutil
    import tempfile
    from pathlib import Path

    from ..sinks.neardupindex import neardup_against_index

    sf = Path(sf_dir).name or "sf"
    root = Path(tempfile.gettempdir()) / "spark_graft_neardup_idx" / sf
    shutil.rmtree(root, ignore_errors=True)

    docs = _tp(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    # each batch is fully materialized before the next runs (streaming
    # foreachBatch semantics); without the eager checkpoint, s1's lazy
    # index read would pick up batch 2's appended bands
    s1 = neardup_against_index(spark, b1, root, "text", "doc_id").localCheckpoint()
    s2 = neardup_against_index(spark, b2, root, "text", "doc_id").localCheckpoint()
    kept = (
        s1.select("doc_id")
        .union(s2.select("doc_id"))
        .withColumn("__k", F.lit(True))
    )
    return (
        docs.select("doc_id", (F.col("doc_id") % 2).alias("batch"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id", "batch", F.coalesce("__k", F.lit(False)).alias("kept")
        )
    )


# ---------------------------------------------------------------------------
# k-core decomposition over the part co-purchase graph.
# ---------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 6


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unroll exactly ``rounds`` peel rounds as chained CTEs — the
    same bounded-round contract as operators/graph.kcore, so both
    engines produce identical results whether or not peeling has
    converged by round ``rounds``."""
    ctes = [
        """items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
freq AS (SELECT l_partkey FROM items GROUP BY 1 HAVING count(*) >= 2),
it AS (SELECT i.l_orderkey, i.l_partkey FROM items i JOIN freq USING (l_partkey)),
rawp AS (
  SELECT x.l_partkey AS a, y.l_partkey AS b
  FROM it x JOIN it y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
),
e0 AS MATERIALIZED (SELECT a, b FROM rawp GROUP BY a, b HAVING count(*) >= 2)"""
    ]
    for i in range(rounds):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT n, count(*) AS deg FROM (
    SELECT a AS n FROM e{i} UNION ALL SELECT b AS n FROM e{i}
  ) GROUP BY n
),
k{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE deg >= {k}),
e{i + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i} e
  JOIN k{i} ka ON e.a = ka.n
  JOIN k{i} kb ON e.b = kb.n
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
  SELECT a AS n FROM e{rounds} UNION ALL SELECT b AS n FROM e{rounds}
) GROUP BY n HAVING count(*) >= {k} ORDER BY n"""
    )


@q("kcore_parts_graph", _kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def _kcore_parts_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core (k=2, 6 bounded peel rounds) of the part co-purchase
    graph: nodes are parts, edges are part pairs bought together in
    >= 2 orders (the `frequent_item_sets_orders` pair pipeline without
    the top-N cut). The 2-core strips pendant/chain parts and keeps
    the densely co-purchased clusters — the same peel used to isolate
    spam/template clusters in near-dup graphs.

    Scale shape: pair generation is the Apriori-pruned in-row basket
    expansion (facts never self-join, see frequent_item_sets_orders);
    each peel round is one degree aggregation + two semi-joins over
    the SHRINKING edge set with a `localCheckpoint` lineage cut per
    round (operators/graph.kcore)."""
    from ..operators.graph import kcore
    from .declared import _t
    from pyspark.sql.functions import broadcast

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("l_partkey")
    )
    pruned = items.join(broadcast(freq), "l_partkey")
    baskets = pruned.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("basket")
    )
    raw = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(basket, (x, i) -> "
                "transform(slice(basket, i + 2, size(basket)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("pr")
    ).select(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
    edges = (
        raw.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") >= 2)
        .select("a", "b")
    )
    return kcore(edges, _KCORE_K, _KCORE_ROUNDS).orderBy("n")
