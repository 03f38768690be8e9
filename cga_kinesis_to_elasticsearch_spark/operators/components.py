"""Connected components over candidate-pair graphs (north-star dedup
stage: LSH emits *pairs*; corpus dedup needs *clusters* — each
component keeps one canonical document and drops the rest).

Algorithm: iterative min-label propagation (the DataFrame-native
formulation of hash-to-min; converges in O(diameter) rounds). Each
round is one shuffle on the vertex id: neighbor labels union own label,
min per vertex. Near-dup graphs are forests of tiny dense clusters, so
the diameter — and the round count — is small in practice.

Scale posture: labels and edges shuffle on the same key every round, so
AQE reuses the exchange layout; ``localCheckpoint`` truncates the plan
each round (an iterative loop that keeps its lineage grows an
exponentially deep plan — the classic Spark iterative-algorithm trap).
Convergence is an OBSERVED metric on the checkpoint materialization:
labels are non-increasing per vertex (min of own + neighbor labels),
so the label sum is unchanged across a round IFF no vertex changed —
one Spark job per round instead of checkpoint + a join-and-count
convergence job (a full extra pass over the label table per round).
The sum is accumulated as DECIMAL(38,0) so the equality test stays
exact at any vertex-id/corpus scale. DuckDB oracle: the same fixpoint
as a recursive CTE (label flooding + min aggregation), so correctness
is hash-checked end-to-end despite the iterative Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

__all__ = ["connected_components"]


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(vertices, undirected edges) -> (id, component) where component
    is the minimum vertex id in each connected component. Vertices with
    no edges form singleton components.

    Raises if the propagation has not converged after ``max_iter``
    rounds (component min-label needs ~graph-diameter rounds).
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    sym = sym.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()

    obs0 = Observation()
    labels = (
        vertices.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("component")
        )
        .observe(
            obs0,
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
        )
        .localCheckpoint()
    )
    total = obs0.get["s"]

    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
        )
        obs = Observation()
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .observe(
                obs,
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
            )
            .localCheckpoint()
        )
        new_total = obs.get["s"]
        labels = new_labels
        if new_total == total:
            return labels
        total = new_total
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
