"""Connected components over candidate-pair graphs (north-star dedup
stage: LSH emits *pairs*; corpus dedup needs *clusters* — each
component keeps one canonical document and drops the rest).

Algorithm: iterative min-label propagation (the DataFrame-native
formulation of hash-to-min; converges in O(diameter) rounds). Each
round is one shuffle on the vertex id: neighbor labels union own label,
min per vertex. Near-dup graphs are forests of tiny dense clusters, so
the diameter — and the round count — is small in practice.

Small-graph fast path: when the (symmetrized, deduped) edge list is
under ``driver_threshold`` rows, the component labels are computed
with a single union-find over the collected edges instead of the
round loop. Rationale (optimization guide §1.2/§5): each propagation
round costs a fixed 3-job overhead (join + agg + checkpoint) that
dwarfs the data work on candidate graphs with a few hundred edges —
measured 1.4 s of round overhead for a 363-edge graph at sf0.1 vs
~50 ms for the collected union-find. The collect is BOUNDED by the
threshold (default 100k edge rows ≈ a few MB — the same order as the
other bounded collects in this engine), and production-scale graphs
above it take the distributed loop unchanged, so the 100 TB posture
is untouched. The fast path replays the propagation fixpoint exactly:
labels seed from *vertices* only, flow over edges, and a node only
appears in the output if its component contains at least one seed
vertex (every current caller passes the edge-endpoint set as
vertices, where the two formulations coincide; the emulation keeps
the operator a drop-in under any inputs).

Scale posture (distributed path): labels and edges shuffle on the same
key every round, so AQE reuses the exchange layout; ``localCheckpoint``
truncates the plan each round (an iterative loop that keeps its lineage
grows an exponentially deep plan — the classic Spark
iterative-algorithm trap). Convergence is an OBSERVED metric on the
checkpoint materialization: labels are non-increasing per vertex (min
of own + neighbor labels), so the label sum is unchanged across a
round IFF no vertex changed — one Spark job per round instead of
checkpoint + a join-and-count convergence job (a full extra pass over
the label table per round). The sum is accumulated as DECIMAL(38,0) so
the equality test stays exact at any vertex-id/corpus scale. DuckDB
oracle: the same fixpoint as a recursive CTE (label flooding + min
aggregation), so correctness is hash-checked end-to-end despite the
iterative Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F
from pyspark.sql.types import StructField, StructType

__all__ = ["connected_components"]


def _driver_components(
    vertices: DataFrame, sym: DataFrame, id_col: str
) -> DataFrame:
    """Union-find over the collected edge list — the exact min-label
    fixpoint the round loop computes, for graphs small enough that
    per-round job overhead dominates. Output rows are (vertices ∪
    edge endpoints) restricted to components containing at least one
    vertex; the label is the minimum *vertex* id in the component."""
    id_field = vertices.select(id_col).schema.fields[0]
    verts = [r[0] for r in vertices.select(id_col).collect()]
    pairs = [(r[0], r[1]) for r in sym.collect()]

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for v in verts:
        parent.setdefault(v, v)
    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    vset = set(verts)
    # min VERTEX id per component (labels seed from vertices only)
    best: dict = {}
    for v in vset:
        r = find(v)
        if r not in best or v < best[r]:
            best[r] = v
    rows = [
        (n, best[find(n)]) for n in parent if find(n) in best
    ]
    schema = StructType(
        [
            StructField("id", id_field.dataType, True),
            StructField("component", id_field.dataType, True),
        ]
    )
    return vertices.sparkSession.createDataFrame(rows, schema)


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(vertices, undirected edges) -> (id, component) where component
    is the minimum vertex id in each connected component. Vertices with
    no edges form singleton components.

    ``driver_threshold``: symmetrized-edge row count at or below which
    the union-find fast path runs on the driver (0 disables it).
    Raises if the distributed propagation has not converged after
    ``max_iter`` rounds (component min-label needs ~graph-diameter
    rounds).
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    sym = sym.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()

    if driver_threshold and sym.count() <= driver_threshold:
        return _driver_components(vertices, sym, id_col)

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
