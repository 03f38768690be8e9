"""Hierarchy (ancestor-closure) resolution by pointer doubling.

The reference engine has no recursive queries, but ES-style pipelines
frequently need parent/child resolution (join-field parent chains,
nested org trees — the same shape as the apps->spaces->orgs snowflake
in caching_lazyfill.go, generalised to unbounded depth). SQL engines
express it as a recursive CTE; a naive Spark translation would loop
once per LEVEL (O(depth) shuffles). Pointer doubling halves the
remaining path length every round instead: each node's pointer jumps
to its pointer's pointer, so depth-d forests resolve in ceil(log2 d)
self-joins — the textbook parallel-closure trick (Wyllie's list
ranking), and the only shape that survives deep chains at 100 TB.

Scale posture: the frontier is always exactly |V| rows of three longs;
every round is one shuffle of that compact frame on the pointer key.
``localCheckpoint`` truncates lineage per round (iterative-loop trap,
same as operators/components.py). Convergence and referential
integrity are read from OBSERVED metrics on the checkpoint
materialization itself — one Spark job per round, no extra
count/anti-join jobs (each was a full extra pass at 100 TB frontier
scale, and a driver barrier per round at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

__all__ = ["closure_root_depth"]


def closure_root_depth(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_iter: int = 20,
) -> DataFrame:
    """(id, parent) forest -> (id, root, depth).

    ``parent`` NULL marks a root (root=id, depth=0). Every node must
    reach a root; a dangling parent (no node row with that id) raises
    on the first doubling round, a cycle raises after ``max_iter``
    doubling rounds (max_iter=20 covers depth ~1M).

    Convergence: dist is non-decreasing per row (dist' = dist +
    h_dist, h_dist >= 0), so sum(dist) is unchanged across a round
    IFF no row moved — one observed metric replaces the old
    join-and-count convergence job. Referential integrity: the
    doubling join is inner, so a pointer at a nonexistent id silently
    drops its row; an observed row count catches exactly the rows
    whose pointer dangles (same count the old up-front anti-join
    reported) and raises loudly.
    """
    obs0 = Observation()
    ptr = (
        nodes.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(parent_col), F.col(id_col)).alias("ptr"),
            F.when(F.col(parent_col).isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("dist"),
        )
        .observe(obs0, F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s"))
        .localCheckpoint()
    )
    n_rows, total = obs0.get["n"], obs0.get["s"]

    for _ in range(max_iter):
        hop = ptr.select(
            F.col("id").alias("h_id"),
            F.col("ptr").alias("h_ptr"),
            F.col("dist").alias("h_dist"),
        )
        # id -> ptr (dist) composed with ptr -> ptr' (h_dist): roots
        # self-loop with dist 0, so finished rows are fixpoints.
        obs = Observation()
        nxt = (
            ptr.join(hop, ptr.ptr == hop.h_id)
            .select(
                "id",
                F.col("h_ptr").alias("ptr"),
                (F.col("dist") + F.col("h_dist")).alias("dist"),
            )
            .observe(
                obs, F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
            )
            .localCheckpoint()
        )
        got = obs.get
        if got["n"] != n_rows:
            raise ValueError(
                f"closure_root_depth: {n_rows - got['n']} node(s) point "
                "at a parent id that has no node row (dangling parent)"
            )
        moved_sum = got["s"]
        ptr = nxt
        if moved_sum == total:
            return ptr.select(
                "id", F.col("ptr").alias("root"), F.col("dist").alias("depth")
            )
        total = moved_sum
    raise RuntimeError(
        f"closure_root_depth did not converge in {max_iter} doubling rounds "
        "(cycle or dangling parent?)"
    )
