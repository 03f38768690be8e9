"""Range-clustered sorted export (sinks/sorted_export.py): disjoint
per-file extents, in-file sort order, and manifest-driven pruning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cga_kinesis_to_elasticsearch_spark.io import load_table
from cga_kinesis_to_elasticsearch_spark.sinks.sorted_export import (
    assign_range_file,
    export_range_clustered,
    fixed_width_boundaries,
    read_key_range,
)

N = 8


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select(F.unix_micros("ts").alias("key"), "event_id")
        .cache()
    )


@pytest.fixture(scope="module")
def exported(spark, events, tmp_path_factory):
    root = tmp_path_factory.mktemp("range_export")
    bnds = fixed_width_boundaries(events, F.col("key"), N)
    manifest = export_range_clustered(
        spark, events, root, "key", N, tiebreaks=("event_id",), boundaries=bnds
    ).collect()
    return root, bnds, manifest


class TestLayout:
    def test_manifest_covers_all_rows(self, events, exported):
        _, _, manifest = exported
        assert sum(r.n_rows for r in manifest) == events.count()

    def test_file_ranges_disjoint_and_ordered(self, exported):
        _, _, manifest = exported
        rows = sorted(manifest, key=lambda r: r.file_id)
        assert [r.file_id for r in rows] == list(range(len(rows)))
        for a, b in zip(rows, rows[1:]):
            assert a.max_key < b.min_key

    def test_boundaries_respected(self, exported):
        _, bnds, manifest = exported
        for r in manifest:
            if r.file_id > 0:
                assert r.min_key > bnds[r.file_id - 1]
            if r.file_id < N - 1:
                assert r.max_key <= bnds[r.file_id]

    def test_rows_sorted_within_each_file(self, spark, exported):
        root, _, _ = exported
        import pyarrow.parquet as pq
        from pathlib import Path

        for part in sorted(Path(root, "data").glob("file_id=*")):
            files = list(part.glob("*.parquet"))
            assert len(files) == 1  # one sorted file per bucket
            keys = pq.read_table(files[0], columns=["key"])["key"].to_pylist()
            assert keys == sorted(keys)

    def test_duplicate_keys_colocate(self, spark):
        df = spark.createDataFrame(
            [(10, i) for i in range(50)] + [(99, 0), (0, 1)], "key long, event_id long"
        )
        out = df.select(
            "key", assign_range_file(F.col("key"), [9, 10, 50]).alias("f")
        )
        assert out.filter("key = 10").select("f").distinct().count() == 1


class TestPruning:
    def test_range_read_prunes_and_is_exact(self, spark, events, exported):
        root, bnds, _ = exported
        lo, hi = bnds[2] + 1, bnds[3]  # exactly file_id=3's span
        rows, pruned = read_key_range(spark, root, lo, hi, "key")
        expected = events.filter(F.col("key").between(lo, hi))
        assert rows.count() == expected.count()
        assert len(pruned) == N - 1  # only one file survives

    def test_out_of_range_prunes_everything(self, spark, exported):
        root, _, manifest = exported
        top = max(r.max_key for r in manifest)
        rows, pruned = read_key_range(spark, root, top + 1, top + 2, "key")
        assert rows.count() == 0 and len(pruned) == N

    def test_sampled_mode_layout(self, spark, events, tmp_path):
        """repartitionByRange mode: still disjoint sorted extents."""
        manifest = export_range_clustered(
            spark, events, tmp_path, "key", N, tiebreaks=("event_id",)
        ).collect()
        rows = sorted(manifest, key=lambda r: r.file_id)
        assert sum(r.n_rows for r in rows) == events.count()
        for a, b in zip(rows, rows[1:]):
            assert a.max_key <= b.min_key

    def test_sampled_mode_duplicate_keys_colocate(self, spark, events, tmp_path):
        """Range partitioning must use the KEY ONLY: with tiebreaks in
        the partitioner, a boundary can land between two rows of one
        hot key and split it across files — extents must stay STRICTLY
        disjoint even when every key repeats many times."""
        dup = events.select(
            (F.col("key") % 50).alias("key"), F.col("event_id")
        )
        manifest = sorted(
            export_range_clustered(
                spark, dup, tmp_path / "dups", "key", 4, tiebreaks=("event_id",)
            ).collect(),
            key=lambda r: r.file_id,
        )
        for a, b in zip(manifest, manifest[1:]):
            assert a.max_key < b.min_key
