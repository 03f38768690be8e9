"""Targeted deletion over the day-partitioned sink (sinks/forget.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.sinks._swap import part_paths
from cga_kinesis_to_elasticsearch_spark.sinks.forget import forget


def _write(spark, root, rows):
    spark.createDataFrame(
        rows, "es_index string, user_id long, msg string"
    ).repartition(4).write.partitionBy("es_index").parquet(str(root))


class TestForget:
    def test_deletes_only_matching_rows(self, spark, tmp_path):
        root = tmp_path / "data"
        rows = [
            (f"logs-2024-01-0{1 + i % 2}", i % 5, f"m{i}") for i in range(50)
        ]
        _write(spark, root, rows)
        stats = forget(spark, root, F.col("user_id") == 3)
        remaining = spark.read.parquet(str(root))
        assert remaining.filter(F.col("user_id") == 3).count() == 0
        expected_kept = sum(1 for r in rows if r[1] != 3)
        assert remaining.count() == expected_kept
        assert stats.rows_deleted == 50 - expected_kept
        assert stats.partitions_rewritten == 2

    def test_untouched_partitions_not_rewritten(self, spark, tmp_path):
        root = tmp_path / "data"
        rows = [("logs-2024-01-01", 1, "a"), ("logs-2024-01-02", 2, "b")]
        _write(spark, root, rows)
        before = sorted(
            p.stat().st_mtime_ns
            for p in (root / "es_index=logs-2024-01-02").glob("*.parquet")
        )
        stats = forget(spark, root, F.col("user_id") == 1)
        after = sorted(
            p.stat().st_mtime_ns
            for p in (root / "es_index=logs-2024-01-02").glob("*.parquet")
        )
        assert stats.partitions_rewritten == 1
        assert before == after  # day-02 files untouched

    def test_idempotent(self, spark, tmp_path):
        root = tmp_path / "data"
        _write(spark, root, [("logs-2024-01-01", i, "x") for i in range(10)])
        forget(spark, root, F.col("user_id") < 3)
        stats2 = forget(spark, root, F.col("user_id") < 3)
        assert stats2.partitions_rewritten == 0 and stats2.rows_deleted == 0

    def test_crash_recovery_before_delete(self, spark, tmp_path):
        root = tmp_path / "data"
        _write(spark, root, [("logs-2024-01-01", i, "x") for i in range(10)])
        final, _, old = part_paths(root, "es_index=logs-2024-01-01")
        final.rename(old)  # interrupted earlier swap
        stats = forget(spark, root, F.col("user_id") == 0)
        remaining = spark.read.parquet(str(root))
        # recovered partition participated in the delete
        assert remaining.count() == 9
        assert stats.partitions_rewritten == 1


class TestPartitionDirNames:
    """The swap must match the dir names Spark ACTUALLY wrote —
    partitionBy %XX-escapes special characters and partition-type
    inference would normalize values like '0123' -> 123."""

    def test_escaped_partition_values(self, spark, tmp_path):
        root = tmp_path / "data"
        # ':' is escaped by partitionBy -> 'es_index=logs%3A01'
        rows = [("logs:01", 1, "a"), ("logs:01", 2, "b"), ("logs:02", 3, "c")]
        _write(spark, root, rows)
        assert (root / "es_index=logs%3A01").exists()
        stats = forget(spark, root, F.col("user_id") == 1)
        remaining = spark.read.parquet(str(root))
        assert remaining.count() == 2
        assert stats.rows_deleted == 1 and stats.partitions_rewritten == 1
        assert (root / "es_index=logs%3A01").exists()
        assert not (root / ".tmp-rewrite").exists()

    def test_numeric_looking_values_not_normalized(self, spark, tmp_path):
        root = tmp_path / "data"
        # inference would read '0123' as int 123 and reconstruct the
        # wrong dir name; a full delete of that partition must still
        # land on the real dir, not an 'es_index=123' ghost
        rows = [("0123", 1, "a"), ("0123", 2, "b"), ("0456", 3, "c")]
        _write(spark, root, rows)
        stats = forget(spark, root, F.col("es_index") == "0123")
        assert stats.rows_deleted == 2 and stats.partitions_rewritten == 1
        assert (root / "es_index=0123").exists()
        assert list((root / "es_index=0123").glob("*.parquet")) == []
        remaining = spark.read.parquet(str(root))
        assert remaining.count() == 1

    def test_full_delete_swaps_empty_dir(self, spark, tmp_path):
        root = tmp_path / "data"
        rows = [("logs-2024-01-01", i, "x") for i in range(5)] + [
            ("logs-2024-01-02", 9, "y")
        ]
        _write(spark, root, rows)
        stats = forget(spark, root, F.col("es_index") == "logs-2024-01-01")
        assert stats.rows_deleted == 5 and stats.rows_kept == 0
        assert (root / "es_index=logs-2024-01-01").exists()
        assert spark.read.parquet(str(root)).count() == 1


class TestNullPredicate:
    def test_null_predicate_rows_kept(self, spark, tmp_path):
        root = tmp_path / "data"
        spark.createDataFrame(
            [("logs-2024-01-01", 1, "x"), ("logs-2024-01-01", 2, None)],
            "es_index string, user_id long, app string",
        ).write.partitionBy("es_index").parquet(str(root))
        # predicate is NULL for the row with app=None: must be KEPT
        stats = forget(spark, root, F.col("app") == "x")
        remaining = spark.read.parquet(str(root))
        assert remaining.count() == 1
        assert remaining.first().user_id == 2
        assert stats.rows_deleted == 1 and stats.rows_kept == 1


class TestNullPartitionValue:
    """A NULL partition value is written as __HIVE_DEFAULT_PARTITION__;
    isin() alone would never select it (three-valued logic) and the
    promote step would abort — the touched-values predicate must
    include it explicitly (round-6 ADVICE)."""

    def test_forget_touches_null_partition(self, spark, tmp_path):
        root = tmp_path / "data"
        spark.createDataFrame(
            [("logs-2024-01-01", 1, "a"), (None, 3, "b"), (None, 4, "c")],
            "es_index string, user_id long, msg string",
        ).write.partitionBy("es_index").parquet(str(root))
        assert (root / "es_index=__HIVE_DEFAULT_PARTITION__").exists()
        stats = forget(spark, root, F.col("user_id") == 3)
        assert stats.rows_deleted == 1
        remaining = spark.read.parquet(str(root))
        assert remaining.count() == 2
        assert remaining.filter(F.col("user_id") == 3).count() == 0
        # the surviving NULL-partition row is intact
        assert remaining.filter(F.col("user_id") == 4).count() == 1

    def test_forget_full_delete_of_null_partition(self, spark, tmp_path):
        root = tmp_path / "data"
        spark.createDataFrame(
            [("logs-2024-01-01", 1, "a"), (None, 3, "b")],
            "es_index string, user_id long, msg string",
        ).write.partitionBy("es_index").parquet(str(root))
        stats = forget(spark, root, F.col("user_id") == 3)
        assert stats.rows_deleted == 1
        remaining = spark.read.parquet(str(root))
        assert remaining.count() == 1
