"""Z-order clustering key (operators/zorder.py)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.zorder import (
    quantize,
    zorder_key,
)


def _morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i + 1)
        out |= ((b >> i) & 1) << (2 * i)
    return out


class TestZorderKey:
    def test_known_values(self, spark):
        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3)], "a long, b long"
        )
        got = [
            r.z
            for r in df.select(
                zorder_key(F.col("a"), F.col("b"), bits=4).alias("z")
            ).collect()
        ]
        assert got == [0, 2, 1, 3, _morton(2, 3, 4)]

    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**16 - 1),
                st.integers(min_value=0, max_value=2**16 - 1),
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=15, deadline=None)
    def test_matches_reference_morton(self, spark, vals):
        df = spark.createDataFrame(vals, "a long, b long")
        got = [
            r.z
            for r in df.select(
                zorder_key(F.col("a"), F.col("b")).alias("z")
            ).collect()
        ]
        assert got == [_morton(a, b, 16) for a, b in vals]

    def test_locality_beats_lexicographic_on_second_dim(self, spark):
        # rows sorted by morton key: filtering on dimension b alone
        # touches fewer contiguous chunks than a sort by (a, b) would
        n = 16
        rows = [(a, b) for a in range(n) for b in range(n)]
        df = spark.createDataFrame(rows, "a long, b long")
        z = df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b"), bits=4).alias("z")
        ).orderBy("z")
        ordered_b = [r.b for r in z.collect()]
        # count contiguous runs hitting b < 4 (a 25% selective filter)
        chunks, inside = 0, False
        for b in ordered_b:
            hit = b < 4
            if hit and not inside:
                chunks += 1
            inside = hit
        # lexicographic (a, b) order would produce n = 16 separate runs;
        # morton order groups them into ~sqrt-many
        assert chunks <= 8


class TestQuantize:
    def test_scales_to_bit_budget(self, spark):
        df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
        got = [
            r.q
            for r in df.select(
                quantize(F.col("v"), 0.0, 100.0, bits=8).alias("q")
            ).collect()
        ]
        assert got[0] == 0 and got[2] == 255 and 126 <= got[1] <= 128

    def test_clamps_out_of_range(self, spark):
        df = spark.createDataFrame([(-5.0,), (500.0,)], "v double")
        got = [
            r.q
            for r in df.select(
                quantize(F.col("v"), 0.0, 100.0, bits=8).alias("q")
            ).collect()
        ]
        assert got == [0, 255]


class TestCompactionZorder:
    def test_zorder_cluster_by_expression(self, spark, tmp_path):
        from cga_kinesis_to_elasticsearch_spark.sinks.compact import (
            compact_index,
        )

        root = tmp_path / "data"
        rows = [
            ("a-2024-01-01", i % 13, (i * 7) % 17, i) for i in range(300)
        ]
        spark.createDataFrame(
            rows, "es_index string, app long, minute long, event_id long"
        ).repartition(8).write.partitionBy("es_index").parquet(str(root))
        stats = compact_index(
            spark,
            root,
            target_file_bytes=1 << 30,
            cluster_by=(zorder_key(F.col("app"), F.col("minute"), bits=5),),
        )
        assert stats.partitions_compacted == 1
        part = root / "es_index=a-2024-01-01"
        out = spark.read.parquet(str(part))
        assert out.count() == 300
        # rows are in morton order within the single rewritten file
        collected = [
            (r.app, r.minute) for r in out.collect()
        ]
        keys = [_morton(a, m, 5) for a, m in collected]
        assert keys == sorted(keys)
