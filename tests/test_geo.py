"""Geo bucketing / radius operators."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from cga_kinesis_to_elasticsearch_spark.operators import geo as G


class TestGeo:
    def test_grid_cell_boundaries(self, spark):
        # cell edges: -9000 -> y=0; -8501 stays in cell 0; -8500 is 1
        df = spark.createDataFrame(
            [Row(lat=-9000, lon=-18000), Row(lat=-8501, lon=-17501),
             Row(lat=-8500, lon=-17500), Row(lat=8999, lon=17999)]
        )
        y, x = G.grid_cell(F.col("lat"), F.col("lon"), 500)
        got = df.select(y.alias("y"), x.alias("x")).collect()
        assert [(r["y"], r["x"]) for r in got] == [
            (0, 0), (0, 0), (1, 1), (35, 71)
        ]

    def test_within_radius_inclusive_edge(self, spark):
        df = spark.createDataFrame(
            [Row(lat=100, lon=0), Row(lat=101, lon=0), Row(lat=0, lon=100),
             Row(lat=60, lon=80), Row(lat=61, lon=80)]
        )
        hit = G.within_radius(F.col("lat"), F.col("lon"), 0, 0, 100)
        got = [r[0] for r in df.select(hit).collect()]
        # (100,0) on the rim -> in; (60,80) is 3-4-5 rim -> in
        assert got == [True, False, True, True, False]

    def test_centroid_exact(self, spark):
        df = spark.createDataFrame([Row(lat=100, lon=200), Row(lat=200, lon=400)])
        clat, clon = G.centroid_cols(F.col("lat"), F.col("lon"))
        (r,) = df.agg(clat.alias("a"), clon.alias("b")).collect()
        assert (r["a"], r["b"]) == (1.5, 3.0)

    def test_filter_reaches_scan(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.plans.geo import (
            geo_radius_customers,
        )

        plan = geo_radius_customers(spark, sf_dir)._jdf.queryExecution(
        ).executedPlan().toString()
        # the disk test must run as a Filter before any exchange, and
        # the join must broadcast
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
