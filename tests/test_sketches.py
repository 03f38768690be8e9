"""Mergeable sketch rollups (operators/sketches.py): exactness in the
coupon regime, merge associativity (the property that makes stored
per-day sketches answer any-range queries), KLL rank error, theta set
algebra vs exact overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.sketches import (
    hll_day_sketches,
    hll_range_distinct,
    kll_day_sketches,
    kll_range_quantiles,
    theta_day_sketches,
    theta_overlap,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from cga_kinesis_to_elasticsearch_spark.io import load_table

    return load_table(spark, sf_dir, "events")


class TestHll:
    def test_per_day_exact_at_small_cardinality(self, events):
        est = {
            r.day: r.distinct_est
            for r in hll_day_sketches(events, "ts", "user_id").collect()
        }
        exact = {
            r.day: r.n
            for r in events.groupBy(
                F.to_date("ts").cast("string").alias("day")
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert est == exact

    def test_range_from_stored_sketches(self, events):
        sk = hll_day_sketches(events, "ts", "user_id")
        got = hll_range_distinct(sk, "1990-01-01", "2099-12-31").first()
        exact = events.select("user_id").distinct().count()
        assert got.distinct_est == exact

    def test_merge_associativity(self, events):
        # union of per-day sketches == one sketch over everything:
        # the invariant that lets stored partials replace fact rescans
        sk = hll_day_sketches(events, "ts", "user_id")
        merged = hll_range_distinct(sk, "1990-01-01", "2099-12-31").first()
        whole = events.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).cast("long")
        ).first()[0]
        assert merged.distinct_est == whole

    def test_subrange_filters_sketch_rows(self, events):
        sk = hll_day_sketches(events, "ts", "user_id")
        days = sorted(r.day for r in sk.select("day").collect())
        sub = days[: max(1, len(days) // 2)]
        got = hll_range_distinct(sk, sub[0], sub[-1]).first()
        exact = (
            events.where(
                F.to_date("ts").cast("string").between(sub[0], sub[-1])
            )
            .select("user_id")
            .distinct()
            .count()
        )
        assert got.distinct_est == exact


class TestKll:
    def test_merged_quantiles_within_rank_error(self, events):
        sk = kll_day_sketches(events, "ts", "value")
        got = kll_range_quantiles(sk, "1990-01-01", "2099-12-31").first()
        vals = sorted(r[0] for r in events.select("value").collect())
        n = len(vals)
        assert got.n == n
        # KLL k=2048 -> rank error ~0.6%; allow 2% slack
        for q, attr in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            v = getattr(got, attr)
            lo = vals[max(0, int((q - 0.02) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.02) * n))]
            assert lo <= v <= hi, (attr, v, lo, hi)


class TestTheta:
    def test_overlap_exact(self, events):
        sk = theta_day_sketches(events, "ts", "user_id")
        days = sorted(r.day for r in sk.select("day").collect())
        a, b = days[0], days[-1]
        got = theta_overlap(sk, a, b).first()
        ua = {
            r.user_id
            for r in events.where(F.to_date("ts").cast("string") == a)
            .select("user_id")
            .collect()
        }
        ub = {
            r.user_id
            for r in events.where(F.to_date("ts").cast("string") == b)
            .select("user_id")
            .collect()
        }
        assert got.returning == len(ua & ub)
        assert got.churned == len(ua - ub)
        assert got.new == len(ub - ua)


class TestPlanShape:
    def test_day_sketch_is_one_exchange(self, events):
        # sketch agg is map-side partial: shuffle moves sketches not keys
        sk = hll_day_sketches(events, "ts", "user_id")
        jvm = sk.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = sk._jdf.queryExecution().explainString(mode)
        n_xchg = sum(
            1
            for l in plan.splitlines()
            if "Arguments: hashpartitioning" in l
        )
        assert n_xchg == 1
        assert "partial_hll_sketch_agg" in plan or "HashAggregate" in plan


class TestCountMin:
    def test_estimates_upper_bound_exact_counts(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.io import load_table
        from cga_kinesis_to_elasticsearch_spark.operators.sketches import (
            cm_estimate,
            cm_sketch,
        )
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_dir, "events")
        sk = cm_sketch(ev, "user_id")
        probes = ev.select("user_id").distinct()
        est = {
            r.key: r.est_count
            for r in cm_estimate(sk, probes, "user_id").collect()
        }
        exact = {
            str(r.user_id): r.n
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        overs = []
        for k, true_n in exact.items():
            assert est[k] >= true_n  # count-min never underestimates
            overs.append(est[k] - true_n)
        # with 4x256 counters over sf0.001's ~50 users, most probes are
        # collision-free and the mean overestimate stays small
        assert sum(overs) / len(overs) <= 0.2 * (
            sum(exact.values()) / len(exact)
        )

    def test_sketches_merge_additively(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.io import load_table
        from cga_kinesis_to_elasticsearch_spark.operators.sketches import (
            cm_estimate,
            cm_sketch,
        )
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_dir, "events")
        a = cm_sketch(ev.filter("event_id % 2 = 0"), "user_id")
        b = cm_sketch(ev.filter("event_id % 2 = 1"), "user_id")
        merged = (
            a.unionByName(b)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = cm_sketch(ev, "user_id")
        probes = ev.select("user_id").distinct()
        em = {
            r.key: r.est_count
            for r in cm_estimate(merged, probes, "user_id").collect()
        }
        ew = {
            r.key: r.est_count
            for r in cm_estimate(whole, probes, "user_id").collect()
        }
        assert em == ew  # summing slice sketches == sketching the whole

    def test_day_cm_state_via_rollup_maintenance(self, spark, tmp_path):
        """Count-min day state composes with refresh_rollup: counters
        are ADDITIVE (a replayed batch would double-count), so per-day
        cm tables are maintained recompute-from-facts style — the
        rollup maintainer's idempotent protocol — and any range is
        answered by summing stored day tables."""
        from cga_kinesis_to_elasticsearch_spark.operators.sketches import (
            cm_estimate,
            cm_sketch,
        )
        from cga_kinesis_to_elasticsearch_spark.sinks.rollup import (
            refresh_rollup,
            touched_days,
        )
        from pyspark.sql import functions as F

        facts = tmp_path / "facts"
        state = tmp_path / "cm"
        rows = [
            (f"2024-01-0{1 + i % 2}", f"u{i % 7}") for i in range(200)
        ]
        df = spark.createDataFrame(rows, "day string, uid string")
        df.write.partitionBy("day").parquet(str(facts))

        agg = lambda day_slice: cm_sketch(day_slice, "uid")
        days = touched_days(df, "day")
        # twice: replayed maintenance must not double-count
        refresh_rollup(spark, facts, state, days, agg, date_col="day")
        refresh_rollup(spark, facts, state, days, agg, date_col="day")

        merged = (
            spark.read.parquet(str(state))
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        probes = df.select("uid").distinct()
        est = {
            r.key: r.est_count
            for r in cm_estimate(merged, probes, "uid").collect()
        }
        whole = cm_sketch(df, "uid")
        expect = {
            r.key: r.est_count
            for r in cm_estimate(whole, probes, "uid").collect()
        }
        assert est == expect
