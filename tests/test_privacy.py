"""Privacy operators: pseudonymization + deterministic Laplace."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from cga_kinesis_to_elasticsearch_spark.operators.privacy import (
    laplace_noise,
    pseudonymize,
)


class TestPseudonymize:
    def test_vault_and_tokens_consistent(self, spark):
        df = spark.createDataFrame(
            [Row(user=1, x="a"), Row(user=1, x="b"), Row(user=2, x="c")]
        )
        tok, vault = pseudonymize(df, "user", "s3cret")
        trows = tok.collect()
        vrows = {r["user"]: r["user_token"] for r in vault.collect()}
        assert "user" not in tok.columns
        assert len(vrows) == 2
        # same id -> same token, and the vault maps back
        tokens = {r["x"]: r["user_token"] for r in trows}
        assert tokens["a"] == tokens["b"] == vrows[1]
        assert tokens["c"] == vrows[2]
        assert tokens["a"] != tokens["c"]

    def test_salt_changes_tokens(self, spark):
        df = spark.createDataFrame([Row(user=1)])
        _, v1 = pseudonymize(df, "user", "salt-a")
        _, v2 = pseudonymize(df, "user", "salt-b")
        assert (
            v1.collect()[0]["user_token"] != v2.collect()[0]["user_token"]
        )


class TestLaplaceNoise:
    def test_distribution_shape(self, spark):
        # over many keys: mean ~ 0, both signs occur, all finite
        df = spark.range(2000).select(
            laplace_noise(F.col("id"), "t0", 2.0).alias("n")
        )
        vals = [r["n"] for r in df.collect()]
        assert all(math.isfinite(v) for v in vals)
        assert any(v > 0 for v in vals) and any(v < 0 for v in vals)
        mean = sum(vals) / len(vals)
        # Laplace(2) has std 2*sqrt(2); 2000 draws -> |mean| < 0.5 easily
        assert abs(mean) < 0.5
        # b=2 Laplace: P(|x|>4) = e^-2 ~ 13%; check the tail exists but
        # is a minority
        big = sum(1 for v in vals if abs(v) > 4.0)
        assert 0 < big < len(vals) // 4

    def test_deterministic(self, spark):
        one = spark.range(5).select(laplace_noise(F.col("id"), "t1", 1.0).alias("n"))
        a = [r["n"] for r in one.collect()]
        b = [r["n"] for r in one.collect()]
        assert a == b
