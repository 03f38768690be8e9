"""Composed curation pipeline (operators/curation.py) and the sharded
training-data export (sinks/shards.py)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.curation import curate_corpus
from cga_kinesis_to_elasticsearch_spark.sinks.shards import (
    export_shards,
    read_manifest,
    shard_of,
)


class TestCurateCorpus:
    def test_gates_and_keep_first(self, spark):
        rows = [
            # good English doc, long enough, stopworded
            (1, "the cat and the dog sat on the mat in the sun all day long"),
            # duplicate of doc 1 under a later id -> election drops it
            (9, "The cat and the dog sat on the mat in the sun all day long"),
            # German -> language gate drops it
            (2, "der hund und das haus und der baum und das auto hier oben"),
            # digit soup -> quality gate drops it
            (3, "the 111 222 333 444 555 666 777 888 999 000 111 222 333"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = curate_corpus(df, "text", "doc_id", min_quality=0.1)
        got = {r.doc_id: r for r in out.collect()}
        assert set(got) == {1}
        assert got[1].lang_guess == "en"
        assert got[1].n_tokens == 15
        # fingerprint is normalization-robust: 1 and 9 shared it
        fp = curate_corpus(
            df.filter(F.col("doc_id").isin(1, 9)), "text", "doc_id",
            min_quality=0.0,
        )
        assert fp.count() == 1 and fp.first().doc_id == 1

    def test_single_exchange_plan(self, spark):
        df = spark.createDataFrame(
            [(1, "the a of to and x")], "doc_id long, text string"
        )
        plan = (
            curate_corpus(df, "text", "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one shuffle: the fingerprint election; features must not join
        assert plan.count("Exchange") == 1
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


class TestShardExport:
    def test_manifest_matches_disk_and_is_deterministic(
        self, spark, sf_dir, tmp_path
    ):
        from cga_kinesis_to_elasticsearch_spark.io import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        m1 = export_shards(
            spark, docs, tmp_path / "x", 4, "doc_id", ["text"]
        ).collect()
        m2 = export_shards(
            spark, docs, tmp_path / "x", 4, "doc_id", ["text"]
        ).collect()
        assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
        assert sum(r.n_rows for r in m1) == docs.count()
        mj = read_manifest(tmp_path / "x")
        assert mj["n_shards"] == 4
        assert sorted(s["shard"] for s in mj["shards"]) == sorted(
            r.shard for r in m1
        )
        # one parquet file per shard directory (delivery contract)
        for d in (tmp_path / "x" / "data").glob("shard=*"):
            files = [p for p in d.glob("*.parquet")]
            assert len(files) == 1, d

    def test_assignment_is_stable_and_total(self, spark):
        df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
        a = df.select("doc_id", shard_of("doc_id", 8).alias("s"))
        counts = {r.s: r["count"] for r in a.groupBy("s").count().collect()}
        assert set(counts) == set(range(8))  # every shard populated
        # same expression, same placement
        b = df.select("doc_id", shard_of("doc_id", 8).alias("s"))
        assert a.exceptAll(b).count() == 0


class TestJsonlShards:
    def test_jsonl_manifest_matches_parquet_manifest(self, spark, sf_dir, tmp_path):
        """Same placement + same order-free checksum regardless of the
        landing format: the JSONL export's read-back manifest must
        equal the parquet export's — certifying every value survived
        JSON text serialization."""
        import gzip

        from cga_kinesis_to_elasticsearch_spark.io import load_table
        from cga_kinesis_to_elasticsearch_spark.sinks.shards import (
            export_jsonl_shards,
            export_shards,
            read_manifest,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        mp = {
            r["shard"]: (r["n_rows"], r["checksum"])
            for r in export_shards(
                spark, docs, tmp_path / "pq", 4, "doc_id", ["text", "lang"]
            ).collect()
        }
        mj = {
            r["shard"]: (r["n_rows"], r["checksum"])
            for r in export_jsonl_shards(
                spark, docs, tmp_path / "jl", 4, "doc_id", ["text", "lang"]
            ).collect()
        }
        assert mj == mp and len(mj) == 4
        assert read_manifest(tmp_path / "jl")["format"] == "jsonl"
        # the files really are gzipped line-JSON, one object per row
        files = sorted((tmp_path / "jl" / "data").rglob("*.json.gz"))
        assert files
        with gzip.open(files[0], "rt") as fh:
            first = fh.readline()
        import json as _json

        obj = _json.loads(first)
        assert {"doc_id", "text", "lang"} <= set(obj)


class TestCurationFunnel:
    def test_funnel_accounts_for_every_document(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.curation import (
            curate_corpus,
            curation_funnel,
        )

        docs = spark.createDataFrame(
            [
                # two english dups (stage-3: one rejected)
                (1, "the quick brown fox is on it for a while and the rest"),
                (2, "the quick brown fox is on it for a while and the rest"),
                # non-english (stage-1)
                (3, "der schnelle braune fuchs und der rest von allem hier"),
                # too-low quality: all digits (stage-2)
                (4, "123 456 789 000 111 222 333 444 555 666 777 888 999 b"),
                # clean survivor
                (5, "a genuinely varied sentence with many of the words in it"),
            ],
            ["doc_id", "text"],
        )
        funnel = {
            r.gate: r for r in curation_funnel(docs, "text", "doc_id").collect()
        }
        assert funnel["lang_gate"].rows_in == 5
        # stage chaining: each stage's rows_in is the previous rows_out
        assert funnel["quality_gate"].rows_in == funnel["lang_gate"].rows_out
        assert (
            funnel["dedup_keep_first"].rows_in
            == funnel["quality_gate"].rows_out
        )
        assert funnel["dedup_keep_first"].rejected == 1
        # final rows_out == what curate_corpus actually keeps
        kept = curate_corpus(docs, "text", "doc_id").count()
        assert funnel["dedup_keep_first"].rows_out == kept
        # pct is rejected/rows_in
        s1 = funnel["lang_gate"]
        assert s1.reject_pct == round(s1.rejected / s1.rows_in, 6)
