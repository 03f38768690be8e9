"""ES-bulk pluggable sink (sinks/esbulk_sink.py): DataSource V2
commit protocol — batch commit/overwrite, action shape, streaming
epoch commits, replay idempotence, uncommitted-epoch invisibility."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.sinks.esbulk_sink import (
    read_bulk_actions,
    write_es_bulk,
    write_es_bulk_stream,
)


def _docs(spark, n=6):
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("logs-2024.01.0"), (F.col("id") % 2) + 1).alias(
            "es_index"
        ),
        (F.col("id") * 10).alias("value"),
        F.lit("msg").alias("text"),
    )


class TestBatchSink:
    def test_roundtrip_action_shape(self, spark, tmp_path):
        root = str(tmp_path / "es")
        write_es_bulk(_docs(spark), root)
        actions = read_bulk_actions(root)
        assert len(actions) == 6
        metas = {m["index"]["_id"]: m["index"]["_index"] for m, _ in actions}
        assert metas["d0"] == "logs-2024.01.01"
        assert metas["d1"] == "logs-2024.01.02"
        for meta, src in actions:
            # meta columns never leak into _source; payload cols do
            assert set(src) == {"value", "text"}
        assert os.path.exists(os.path.join(root, "_SUCCESS.json"))
        manifest = json.load(open(os.path.join(root, "_SUCCESS.json")))
        assert manifest["n_docs"] == 6

    def test_overwrite_clears_previous_output(self, spark, tmp_path):
        root = str(tmp_path / "es")
        write_es_bulk(_docs(spark, 4), root)
        write_es_bulk(_docs(spark, 2), root, mode="overwrite")
        assert len(read_bulk_actions(root)) == 2

    def test_append_accumulates(self, spark, tmp_path):
        root = str(tmp_path / "es")
        write_es_bulk(_docs(spark, 4), root)
        write_es_bulk(_docs(spark, 2), root)
        assert len(read_bulk_actions(root)) == 6

    def test_custom_id_and_index_columns(self, spark, tmp_path):
        root = str(tmp_path / "es")
        df = spark.range(3).select(
            F.col("id").alias("k"),
            F.lit("idx").alias("target"),
            F.lit(1).alias("v"),
        )
        write_es_bulk(
            df, root, **{"es.mapping.id": "k", "index_col": "target"}
        )
        actions = read_bulk_actions(root)
        assert {m["index"]["_id"] for m, _ in actions} == {"0", "1", "2"}
        assert all(m["index"]["_index"] == "idx" for m, _ in actions)
        assert all(set(s) == {"v"} for _, s in actions)


class TestStreamSink:
    def _start(self, spark, tmp_path, in_dir):
        stream = (
            spark.readStream.schema("doc_id string, es_index string, value long")
            .parquet(in_dir)
        )
        root = str(tmp_path / "es_stream")
        q = (
            write_es_bulk_stream(
                stream, root, str(tmp_path / "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive
        return root

    def test_epoch_commit_and_manifest(self, spark, tmp_path):
        in_dir = str(tmp_path / "in")
        spark.createDataFrame(
            [("a", "idx1", 1), ("b", "idx2", 2)],
            "doc_id string, es_index string, value long",
        ).write.parquet(in_dir)
        root = self._start(spark, tmp_path, in_dir)
        actions = read_bulk_actions(root)
        assert {m["index"]["_id"] for m, _ in actions} == {"a", "b"}
        commits = os.listdir(os.path.join(root, "_commits"))
        assert commits  # at least one committed epoch

    def test_uncommitted_epoch_is_invisible(self, spark, tmp_path):
        in_dir = str(tmp_path / "in")
        spark.createDataFrame(
            [("a", "idx1", 1)],
            "doc_id string, es_index string, value long",
        ).write.parquet(in_dir)
        root = self._start(spark, tmp_path, in_dir)
        # simulate a crash window: epoch dir present, manifest missing
        os.makedirs(os.path.join(root, "bulk", "epoch=99"))
        with open(
            os.path.join(root, "bulk", "epoch=99", "x.ndjson"), "w"
        ) as f:
            f.write('{"index": {"_index": "i", "_id": "ghost"}}\n{}\n')
        ids = {m["index"]["_id"] for m, _ in read_bulk_actions(root)}
        assert "ghost" not in ids

    def test_replay_is_idempotent(self, spark, tmp_path):
        # re-running batchId N (at-least-once replay) must not
        # duplicate its docs: the epoch dir is cleared and rewritten
        from cga_kinesis_to_elasticsearch_spark.sinks.esbulk_sink import (
            _Msg,
            _StreamWriter,
        )

        root = str(tmp_path / "es_replay")
        w = _StreamWriter({"path": root})

        def _fake_task(payload: str) -> _Msg:
            os.makedirs(os.path.join(root, "_tmp"), exist_ok=True)
            name = f"{payload}.ndjson"
            with open(os.path.join(root, "_tmp", name), "w") as f:
                f.write(
                    json.dumps(
                        {"index": {"_index": "i", "_id": payload}}
                    )
                    + "\n{}\n"
                )
            return _Msg(tmp_name=name, n_docs=1)

        w.commit([_fake_task("doc1")], batchId=7)
        w.commit([_fake_task("doc1")], batchId=7)  # replay
        actions = read_bulk_actions(root)
        assert len(actions) == 1
        assert actions[0][0]["index"]["_id"] == "doc1"


@pytest.fixture()
def tmp_path(tmp_path_factory):
    return tmp_path_factory.mktemp("esbulk")


class TestStreamRestart:
    def test_checkpoint_restart_appends_new_epochs_only(
        self, spark, tmp_path
    ):
        in_dir = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        root = str(tmp_path / "es")
        spark.createDataFrame(
            [("a", "idx", 1)],
            "doc_id string, es_index string, value long",
        ).write.parquet(in_dir)

        def run_once():
            stream = spark.readStream.schema(
                "doc_id string, es_index string, value long"
            ).parquet(in_dir)
            q = (
                write_es_bulk_stream(stream, root, ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            assert not q.isActive

        run_once()
        first_ids = {m["index"]["_id"] for m, _ in read_bulk_actions(root)}
        assert first_ids == {"a"}
        # new input lands between runs; restart must resume from the
        # committed offset — docs from run 1 are NOT re-emitted
        spark.createDataFrame(
            [("b", "idx", 2)],
            "doc_id string, es_index string, value long",
        ).write.mode("append").parquet(in_dir)
        run_once()
        actions = read_bulk_actions(root)
        ids = sorted(m["index"]["_id"] for m, _ in actions)
        assert ids == ["a", "b"]  # exactly once each, no duplicates


class TestMetaColumnValidation:
    def test_missing_id_column_fails_at_plan_time(self, spark, tmp_path):
        import pytest

        df = spark.range(3).select(
            F.col("id").alias("not_the_id"),
            F.lit("idx").alias("es_index"),
        )
        with pytest.raises(Exception, match="es.mapping.id"):
            write_es_bulk(df, str(tmp_path / "b1"))

    def test_missing_index_column_fails_at_plan_time(self, spark, tmp_path):
        import pytest

        df = spark.range(3).select(F.col("id").cast("string").alias("doc_id"))
        with pytest.raises(Exception, match="index_col"):
            write_es_bulk(df, str(tmp_path / "b2"))
