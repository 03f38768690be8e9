"""Resolved-frame cache gating (io.py): only declared-immutable roots
are memoized, so a same-application rewrite of any other path can
never serve a stale file listing (round-6 ADVICE)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from cga_kinesis_to_elasticsearch_spark import io as eio


def _write_file(path, n):
    pq.write_table(pa.table({"id": list(range(n))}), str(path))


class TestDfCacheGating:
    def test_mutable_path_not_cached_and_rewrite_visible(
        self, spark, tmp_path
    ):
        path = tmp_path / "t.parquet"
        _write_file(path, 3)
        df1 = eio.load_table(spark, str(tmp_path), "t")
        assert df1.count() == 3
        key_hits = [
            k for k in eio._DF_CACHE if k[1].startswith(str(tmp_path))
        ]
        assert not key_hits  # not under an immutable root -> no memo
        # rewrite in place: a fresh load must see the new listing
        _write_file(path, 5)
        assert eio.load_table(spark, str(tmp_path), "t").count() == 5

    def test_registered_root_cached_and_invalidate(self, spark, tmp_path):
        root = tmp_path / "frozen"
        root.mkdir()
        path = root / "t.parquet"
        _write_file(path, 4)
        eio.register_immutable_root(str(root))
        try:
            df1 = eio.load_table(spark, str(root), "t")
            df2 = eio.load_table(spark, str(root), "t")
            assert df2 is df1  # memoized resolved plan
            assert eio.invalidate_cached_tables(str(root)) == 1
            df3 = eio.load_table(spark, str(root), "t")
            assert df3 is not df1
        finally:
            eio._IMMUTABLE_PREFIXES.remove(str(root))
            eio.invalidate_cached_tables(str(root))

    def test_testdata_root_still_cached(self, spark):
        df1 = eio.load_table(spark, "/root/testdata/sf0.001", "region")
        df2 = eio.load_table(spark, "/root/testdata/sf0.001", "region")
        assert df2 is df1
