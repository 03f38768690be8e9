"""Phrase-suggester semantics (plans/searchindex.py): per-token
candidate generation by edit distance, frequency-ranked, with
in-vocabulary and OOV passthrough behavior."""

from __future__ import annotations

from cga_kinesis_to_elasticsearch_spark.plans import searchindex as SI


def _unwrap(fn):
    return getattr(fn, "__wrapped__", fn)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


class TestPhraseSuggest:
    def test_correction_ranking_and_passthrough(self, spark, monkeypatch):
        # 'slow' appears in 3 docs, 'slot' in 1: both are distance 1
        # from probe 'sloww' -> df breaks the tie toward 'slow'.
        texts = [
            "slow merge running",
            "slow query plan",
            "slow table scan",
            "slot machine",
        ]
        monkeypatch.setattr(SI, "_tp", lambda s, d, n: _docs(spark, texts))
        out = _unwrap(SI._phrase_suggest_correction)(
            spark, "unused"
        ).collect()
        got = {r.pos: r for r in out}
        # probe: ["sloww", "merge", "qurey", "zzzqx"]
        assert got[0].suggestion == "slow" and got[0].dist == 1
        assert got[0].df == 3
        # in-vocabulary token self-corrects at distance 0
        assert got[1].suggestion == "merge" and got[1].dist == 0
        # 'qurey' -> 'query' is a transposition = distance 2 in plain
        # Levenshtein (no Damerau) on both engines
        assert got[2].suggestion == "query" and got[2].dist == 2
        # OOV with no candidate within distance 2 passes through
        assert got[3].suggestion == "zzzqx"
        assert got[3].dist is None and got[3].df == 0
        assert [r.pos for r in out] == [0, 1, 2, 3]
