"""Corpus-curation declared queries (training-data pipeline stages)
under the DuckDB oracle: vocabulary coverage, cross-document
boilerplate line removal, semantic dedup, and embedding outlier
scoring.

The documents fixture is single-line word salad, so the boilerplate
query synthesizes a line structure identically on both sides: every doc
gains a footer line, every 4th doc a newsletter line — real repeated
lines for the >= min_docs detector to find (same technique as the PII
queries in textpii.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import similarity as S
from ..operators import text as T
from .declared import q
from .northstar import _NEAR_DUP_THR, _bucket_sql, _norm_sql, _tp

# ---------------------------------------------------------------------------
# Vocabulary coverage
# ---------------------------------------------------------------------------

_VOCAB_K = 100

_VOCAB_ORACLE = f"""
WITH n AS (SELECT {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT unnest(string_split(norm, ' ')) AS term FROM n),
c AS (SELECT term, count(*) AS n FROM tok WHERE term <> '' GROUP BY term),
tot AS (SELECT sum(n) AS total FROM c),
r AS (SELECT term, n,
             row_number() OVER (ORDER BY n DESC, term ASC) AS rank,
             sum(n) OVER (ORDER BY n DESC, term ASC
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM c)
SELECT term, n, rank, round(cum / total, 6) AS cum_share
FROM r CROSS JOIN tot WHERE rank <= {_VOCAB_K}
"""


@q("vocab_top_terms", _VOCAB_ORACLE)
def _vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training vocabulary stage: top-k corpus terms with
    cumulative coverage share (text.vocab_coverage)."""
    docs = _tp(spark, sf_dir, "documents")
    return T.vocab_coverage(docs, "text", top_k=_VOCAB_K)


# ---------------------------------------------------------------------------
# Cross-document boilerplate line removal
# ---------------------------------------------------------------------------

_FOOTER = "copyright example corp all rights reserved"
_NEWSLETTER = "subscribe to our newsletter for weekly updates"
_MIN_DOCS = 30

_BOILER_SYNTH_SQL = (
    f"text || chr(10) || '{_FOOTER}'"
    f" || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_NEWSLETTER}'"
    " ELSE '' END"
)

_BOILER_ORACLE = f"""
WITH s AS (SELECT doc_id, {_BOILER_SYNTH_SQL} AS t FROM documents),
l AS (SELECT doc_id, string_split(t, chr(10)) AS lines FROM s),
seg AS (SELECT doc_id, unnest(lines) AS line FROM l),
cnt AS (SELECT line, count(DISTINCT doc_id) AS n_docs FROM seg GROUP BY line),
b AS (SELECT coalesce(list(line), []) AS boiler
      FROM cnt WHERE n_docs >= {_MIN_DOCS})
SELECT doc_id,
       len(lines) AS n_lines,
       len(lines) - len(list_filter(lines, x -> NOT list_contains(boiler, x)))
         AS n_boiler,
       round((len(lines) - len(list_filter(lines,
                x -> NOT list_contains(boiler, x)))) / len(lines), 6)
         AS boiler_frac,
       md5(array_to_string(list_filter(lines,
             x -> NOT list_contains(boiler, x)), chr(10))) AS retained_md5
FROM l CROSS JOIN b
"""


def _synth_lines(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\n" + _FOOTER),
            F.when(F.col("doc_id") % 4 == 0, F.lit("\n" + _NEWSLETTER)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


@q("boilerplate_lines", _BOILER_ORACLE)
def _boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal: lines repeated across
    >= min_docs documents are stripped; per-doc retention stats plus an
    md5 of the cleaned text (text.line_boilerplate)."""
    docs = _tp(spark, sf_dir, "documents")
    return T.line_boilerplate(_synth_lines(docs), "text", "doc_id", _MIN_DOCS)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style) over embeddings
# ---------------------------------------------------------------------------

_SEMDEDUP_ORACLE = f"""
WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  {_bucket_sql('embedding')} AS bucket
           FROM embeddings),
p AS (SELECT DISTINCT c.vec_id AS id_b
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE round(list_cosine_similarity(a.v, c.v), 4) >= {_NEAR_DUP_THR})
SELECT e.vec_id, p.id_b IS NULL AS kept
FROM embeddings e LEFT JOIN p ON e.vec_id = p.id_b
"""


@q("semantic_dedup_keep", _SEMDEDUP_ORACLE)
def _semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup keep/drop decision per vector: drop any vector
    with an earlier near-duplicate (similarity.semantic_dedup)."""
    emb = _tp(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, threshold=_NEAR_DUP_THR)


# ---------------------------------------------------------------------------
# Embedding outlier score: distance to own label's centroid
# ---------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
x AS (SELECT vec_id, label,
             unnest(range(1, len(v) + 1)) AS pos,
             unnest(v) AS x
      FROM e),
cen AS (SELECT label, pos, round(avg(x), 9) AS c
        FROM x GROUP BY label, pos),
d AS (SELECT x.vec_id, x.label, sum((x.x - cen.c) * (x.x - cen.c)) AS ss
      FROM x JOIN cen ON x.label = cen.label AND x.pos = cen.pos
      GROUP BY x.vec_id, x.label)
SELECT vec_id, CAST(label AS BIGINT) AS label,
       round(sqrt(ss), 6) AS dist_to_centroid FROM d
"""


@q("embedding_outlier_score", _OUTLIER_ORACLE)
def _embedding_outlier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space curation: per-vector distance to its label
    centroid (similarity.label_centroid_distance)."""
    emb = _tp(spark, sf_dir, "embeddings")
    return S.label_centroid_distance(emb)


# ---------------------------------------------------------------------------
# BPE merge-pair counts (one tokenizer-training merge iteration)
# ---------------------------------------------------------------------------

_BPE_K = 50

_BPE_ORACLE = f"""
WITH n AS (SELECT {_norm_sql('text')} AS norm FROM documents),
w AS (SELECT unnest(string_split(norm, ' ')) AS word FROM n),
p AS (SELECT unnest(list_transform(range(1, length(word)),
                                   i -> substring(word, i, 2))) AS pair
      FROM w WHERE length(word) >= 2),
c AS (SELECT pair, count(*) AS n FROM p GROUP BY pair)
SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair ASC) AS rank
FROM c ORDER BY n DESC, pair ASC LIMIT {_BPE_K}
"""


@q("bpe_merge_pairs", _BPE_ORACLE)
def _bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge iteration, distributed: corpus-wide adjacent
    character-pair frequencies, top-k by count. The shuffle carries
    (pair, partial count) only — map-side combine collapses each input
    partition to its distinct pairs (a few hundred rows) before the
    exchange; the window ranks the top-k slice, never the full pair
    table."""
    from pyspark.sql import Window

    docs = _tp(spark, sf_dir, "documents")
    from ..operators.dedup import normalized_text

    words = docs.select(
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("word")
    ).filter(F.length("word") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    order = [F.desc("n"), F.asc("pair")]
    top = counts.orderBy(*order).limit(_BPE_K)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# OOV rate against the corpus top-V vocabulary
# ---------------------------------------------------------------------------

_OOV_V = 20

_OOV_ORACLE = f"""
WITH n AS (SELECT doc_id, string_split({_norm_sql('text')}, ' ') AS toks
           FROM documents),
t AS (SELECT unnest(toks) AS term FROM n),
c AS (SELECT term, count(*) AS cnt FROM t WHERE term <> '' GROUP BY term),
v AS (SELECT list(term ORDER BY cnt DESC, term ASC) AS vocab
      FROM (SELECT term, cnt FROM c ORDER BY cnt DESC, term ASC
            LIMIT {_OOV_V}))
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_filter(toks, x -> NOT list_contains(vocab, x))) AS n_oov,
       round(len(list_filter(toks, x -> NOT list_contains(vocab, x)))
             / len(toks), 6) AS oov_rate
FROM n CROSS JOIN v
"""


@q("oov_rate", _OOV_ORACLE)
def _oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-V
    vocabulary — the integer-exact stand-in for LM-perplexity quality
    scoring (CCNet-style): a doc full of rare terms scores high.

    Scale shape: vocabulary selection is the only shuffle (map-side
    partial term counts); the top-V set collapses to ONE broadcast
    array row and the per-doc rate is a narrow array filter — per-row
    exact rational arithmetic, no cross-row float accumulation, so the
    value hash is deterministic."""
    from ..operators.dedup import normalized_text

    docs = _tp(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", F.split(normalized_text(F.col("text")), " ").alias("__toks")
    )
    counts = (
        staged.select(F.explode("__toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = (
        counts.orderBy(F.desc("cnt"), F.asc("term"))
        .limit(_OOV_V)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("cnt")).alias("k"), F.col("term")))
                ),
                lambda s: s["term"],
            ).alias("vocab")
        )
    )
    n_oov = F.size(
        F.filter(
            F.col("__toks"),
            lambda x: ~F.array_contains(F.col("vocab"), x),
        )
    )
    return staged.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        F.size("__toks").alias("n_tokens"),
        n_oov.alias("n_oov"),
        F.round(n_oov / F.size("__toks"), 6).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# Markup/control text cleaning (C4's pre-analysis normalization pass)
# ---------------------------------------------------------------------------

# The fixture text is already clean ASCII, so dirt is synthesized
# identically on both sides: every doc gains tag wrappers, every 7th a
# C0 control char, every 3rd a whitespace-heavy markup tail.
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"

_DIRTY_SQL = (
    "'<p>' || text || '</p>'"
    " || CASE WHEN doc_id % 7 = 0 THEN chr(7) || 'x' ELSE '' END"
    " || CASE WHEN doc_id % 3 = 0 THEN '  <br/>  tail   ' ELSE '' END"
)

_CLEAN_ORACLE = f"""
WITH dirty AS (SELECT doc_id, {_DIRTY_SQL} AS t FROM documents),
s1 AS (SELECT doc_id, t,
              len(regexp_extract_all(t, '<[^>]*>')) AS n_html_tags,
              regexp_replace(t, '<[^>]*>', ' ', 'g') AS t1
       FROM dirty),
s2 AS (SELECT doc_id, n_html_tags,
              len(regexp_extract_all(t1, '{_CTRL_RE}')) AS n_ctrl_chars,
              regexp_replace(t1, '{_CTRL_RE}', '', 'g') AS t2
       FROM s1),
s3 AS (SELECT doc_id, n_html_tags, n_ctrl_chars,
              trim(regexp_replace(t2, '\\s+', ' ', 'g')) AS cleaned
       FROM s2)
SELECT doc_id, CAST(n_html_tags AS BIGINT) AS n_html_tags,
       CAST(n_ctrl_chars AS BIGINT) AS n_ctrl_chars,
       CAST(length(cleaned) AS BIGINT) AS clean_len,
       md5(cleaned) AS clean_md5
FROM s3
"""


@q("text_clean", _CLEAN_ORACLE)
def _text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML/control/whitespace cleaning with per-rule removal counts
    and an md5 witness of the cleaned string (text.clean_text)."""
    docs = _tp(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.lit("<p>"),
            F.col("text"),
            F.lit("</p>"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("\x07x")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("  <br/>  tail   ")).otherwise(
                F.lit("")
            ),
        ).alias("t"),
    )
    return T.clean_text(dirty, "t", "doc_id")


# ---------------------------------------------------------------------------
# Per-source winsorization of a quality signal
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH b AS (SELECT source,
                  quantile_cont(n_chars, 0.05) AS plo,
                  quantile_cont(n_chars, 0.95) AS phi
           FROM documents GROUP BY source)
SELECT d.doc_id, d.source, d.n_chars,
       round(b.plo, 4) AS p_lo, round(b.phi, 4) AS p_hi,
       round(least(greatest(CAST(d.n_chars AS DOUBLE), b.plo), b.phi), 4)
         AS clamped,
       (d.n_chars < b.plo OR d.n_chars > b.phi) AS is_outlier
FROM documents d JOIN b USING (source)
"""


@q("winsorize_length", _WINSOR_ORACLE)
def _winsorize_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length winsorization: clamp n_chars to the source's
    exact [p05, p95] and flag outliers (text.length_winsorize; Spark
    percentile() and DuckDB quantile_cont share the same linear
    interpolation)."""
    docs = _tp(spark, sf_dir, "documents")
    return T.length_winsorize(docs, "n_chars", "source", "doc_id")


# ---------------------------------------------------------------------------
# Concat-and-split training-sequence packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256

_PACK_ORACLE = f"""
WITH t AS (SELECT doc_id, source,
                  CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
                    AS n_tok
           FROM documents),
s AS (SELECT *,
             CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS BIGINT) AS start
      FROM t)
SELECT doc_id, source,
       unnest(range(start // {_PACK_BUDGET},
                    (start + n_tok - 1) // {_PACK_BUDGET} + 1)) AS seq_id,
       least(start + n_tok,
             (unnest(range(start // {_PACK_BUDGET},
                           (start + n_tok - 1) // {_PACK_BUDGET} + 1)) + 1)
               * {_PACK_BUDGET})
       - greatest(start,
                  unnest(range(start // {_PACK_BUDGET},
                               (start + n_tok - 1) // {_PACK_BUDGET} + 1))
                    * {_PACK_BUDGET}) AS tokens_in_seq
FROM s
"""


@q("pack_training_sequences", _PACK_ORACLE)
def _pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split packing per source stream: documents
    laid head-to-tail in doc_id order, cut into 256-token sequences,
    one row per (doc, sequence) span (text.pack_spans)."""
    docs = _tp(spark, sf_dir, "documents")
    return T.pack_spans(docs, "text", "doc_id", "source", budget=_PACK_BUDGET)


# ---------------------------------------------------------------------------
# Unigram LM quality score (CCNet-style perplexity-filter proxy)
# ---------------------------------------------------------------------------

# The fold order is pinned on BOTH sides (ascending term) so the float
# sum of logs is the identical operand sequence — see
# text.unigram_logprob's determinism contract.
_LM_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
vocab AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
tot AS (SELECT sum(cnt) AS total_tokens FROM vocab),
c AS (SELECT tf.doc_id, tf.term, tf.tf,
             tf.tf * (ln(vocab.cnt) - ln(tot.total_tokens)) AS contrib
      FROM tf JOIN vocab USING (term) CROSS JOIN tot),
d AS (SELECT doc_id, sum(tf) AS n_tokens,
             list_sum(list(contrib ORDER BY term ASC)) AS s
      FROM c GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(s / n_tokens, 6) AS avg_logprob FROM d
"""


@q("lm_quality_score", _LM_ORACLE)
def _lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return T.unigram_logprob(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Composed curation pipeline e2e (operators/curation.py)
# ---------------------------------------------------------------------------

from .northstar import _STOP_SQL as _STOP_SQL_C  # noqa: E402

# Duplicates are synthesized identically on both sides (every 5th doc
# re-appears under id+100000) so the keep-first election has real work:
# survivors must be the ORIGINAL ids, never the replayed copies.
_CURATE_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0),
t AS (SELECT doc_id, text,
             string_split(lower(text), ' ') AS toks,
             list_distinct(string_split(lower(text), ' ')) AS dtoks
      FROM corpus),
m AS (SELECT doc_id, text, dtoks AS toks, len(toks) AS n_toks,
             len(string_split(text, ' ')) AS n_tokens,
             list_aggregate(list_transform(toks,
               x -> CASE WHEN x IN ({_STOP_SQL_C}) THEN 1 ELSE 0 END),
               'sum') AS n_stop,
             len(regexp_extract_all(text, '[0-9]')) AS n_digits
      FROM t),
f AS (SELECT doc_id, n_tokens,
             {{lang_scores}}
             , round(least(1.0, round(n_stop / n_toks, 4) * 2)
                 * (CASE WHEN length(text) >= 50 THEN 1.0 ELSE 0.5 END)
                 * (1 - round(n_digits / length(text), 4)), 4) AS quality,
             md5({_norm_sql('text')}) AS fingerprint
      FROM m),
g AS (SELECT doc_id, {{lang_case}} AS lang_guess, quality, n_tokens,
             fingerprint
      FROM f)"""

_CURATE_SUFFIX = """,
k AS (SELECT *, row_number() OVER
        (PARTITION BY fingerprint ORDER BY doc_id ASC) AS rn
      FROM g WHERE lang_guess = 'en' AND quality >= 0.05)
SELECT doc_id, lang_guess, quality, n_tokens, fingerprint
FROM k WHERE rn = 1
"""

# Per-stage rejection accounting over the SAME featured frame (CTE g):
# each doc charged to its first failing gate; dedup losers counted
# among gate survivors only.
_FUNNEL_SUFFIX = """,
v AS (SELECT g.*, CASE WHEN lang_guess <> 'en' THEN 1
                       WHEN quality < 0.05 THEN 2 ELSE 0 END AS fail
      FROM g),
p AS (SELECT *, row_number() OVER
        (PARTITION BY fingerprint ORDER BY doc_id ASC) AS rn
      FROM v WHERE fail = 0),
c AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN fail = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lang,
             CAST(sum(CASE WHEN fail = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_qual
      FROM v),
d AS (SELECT CAST(coalesce(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_dup FROM p)
SELECT CAST(1 AS BIGINT) AS stage, 'lang_gate' AS gate,
       n_total AS rows_in, n_total - n_lang AS rows_out,
       n_lang AS rejected,
       CASE WHEN n_total > 0 THEN round(n_lang / n_total, 6)
            ELSE CAST(0.0 AS DOUBLE) END AS reject_pct
FROM c, d
UNION ALL
SELECT 2, 'quality_gate', n_total - n_lang,
       n_total - n_lang - n_qual, n_qual,
       CASE WHEN n_total - n_lang > 0
            THEN round(n_qual / (n_total - n_lang), 6)
            ELSE CAST(0.0 AS DOUBLE) END
FROM c, d
UNION ALL
SELECT 3, 'dedup_keep_first', n_total - n_lang - n_qual,
       n_total - n_lang - n_qual - n_dup, n_dup,
       CASE WHEN n_total - n_lang - n_qual > 0
            THEN round(n_dup / (n_total - n_lang - n_qual), 6)
            ELSE CAST(0.0 AS DOUBLE) END
FROM c, d
"""


def _curate_oracle(suffix: str = _CURATE_SUFFIX) -> str:
    from .northstar import _LANG_CASE, _LANG_SCORES

    return (_CURATE_ORACLE + suffix).format(
        lang_scores=_LANG_SCORES, lang_case=_LANG_CASE
    )


@q("corpus_curation_e2e", _curate_oracle())
def _corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline (operators/curation.py): one narrow
    feature+gate pass, then a single fingerprint-key shuffle for the
    keep-first dedup election — filters run BEFORE the exchange, so
    only gated survivors move."""
    from ..operators.curation import curate_corpus

    docs = _tp(spark, sf_dir, "documents").select("doc_id", "text")
    replay = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return curate_corpus(docs.unionAll(replay), "text", "doc_id")


@q("curation_funnel_report", _curate_oracle(_FUNNEL_SUFFIX))
def _curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage rejection accounting for the curation pipeline
    (curation.curation_funnel): rows in/out, rejected count and
    rejection rate for the language gate, quality gate, and the
    exact-dedup keep-first election — the run report a 100 TB
    curation job publishes next to its output. Same corpus (with the
    20% replay union) as corpus_curation_e2e, so stage 3 provably
    charges exactly the documents e2e drops."""
    from ..operators.curation import curation_funnel

    docs = _tp(spark, sf_dir, "documents").select("doc_id", "text")
    replay = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return curation_funnel(docs.unionAll(replay), "text", "doc_id")


# ---------------------------------------------------------------------------
# Sharded training-data export (sinks/shards.py)
# ---------------------------------------------------------------------------

_SHARD_N = 8

# Replays shard placement AND the order-free content checksum over the
# source table — the Spark side computes its manifest from the files it
# actually wrote (read-back), so a hash match proves disk == source.
_SHARD_ORACLE = f"""
SELECT CAST(CAST(concat('0x', substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT) % {_SHARD_N} AS BIGINT) AS shard,
       count(*) AS n_rows,
       CAST(sum(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8))
           AS BIGINT)) AS BIGINT) AS checksum
FROM documents
GROUP BY 1
"""


@q("shard_export_manifest", _SHARD_ORACLE)
def _shard_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded export: documents land in 8 md5-placed
    shard directories; the returned manifest is computed from the
    files on disk, so the oracle match proves the written shards carry
    exactly the source rows (sinks/shards.py)."""
    import tempfile
    from pathlib import Path

    from ..sinks.shards import export_shards

    docs = _tp(spark, sf_dir, "documents").select("doc_id", "text")
    sf = Path(sf_dir).name or "sf"
    root = Path(tempfile.gettempdir()) / "spark_graft_shards" / sf
    return export_shards(
        spark, docs, root, _SHARD_N, "doc_id", ["text"]
    )


# ---------------------------------------------------------------------------
# Explicit-weights data-mixture plan (sampling.mixture_plan): the
# Pile/Dolma-style recipe spec — per-source token allotments, keep
# fractions and oversampling epochs from one corpus aggregation.
# ---------------------------------------------------------------------------

# srcX is deliberately absent from the corpus: the plan must still
# emit its row (available_tokens=0, keep_fraction=0, epochs=1) so the
# recipe consumer sees the shortfall instead of silently losing it
_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2, "srcX": 0.1}
_MIX_BUDGET = 3000


def _mix_prefix_and_knobs() -> tuple[str, str, str]:
    """The SHARED oracle pieces both mixture queries build on — the
    w/c/j CTE prefix (weights table, token counts, left join) and the
    keep_fraction/epochs expressions over ``j``'s columns. One home
    for the threshold-sensitive arithmetic so mixture_plan_tokens and
    mixture_apply_docs cannot drift apart."""
    total = sum(_MIX_WEIGHTS.values())
    in_list = ", ".join(f"'{s}'" for s in sorted(_MIX_WEIGHTS))
    values = ", ".join(
        f"('{s}', {w / total!r})" for s, w in sorted(_MIX_WEIGHTS.items())
    )
    b = float(_MIX_BUDGET)
    prefix = f"""
WITH w(source, share) AS (VALUES {values}),
c AS (
  SELECT source,
         sum(len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> ''))) AS avail
  FROM documents WHERE source IN ({in_list}) GROUP BY source),
j AS (SELECT w.source, w.share, coalesce(c.avail, 0) AS avail
      FROM w LEFT JOIN c USING (source))"""
    kf = f"""CASE WHEN avail > 0
            THEN round(least(1.0, floor({b!r} * share) / avail), 9)
            ELSE CAST(0.0 AS DOUBLE) END"""
    ep = f"""CASE WHEN avail > 0
            THEN round(greatest(1.0, floor({b!r} * share) / avail), 9)
            ELSE CAST(1.0 AS DOUBLE) END"""
    return prefix, kf, ep


def _mixture_oracle() -> str:
    prefix, kf, ep = _mix_prefix_and_knobs()
    b = float(_MIX_BUDGET)
    return f"""{prefix}
SELECT source,
       CAST(avail AS BIGINT) AS available_tokens,
       round(share, 9) AS target_share,
       CAST(floor({b!r} * share) AS BIGINT) AS allotted_tokens,
       {kf} AS keep_fraction,
       {ep} AS epochs
FROM j
"""


@q("mixture_plan_tokens", _mixture_oracle())
def _mixture_plan_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-weights mixture plan (sampling.mixture_plan): target
    shares {{src0: .5, src1: .3, src2: .2}} over a token budget — per
    source, the allotted tokens and either a keep fraction (long
    source) or an epochs oversampling factor (short source). One
    map-side-combinable corpus aggregation; integer-exact inputs."""
    from ..operators.sampling import mixture_plan

    docs = _tp(spark, sf_dir, "documents")
    return mixture_plan(
        docs, "text", "source", _MIX_WEIGHTS, token_budget=_MIX_BUDGET
    )


_MIXAPPLY_SEED = "mixapply0"


def _mixture_apply_oracle() -> str:
    """Replay apply_mixture: the SHARED plan arithmetic
    (_mix_prefix_and_knobs — same strings as the mixture_plan oracle),
    then the per-doc md5 keep threshold, epochs replication and
    generate_series fan-out."""
    prefix, kf, ep = _mix_prefix_and_knobs()
    thr = (
        "CASE WHEN {p} >= 1.0 THEN 'gggggggg' "
        "ELSE lpad(lower(hex(CAST(floor(round({p}, 9) * 4294967296.0) "
        "AS BIGINT))), 8, '0') END"
    )
    return f"""{prefix},
plan AS (
  SELECT source,
         {kf} AS keep_fraction,
         {ep} AS epochs
  FROM j),
k AS (
  SELECT d.doc_id, d.source,
         substring(md5('{_MIXAPPLY_SEED}:' || CAST(d.doc_id AS VARCHAR)),
                   1, 8) < {thr.format(p='p.keep_fraction')} AS kept,
         CAST(floor(p.epochs) AS BIGINT) AS whole,
         substring(md5('{_MIXAPPLY_SEED}r:' || CAST(d.doc_id AS VARCHAR)),
                   1, 8) <
           {thr.format(p='(p.epochs - floor(p.epochs))')} AS extra
  FROM documents d JOIN plan p ON d.source = p.source),
n AS (
  SELECT doc_id, source,
         CASE WHEN kept
              THEN whole + CASE WHEN extra THEN 1 ELSE 0 END
              ELSE 0 END AS n_rep
  FROM k)
SELECT doc_id, source,
       CAST(unnest(generate_series(1, n_rep)) AS BIGINT) AS copy
FROM n
"""


@q("mixture_apply_docs", _mixture_apply_oracle())
def _mixture_apply_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized mixture (sampling.apply_mixture): the plan's
    keep_fraction/epochs realized per document — deterministic md5
    keep decision, floor(epochs) whole copies plus a hash-gated
    fractional copy, one output row per copy. Narrow broadcast join +
    explode; every decision replays bit-identically on the oracle."""
    from ..operators.sampling import apply_mixture

    docs = _tp(spark, sf_dir, "documents")
    return apply_mixture(
        docs,
        "doc_id",
        "text",
        "source",
        _MIX_WEIGHTS,
        token_budget=_MIX_BUDGET,
        seed=_MIXAPPLY_SEED,
    )


# ---------------------------------------------------------------------------
# ES significant_terms aggregation (text.significant_terms): terms
# overrepresented in a foreground doc set vs the corpus, JLH-scored —
# "what is unusual about the documents matching this query" (ES), or
# domain-discriminative vocabulary (training-data analysis).
# ---------------------------------------------------------------------------

_SIG_LANG = "de"
_SIG_K = 15
_SIG_MIN_DC = 2

_SIG_ORACLE = f"""
WITH n AS (SELECT doc_id, lang, {_norm_sql('text')} AS norm FROM documents),
ex AS (SELECT DISTINCT doc_id, lang = '{_SIG_LANG}' AS fg,
              unnest(string_split(norm, ' ')) AS term
       FROM n),
pt AS (SELECT term,
              sum(CASE WHEN fg THEN 1 ELSE 0 END) AS fg_count,
              count(*) AS bg_count
       FROM ex WHERE term <> '' GROUP BY term),
tot AS (SELECT sum(CASE WHEN lang = '{_SIG_LANG}' THEN 1 ELSE 0 END) AS fgd,
               count(*) AS bgd
        FROM documents),
sc AS (SELECT term, fg_count, bg_count,
              round(((fg_count / CAST(fgd AS DOUBLE))
                     - (bg_count / CAST(bgd AS DOUBLE)))
                    * ((fg_count / CAST(fgd AS DOUBLE))
                       / (bg_count / CAST(bgd AS DOUBLE))), 6) AS score
       FROM pt CROSS JOIN tot WHERE fg_count >= {_SIG_MIN_DC}),
r AS (SELECT *, row_number() OVER (ORDER BY score DESC, term ASC) AS rank
      FROM sc WHERE score > 0)
SELECT term, CAST(fg_count AS BIGINT) AS fg_count,
       CAST(bg_count AS BIGINT) AS bg_count, score, rank
FROM r WHERE rank <= {_SIG_K}
"""


@q("significant_terms_lang", _SIG_ORACLE)
def _significant_terms_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_terms (text.significant_terms): vocabulary
    overrepresented in the '{_SIG_LANG}'-language documents vs the
    whole corpus, ranked by the JLH score over per-set document
    frequencies — one distinct-doc explode + a vocabulary-sized
    aggregation; integer counts keep the score hash-exact."""
    from ..operators import text as T

    docs = _tp(spark, sf_dir, "documents")
    return T.significant_terms(
        docs,
        F.col("lang") == _SIG_LANG,
        "text",
        "doc_id",
        k=_SIG_K,
        min_doc_count=_SIG_MIN_DC,
    )


# ---------------------------------------------------------------------------
# Bigram LM quality score with stupid backoff (text.bigram_logprob):
# the order-2 upgrade of lm_quality_score, fit on a held-out train
# slice so scored documents genuinely exercise the backoff path. The
# oracle replays the exact model counts, the CASE order and the
# ascending-position float fold.
# ---------------------------------------------------------------------------

_BG_HELD_OUT = ("src18", "src19")
_BG_BACKOFF = 0.4


def _bigram_lm_oracle() -> str:
    held = ", ".join(f"'{s}'" for s in _BG_HELD_OUT)
    return f"""
WITH n AS (SELECT doc_id, source, {_norm_sql('text')} AS norm FROM documents),
t AS (SELECT doc_id, source,
             list_filter(string_split(norm, ' '), x -> x <> '') AS f
      FROM n),
tr AS (SELECT * FROM t WHERE source NOT IN ({held})),
uni AS (SELECT u AS tkn, count(*) AS uc
        FROM (SELECT unnest(f) AS u FROM tr) GROUP BY 1),
sc AS (SELECT sum(uc) AS u_total, count(*) AS v_size FROM uni),
bp AS (SELECT f[j.i] AS a, f[j.i + 1] AS b, count(*) AS bc
       FROM tr, LATERAL (SELECT unnest(range(1, len(f))) AS i) j
       GROUP BY 1, 2),
b2 AS (SELECT bp.a, bp.b, bp.bc, uni.uc AS ua
       FROM bp JOIN uni ON uni.tkn = bp.a),
pos AS (SELECT doc_id, j.i - 1 AS pos,
               CASE WHEN j.i >= 2 THEN f[j.i - 1] END AS prev,
               f[j.i] AS cur
        FROM t, LATERAL (SELECT unnest(range(1, len(f) + 1)) AS i) j),
c AS (SELECT p.doc_id, p.pos,
             CASE WHEN p.pos = 0
                  THEN ln(coalesce(u.uc, 0) + 1.0)
                       - ln(s.u_total + s.v_size)
                  WHEN b2.bc IS NOT NULL
                  THEN ln(CAST(b2.bc AS DOUBLE)) - ln(CAST(b2.ua AS DOUBLE))
                  ELSE ln({_BG_BACKOFF}) + ln(coalesce(u.uc, 0) + 1.0)
                       - ln(s.u_total + s.v_size) END AS contrib
      FROM pos p
      LEFT JOIN b2 ON b2.a = p.prev AND b2.b = p.cur
      LEFT JOIN uni u ON u.tkn = p.cur
      CROSS JOIN sc s),
d AS (SELECT doc_id, count(*) AS n_tokens,
             list_sum(list(contrib ORDER BY pos ASC)) AS ssum
      FROM c GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(ssum / n_tokens, 6) AS avg_logprob
FROM d
"""


@q("bigram_lm_quality", _bigram_lm_oracle())
def _bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram stupid-backoff LM quality score (text.bigram_logprob):
    model fit on all sources except {src18,src19}, every document
    scored — held-out docs hit unseen bigrams and take the backoff
    path. Integer model counts, pinned CASE order, ascending-position
    float fold: scores hash-match the SQL replay."""
    from ..operators import text as T

    docs = _tp(spark, sf_dir, "documents")
    train = docs.filter(~F.col("source").isin(*_BG_HELD_OUT))
    return T.bigram_logprob(
        docs, train, "text", "doc_id", backoff=_BG_BACKOFF
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (operators/importance.py): hashed
# n-gram features, smoothed target/raw bucket distributions, per-doc
# importance log-weight — the data-selection scorer. The oracle replays
# the identical hashing, smoothing and ascending-bucket float fold.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 1024
_DSIR_TARGET = ("src0", "src1")


def _dsir_oracle() -> str:
    tgt = ", ".join(f"'{s}'" for s in _DSIR_TARGET)
    bucket = (
        "CAST(('0x' || substr(md5('g:' || gram), 1, 7))::BIGINT"
        f" % {_DSIR_BUCKETS} AS INTEGER)"
    )
    return f"""
WITH n AS (SELECT doc_id, source, {_norm_sql('text')} AS norm FROM documents),
t AS (SELECT doc_id, source,
             list_filter(string_split(norm, ' '), x -> x <> '') AS f
      FROM n),
g AS (
  SELECT doc_id, source,
         unnest(list_concat(
           f,
           CASE WHEN len(f) >= 2
                THEN list_transform(range(1, len(f)),
                                    i -> f[i] || '_' || f[i + 1])
                ELSE [] END)) AS gram
  FROM t),
feats AS (
  SELECT doc_id, source, {bucket} AS bucket, count(*) AS cnt
  FROM g GROUP BY 1, 2, 3),
raw_b AS (SELECT bucket, sum(cnt) AS rc FROM feats GROUP BY bucket),
tgt_b AS (SELECT bucket, sum(cnt) AS tc FROM feats
          WHERE source IN ({tgt}) GROUP BY bucket),
tot AS (SELECT (SELECT sum(rc) FROM raw_b) AS rt,
               (SELECT sum(tc) FROM tgt_b) AS tt),
dist AS (
  SELECT coalesce(r.bucket, s.bucket) AS bucket,
         ln(coalesce(s.tc, 0) + 1.0) - ln(tot.tt + {_DSIR_BUCKETS}.0)
         - ln(coalesce(r.rc, 0) + 1.0) + ln(tot.rt + {_DSIR_BUCKETS}.0)
           AS lr
  FROM raw_b r FULL JOIN tgt_b s ON r.bucket = s.bucket CROSS JOIN tot),
c AS (SELECT f.doc_id, f.cnt, f.bucket, f.cnt * d.lr AS contrib
      FROM feats f JOIN dist d USING (bucket)),
w AS (SELECT doc_id, sum(cnt) AS n_grams,
             round(list_sum(list(contrib ORDER BY bucket ASC)), 6) AS lw
      FROM c GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(w.n_grams, 0) AS BIGINT) AS n_grams,
       coalesce(w.lw, 0.0) AS log_weight
FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
"""


@q("dsir_importance_weights", _dsir_oracle())
def _dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance log-weights (operators/importance.py):
    hashed unigram+bigram features, Laplace-smoothed target vs raw
    bucket distributions (target = sources {src0,src1}), per-doc
    sum of log-ratios — the cheap distribution-matching scorer for
    training-data selection; feed into weighted_hash_sample for the
    resampling step. Value-checked: hashing, smoothing and the
    ascending-bucket float fold replay exactly in SQL.

    The target is a row predicate over the same corpus, so it goes in
    as ``target_pred`` (opt r9, guide §2.3): the corpus is tokenized
    ONCE and both distributions come out of one 1024-row aggregate —
    no second featurization pass over the target subset."""
    from ..operators.importance import dsir_log_weights

    docs = _tp(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs,
        None,
        "text",
        "doc_id",
        n_buckets=_DSIR_BUCKETS,
        target_pred=F.col("source").isin(*_DSIR_TARGET),
    )


_BPE_N_MERGES = 6


def _bpe_train_oracle() -> str:
    """The whole BPE training loop unrolled as SQL: each of the
    {_BPE_N_MERGES} iterations is a (pair-count, argmax, rewrite) CTE
    triple over the wrapped-symbol word table. Symbols render as
    ``|sym|`` so the rewrite is the same whole-symbol-boundary
    ``replace()`` proven by bpe_encode_corpus; pair extraction splits
    the wrapped string back into the symbol list. All counts are exact
    integers and the argmax tiebreak (count DESC, left ASC, right ASC)
    is replayed verbatim, so training is hash-checkable. Early stop
    (top count < 2) maps to the ``n >= 2`` filter on each argmax: an
    empty top empties every later CTE, producing exactly the merges
    the operator learned."""
    wrapped = (
        "array_to_string(list_transform(range(1, length(word) + 1), "
        "i -> '|' || substring(word, i, 1) || '|'), '')"
    )
    ctes = [
        f"""nw AS (SELECT {_norm_sql('text')} AS norm FROM documents),
w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq, {wrapped} AS s
  FROM (SELECT unnest(string_split(norm, ' ')) AS word FROM nw)
  WHERE word <> '' GROUP BY word)"""
    ]
    tops = []
    for i in range(1, _BPE_N_MERGES + 1):
        prev = f"w{i - 1}"
        ctes.append(
            f"""p{i} AS (
  SELECT syms[j.x] AS l, syms[j.x + 1] AS r, sum(freq) AS n
  FROM (SELECT freq, regexp_extract_all(s, '\\|([^|]+)\\|', 1) AS syms
        FROM {prev}) t,
       LATERAL (SELECT unnest(range(1, len(syms))) AS x) j
  GROUP BY 1, 2),
t{i} AS (SELECT l, r, n FROM p{i} WHERE n >= 2
         ORDER BY n DESC, l ASC, r ASC LIMIT 1),
w{i} AS MATERIALIZED (
  SELECT word, freq,
         replace(s, '|' || l || '||' || r || '|', '|' || l || r || '|') AS s
  FROM {prev} CROSS JOIN t{i})"""
        )
        tops.append(
            f'SELECT CAST({i} AS BIGINT) AS "rank", l AS "left", r AS "right",'
            f" CAST(n AS BIGINT) AS pair_count FROM t{i}"
        )
    joined = ",\n".join(ctes)
    union = "\nUNION ALL ".join(tops)
    return (
        f"WITH {joined}\n"
        f'SELECT * FROM ({union}) ORDER BY "rank"'
    )


@q("bpe_train_merges", _bpe_train_oracle())
def _bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full distributed BPE tokenizer training (operators/bpe.py): 6
    merge iterations over the vocabulary-sized word-frequency table —
    pair counts weighted by word freq, deterministic argmax, exact
    greedy merge application per round. Value-checked end to end: the
    oracle unrolls the whole training loop (pair-count -> argmax ->
    wrapped-symbol replace rewrite per iteration), so the learned merge
    SEQUENCE is hash-checked, on top of the token-for-token pure-Python
    reference in tests/test_bpe.py."""
    from ..operators.bpe import bpe_train

    docs = _tp(spark, sf_dir, "documents")
    return bpe_train(spark, docs, "text", n_merges=_BPE_N_MERGES).orderBy("rank")


def _split_oracle() -> str:
    from ..operators.sampling import hex_threshold

    t_train = hex_threshold(0.8)
    t_val = hex_threshold(0.9)
    return f"""
    SELECT doc_id, source,
           CASE WHEN substring(md5('split:' || source), 1, 8) < '{t_train}'
                THEN 'train'
                WHEN substring(md5('split:' || source), 1, 8) < '{t_val}'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """


@q("leakage_safe_split", _split_oracle())
def _leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (sampling.group_split): the
    split variate hashes the GROUP key (source here; a domain or dedup
    cluster id in production), so correlated documents can never
    straddle train and eval — the contamination a row-level split
    invites. Narrow, deterministic, SQL-replayable."""
    from ..operators.sampling import group_split

    docs = _tp(spark, sf_dir, "documents").select("doc_id", "source")
    return group_split(
        docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1}
    )


# ---------------------------------------------------------------------------
# BPE ENCODE (the tokenize side of bpe_train) under the value oracle.
# Greedy left-to-right non-overlapping pair merging is replayed in SQL
# with the wrapped-symbol replace trick: each symbol is rendered as
# |sym|, so replace('|l||r|' -> '|lr|') can only fire on whole-symbol
# boundaries (the delimiter never appears inside the a-z0-9 alphabet),
# and string replace's left-to-right non-overlapping scan IS the
# greedy fold's semantics (the merged symbol is not rescanned within
# the same pass) — exactly apply_merge's contract.
# ---------------------------------------------------------------------------

# fixed merge list (the corpus's own top-8, incl. a multi-char right
# side 'm'+'er' that exercises whole-symbol boundary safety)
_ENC_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
]


def _enc_replace_chain() -> str:
    s = ("array_to_string(list_transform(range(1, length(word) + 1), "
         "i -> '|' || substring(word, i, 1) || '|'), '')")
    for left, right in _ENC_MERGES:
        s = f"replace({s}, '|{left}||{right}|', '|{left}{right}|')"
    return s


_ENCODE_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
w AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM n),
enc AS (
  SELECT doc_id, word, {_enc_replace_chain()} AS s
  FROM w WHERE word <> '')
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum((length(s) - length(replace(s, '|', ''))) // 2) AS BIGINT)
         AS n_tokens,
       CAST(sum(length(word)) AS BIGINT) AS n_chars
FROM enc GROUP BY doc_id
"""


@q("bpe_encode_corpus", _ENCODE_ORACLE)
def _bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide BPE tokenization with a fixed 8-merge table
    (operators/bpe.bpe_encode): the fold runs once per DISTINCT word
    (vocabulary-sized), documents join the encoded vocabulary by
    broadcast — per-doc post-merge token counts, value-checked against
    the SQL replay of the greedy merge semantics."""
    from ..operators.bpe import bpe_encode

    docs = _tp(spark, sf_dir, "documents")
    return bpe_encode(docs, "text", "doc_id", _ENC_MERGES)


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling-hash boundaries)
# ---------------------------------------------------------------------------

_CDC_W = 4

_CDC_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split({_norm_sql('text')}, ' ') AS toks
           FROM documents),
tok AS (SELECT doc_id, toks, unnest(toks) AS tok,
               generate_subscripts(toks, 1) - 1 AS p
        FROM t),
b AS (SELECT doc_id, p, tok,
             CASE WHEN p >= {_CDC_W - 1}
                  AND substr(md5(array_to_string(
                        toks[p - {_CDC_W - 2} : p + 1], ' ')), 32, 1) = '0'
                  THEN 1 ELSE 0 END AS bnd
      FROM tok),
c AS (SELECT doc_id, p, tok,
             coalesce(sum(bnd) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk_id
      FROM b)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_chunk_tokens,
       md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5
FROM c GROUP BY doc_id, chunk_id
"""


@q("cdc_chunk_documents", _CDC_ORACLE)
def _cdc_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (text.cdc_chunk_tokens): boundaries
    where the rolling 4-token window hash ends in hex '0', so an edit
    re-chunks only its neighborhood — the dedup-stable storage/chunk
    layer (rsync/LBFS recipe on tokens). Spark computes boundaries
    IN-ROW (shuffle-free, one md5 per token position); the oracle
    replays the same boundaries relationally with a running-sum window
    assigning chunk ids."""
    docs = _tp(spark, sf_dir, "documents")
    return T.cdc_chunk_tokens(docs, "text", "doc_id", w=_CDC_W)


# ---------------------------------------------------------------------------
# Tokenizer fertility by language: BPE tokens per word — the
# cross-lingual tokenizer-budget metric (a high-fertility language
# pays more sequence length per word, which skews mixture budgeting).
# ---------------------------------------------------------------------------

_FERT_ORACLE = f"""
WITH enc AS ({_ENCODE_ORACLE}),
j AS (SELECT d.lang, enc.n_words, enc.n_tokens, enc.n_chars
      FROM enc JOIN documents d USING (doc_id))
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(sum(n_tokens) / CAST(sum(n_words) AS DOUBLE), 4) AS fertility,
       round(sum(n_chars) / CAST(sum(n_tokens) AS DOUBLE), 4)
         AS chars_per_token
FROM j GROUP BY lang
"""


@q("bpe_fertility_by_lang", _FERT_ORACLE)
def _bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (BPE tokens / word) and
    compression (chars / token) under the fixed 8-merge table — the
    metric that exposes a tokenizer's cross-lingual cost skew. The
    encode runs once per DISTINCT word (bpe_encode's vocabulary-level
    fold); per-doc counts then join the slim (doc_id, lang) projection
    and collapse to one row per language — integer sums, two float
    quotients at the very end."""
    from ..operators.bpe import bpe_encode

    docs = _tp(spark, sf_dir, "documents")
    enc = bpe_encode(docs, "text", "doc_id", _ENC_MERGES)
    j = enc.join(docs.select("doc_id", "lang"), "doc_id")
    return j.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.sum("n_tokens") / F.sum("n_words").cast("double"), 4
        ).alias("fertility"),
        F.round(
            F.sum("n_chars") / F.sum("n_tokens").cast("double"), 4
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Character-entropy quality signal
# ---------------------------------------------------------------------------

_ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "
_ENTROPY_MIN = 3.0


def _entropy_sql() -> str:
    # counts via the length-difference trick, folded in FIXED alphabet
    # order so the float sum is identical in both engines
    terms = []
    for ch in _ENTROPY_ALPHABET:
        lit = "' '" if ch == " " else f"'{ch}'"
        cnt = f"(length(norm) - length(replace(norm, {lit}, '')))"
        terms.append(f"CASE WHEN {cnt} > 0 THEN {cnt} * log2({cnt}) ELSE 0 END")
    s = " + ".join(terms)
    return (
        f"round(CASE WHEN length(norm) = 0 THEN 0.0 "
        f"ELSE log2(length(norm)) - ({s}) / length(norm) END, 4)"
    )


_ENTROPY_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents)
SELECT doc_id, CAST(length(norm) AS BIGINT) AS n_chars,
       {_entropy_sql()} AS char_entropy,
       {_entropy_sql()} >= {_ENTROPY_MIN} AS entropy_pass
FROM n
"""


@q("char_entropy_quality", _ENTROPY_ORACLE)
def _char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the character distribution over the fixed
    a-z/0-9/space alphabet — the cheap repetitive-garbage detector
    (keyboard mash, repeated runs and template spam score low; natural
    text sits ~3.5-4.3 bits). Narrow per-row expression: 37
    length-difference counts folded in fixed alphabet order, so the
    float sum is order-identical to the SQL oracle; no tokenization,
    no shuffle."""
    from ..operators.dedup import normalized_text

    docs = _tp(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", normalized_text(F.col("text")).alias("__norm")
    )
    L = F.length("__norm")
    acc = F.lit(0.0)
    for ch in _ENTROPY_ALPHABET:
        cnt = L - F.length(F.replace(F.col("__norm"), F.lit(ch), F.lit("")))
        acc = acc + F.when(cnt > 0, cnt * F.log2(cnt)).otherwise(0.0)
    ent = F.round(
        F.when(L == 0, 0.0).otherwise(F.log2(L) - acc / L), 4
    )
    return staged.select(
        "doc_id",
        L.cast("long").alias("n_chars"),
        ent.alias("char_entropy"),
        (ent >= _ENTROPY_MIN).alias("entropy_pass"),
    )


# ---------------------------------------------------------------------------
# Deterministic multi-epoch shuffle: epoch e's training order is the
# sort by md5('ep<e>:<doc_id>') — a reproducible, seekable permutation
# per epoch with no RNG state (the standard hash-shuffle recipe for
# 100 TB corpora: a total sort by hash key per epoch, resumable from
# any offset). The declared query materializes each epoch's first 8
# positions through the shuffle-light topk operator, so only
# partitions' local heads reach the exchange — the full permutation is
# never collected.
# ---------------------------------------------------------------------------

_EPOCH_ORACLE = """
WITH k AS (
  SELECT e.epoch, d.doc_id,
         md5('ep' || CAST(e.epoch AS VARCHAR) || ':'
             || CAST(d.doc_id AS VARCHAR)) AS shuffle_key
  FROM documents d
  CROSS JOIN (SELECT CAST(unnest([0, 1, 2]) AS BIGINT) AS epoch) e
),
r AS (
  SELECT epoch, doc_id, shuffle_key,
         row_number() OVER (PARTITION BY epoch
                            ORDER BY shuffle_key, doc_id) AS rank
  FROM k
)
SELECT epoch, rank, doc_id, shuffle_key
FROM r WHERE rank <= 8
ORDER BY epoch, rank
"""


@q("epoch_shuffle_heads", _EPOCH_ORACLE)
def epoch_shuffle_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 documents of each epoch's deterministic hash-shuffle
    order (3 epochs). Per-epoch heads come from the map-side-pruned
    topk operator — no epoch's full ordering ever sorts globally."""
    from ..operators.topk import topk_per_key

    docs = _tp(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("epoch")
    ).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("shuffle_key"),
    )
    heads = topk_per_key(
        keyed,
        key_col="epoch",
        order_col="shuffle_key",
        k=8,
        tiebreak_col="doc_id",
        ascending=True,
    )
    return heads.select("epoch", "rank", "doc_id", "shuffle_key").orderBy(
        "epoch", "rank"
    )


# ---------------------------------------------------------------------------
# Round-6: overlapping (RAG-style) chunking with provenance offsets
# ---------------------------------------------------------------------------

_OV_CHUNK, _OV_STRIDE = 24, 16

_OVERLAP_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split({_norm_sql('text')}, ' ') AS toks
  FROM documents),
e AS (
  SELECT doc_id, toks,
         unnest(range(0, 1 + CAST(ceil(greatest(len(toks) - {_OV_CHUNK},
                                                0) / {_OV_STRIDE}.0)
                              AS BIGINT))) AS chunk_id
  FROM t)
SELECT doc_id, chunk_id,
       CAST(chunk_id * {_OV_STRIDE} AS BIGINT) AS start_token,
       array_to_string(list_slice(toks, chunk_id * {_OV_STRIDE} + 1,
                                  chunk_id * {_OV_STRIDE} + {_OV_CHUNK}),
                       ' ') AS chunk_text,
       CAST(len(list_slice(toks, chunk_id * {_OV_STRIDE} + 1,
                           chunk_id * {_OV_STRIDE} + {_OV_CHUNK}))
            AS BIGINT) AS n_chunk_tokens
FROM e
"""


@q("chunk_documents_overlap", _OVERLAP_CHUNK_ORACLE)
def _chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style OVERLAPPING chunking (text.chunk_tokens_overlap):
    windows of {chunk} tokens every {stride} (8-token overlap keeps
    context across boundaries), each carrying its 0-based
    ``start_token`` offset for span provenance back into the source
    document; the last window is the first to reach the document end.

    Scale shape: tokenize once, slice per window index, one
    posexplode — rows stay on their input partition, shuffle-free at
    100 TB like the non-overlapping trainer split."""
    docs = _tp(spark, sf_dir, "documents")
    return T.chunk_tokens_overlap(
        docs, "text", "doc_id", chunk_size=_OV_CHUNK, stride=_OV_STRIDE
    )
