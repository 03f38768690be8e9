"""North-star declared queries: dedup, similarity search, text
analysis, multimodal plumbing, full-pipeline e2e (BASELINE.json).

Oracle construction notes:
- all hashes are md5-based so DuckDB reproduces them exactly;
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all default;
- embeddings are cast to DOUBLE[] on both sides before any arithmetic
  (DuckDB's list_cosine_similarity on FLOAT[] computes in float32 and
  would diverge);
- DuckDB lists are 1-indexed; Spark element_at is also 1-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import similarity as S
from ..operators import text as T
from .declared import QUERY_REGISTRY, _GROK, _t, q


def _tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table and spread it across the cluster before heavy
    per-row compute. The driver's documents/embeddings parquet is one
    tiny row group -> one input partition; without this, every md5 /
    shingle / cosine below runs on a single core. At real scale inputs
    arrive pre-partitioned and this hash repartition is a no-op choice;
    keying on the stable id keeps the layout deterministic."""
    df = _t(spark, sf_dir, name)
    key = "doc_id" if "doc_id" in df.columns else df.columns[0]
    return df.repartition(spark.sparkContext.defaultParallelism, key)

# --- shared SQL fragments --------------------------------------------------

# normalized_text() in SQL (dedup.normalized_text)
_NORM = (
    "trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)


def _norm_sql(col: str) -> str:
    return _NORM.format(col=col)


def _shingle_sql(norm: str, n: int = 3) -> str:
    """Distinct word-3-gram shingles of a normalized text expression —
    mirrors dedup.word_shingles (concat_ws on both sides so short docs
    agree)."""
    toks = f"string_split({norm}, ' ')"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n}, 0) + 2), "
        f"i -> concat_ws(' ', "
        + ", ".join(f"list_extract({toks}, i + {j})" for j in range(n))
        + ")))"
    )


def _minhash_sql(shingles: str, seed: int) -> str:
    # the SAME block-prefix/slice scheme as dedup's hash factories —
    # the prefix string comes from the shared definition so Spark and
    # oracle cannot drift
    from ..operators.dedup import _mh_block_prefix

    slot = seed % 4
    prefix = _mh_block_prefix(seed // 4)
    return (
        f"list_aggregate(list_transform({shingles}, "
        f"x -> substring(md5('{prefix}' || x), {slot * 8 + 1}, 8)), 'min')"
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@q(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS representative_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id")


@q(
    "dedup_fingerprint",
    f"SELECT doc_id, md5({_norm_sql('text')}) AS fingerprint FROM documents",
)
def _dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return T.fingerprint(docs, "text", "doc_id")


_MH_N = 4


@q(
    "minhash_signatures",
    "SELECT doc_id, "
    + ", ".join(
        f"{_minhash_sql(_shingle_sql(_norm_sql('text')), i)} AS mh{i}"
        for i in range(_MH_N)
    )
    + " FROM documents",
)
def _minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return D.minhash_signatures(docs, "text", "doc_id", n_hashes=_MH_N)


@q(
    "minhash_lsh_candidates",
    f"""
    WITH sig AS (
      SELECT doc_id,
             {_minhash_sql(_shingle_sql(_norm_sql('text')), 0)} AS mh0,
             {_minhash_sql(_shingle_sql(_norm_sql('text')), 1)} AS mh1,
             {_minhash_sql(_shingle_sql(_norm_sql('text')), 2)} AS mh2,
             {_minhash_sql(_shingle_sql(_norm_sql('text')), 3)} AS mh3
      FROM documents),
    banded AS (
      SELECT doc_id, 0 AS band_id, mh0 || '|' || mh1 AS band_key FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band_id, mh2 || '|' || mh3 AS band_key FROM sig)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """,
)
def _minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, "text", "doc_id", n_hashes=_MH_N)
    return D.lsh_candidate_pairs(sig, "doc_id", n_hashes=_MH_N, band_size=2)


@q(
    "ngram_jaccard_adjacent",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(string_split({_norm_sql('text')}, ' ')) AS toks
      FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN len(list_distinct(list_concat(a.toks, b.toks))) = 0
                      THEN 0.0
                      ELSE len(list_intersect(a.toks, b.toks))
                           / len(list_distinct(list_concat(a.toks, b.toks)))
                 END, 4) AS jaccard
    FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    """,
)
def _ngram_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    t = docs.select("doc_id", D.tokens(F.col("text")).alias("toks"))
    a = t.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = t.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            D.jaccard(F.col("toks_a"), F.col("toks_b")).alias("jaccard"),
        )
    )


_SIMHASH_BITS = 16


def _simhash_bit_sql(hashes: str, b: int) -> str:
    # hex char b of the staged per-token md5 — mirrors
    # dedup.simhash_bits' one-md5-serves-all-bits scheme
    return (
        f"CASE WHEN list_aggregate(list_transform({hashes}, "
        f"x -> CASE WHEN substr(x, {b + 1}, 1) < '8' "
        f"THEN 1 ELSE -1 END), 'sum') >= 0 THEN '1' ELSE '0' END"
    )


@q(
    "simhash_docs",
    "WITH t AS (SELECT doc_id, "
    f"list_distinct(string_split({_norm_sql('text')}, ' ')) AS toks "
    "FROM documents), "
    "h AS (SELECT doc_id, list_transform(toks, t -> md5(t)) AS th FROM t) "
    "SELECT doc_id, "
    + " || ".join(_simhash_bit_sql("th", b) for b in range(_SIMHASH_BITS))
    + " AS simhash FROM h",
)
def _simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    t = docs.select("doc_id", D.tokens(F.col("text")).alias("__toks"))
    t = t.select("doc_id", D.token_hashes(F.col("__toks")).alias("__th"))
    return t.select(
        "doc_id", D.simhash_bits(F.col("__th"), _SIMHASH_BITS).alias("simhash")
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_N_QUERIES = 8
_TOPK = 5


@q(
    "embedding_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
    sims AS (
      SELECT query_id, vec_id,
             round(list_cosine_similarity(qv, cv), 4) AS sim
      FROM q JOIN c ON query_id <> vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id ASC) AS rank
      FROM sims)
    SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {_TOPK}
    """,
)
def _embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk(emb, queries, k=_TOPK)


def _bucket_sql(col: str = "embedding") -> str:
    return " || ".join(
        f"CASE WHEN {col}[{i + 1}] > {col}[{j + 1}] THEN '1' ELSE '0' END"
        for i, j in S.LSH_PAIRS
    )


@q(
    "embedding_lsh_buckets",
    f"SELECT vec_id, {_bucket_sql()} AS bucket FROM embeddings",
)
def _embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _tp(spark, sf_dir, "embeddings")
    return S.lsh_buckets(emb)


@q(
    "embedding_lsh_topk",
    f"""
    WITH b AS (SELECT vec_id, {_bucket_sql()} AS bucket FROM embeddings),
    q AS (SELECT e.vec_id AS query_id, e.embedding::DOUBLE[] AS qv, b.bucket
          FROM embeddings e JOIN b ON e.vec_id = b.vec_id
          WHERE e.vec_id < {_N_QUERIES}),
    c AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS cv, b.bucket
          FROM embeddings e JOIN b ON e.vec_id = b.vec_id),
    sims AS (
      SELECT query_id, c.vec_id,
             round(list_cosine_similarity(qv, cv), 4) AS sim
      FROM q JOIN c ON q.bucket = c.bucket AND query_id <> c.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id ASC) AS rank
      FROM sims)
    SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {_TOPK}
    """,
)
def _embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.lsh_topk(emb, queries, k=_TOPK)


_IVF_NCENT = 8
_IVF_NPROBE = 2


@q(
    "embedding_ivf_topk",
    f"""
    WITH cen AS (SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cv
                 FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + _IVF_NCENT}),
    asgn AS (
      SELECT vec_id, cell_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY round(list_cosine_similarity(v, cv), 4) DESC,
                                         cell_id ASC) AS cell_rank
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      CROSS JOIN cen),
    c_cells AS (SELECT vec_id, cell_id FROM asgn WHERE cell_rank = 1),
    q_cells AS (SELECT vec_id AS query_id, cell_id FROM asgn
                WHERE cell_rank <= {_IVF_NPROBE} AND vec_id < {_N_QUERIES}),
    cand AS (
      SELECT q.query_id, c.vec_id
      FROM c_cells c JOIN q_cells q ON c.cell_id = q.cell_id
      WHERE q.query_id <> c.vec_id),
    sims AS (
      SELECT cand.query_id, cand.vec_id,
             round(list_cosine_similarity(qe.embedding::DOUBLE[],
                                          ce.embedding::DOUBLE[]), 4) AS sim
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id ASC) AS rank
      FROM sims)
    SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {_TOPK}
    """,
)
def _embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: fixed centroid snapshot (vec_ids 100..107 stand in
    for a trained codebook), nprobe=2 cell probing, per-cell candidate
    join — the cost divides by #cells at scale."""
    emb = _tp(spark, sf_dir, "embeddings")
    centroids = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + _IVF_NCENT)
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.ivf_topk(emb, queries, centroids, k=_TOPK, nprobe=_IVF_NPROBE)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@q(
    "text_token_stats",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars,
           round(length(replace(text, ' ', ''))
                 / len(string_split(text, ' ')), 4) AS avg_token_len
    FROM documents
    """,
)
def _text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return T.token_stats(docs, "text", "doc_id")


_STOP_SQL = ", ".join(f"'{s}'" for s in T.STOPWORDS)


@q(
    "text_quality",
    f"""
    WITH t AS (
      SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents),
    m AS (
      SELECT doc_id, text, len(toks) AS n_toks,
             list_aggregate(list_transform(toks,
               x -> CASE WHEN x IN ({_STOP_SQL}) THEN 1 ELSE 0 END), 'sum') AS n_stop,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS punct_count,
             len(regexp_extract_all(text, '[0-9]')) AS n_digits
      FROM t)
    SELECT doc_id,
           round(n_stop / n_toks, 4) AS stopword_ratio,
           punct_count,
           round(n_digits / length(text), 4) AS digit_ratio,
           round(least(1.0, round(n_stop / n_toks, 4) * 2)
                 * (CASE WHEN length(text) >= 50 THEN 1.0 ELSE 0.5 END)
                 * (1 - round(n_digits / length(text), 4)), 4) AS quality
    FROM m
    """,
)
def _text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return T.quality_score(docs, "text", "doc_id")


def _lang_scores_sql() -> tuple[str, str]:
    score_cols = []
    for lang, markers in T.LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(f"len(list_intersect(toks, [{arr}])) AS s_{lang}")
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in T.LANG_MARKERS) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in T.LANG_MARKERS:
        case += f"WHEN s_{lang} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return ", ".join(score_cols), case


_LANG_SCORES, _LANG_CASE = _lang_scores_sql()


@q(
    "text_lang_id",
    f"""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
      FROM documents),
    s AS (SELECT doc_id, {_LANG_SCORES} FROM t)
    SELECT doc_id, {_LANG_CASE} AS lang_guess FROM s
    """,
)
def _text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return T.lang_id(docs, "text", "doc_id")


@q(
    "text_bpe_token_count",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{T.BPE_ISH_RE}')) AS n_bpe_tokens
    FROM documents
    """,
)
def _text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return T.bpe_ish_token_count(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Grok multimap (G6) + opt-out flag (F6) parity extras
# ---------------------------------------------------------------------------

_GROK.add_pattern("TRIWORD", r"^%{WORD:w} %{WORD:w} %{WORD:w}")
_TRIWORD_RX = _GROK.compile("TRIWORD").regex.replace("'", "''")


@q(
    "grok_multimap_words",
    f"""
    SELECT doc_id,
           array_to_string([struct_extract(r, 'w1'), struct_extract(r, 'w2'),
                            struct_extract(r, 'w3')], '|') AS w_values
    FROM (SELECT doc_id,
                 regexp_extract(text, '{_TRIWORD_RX}', ['w1','w2','w3']) AS r
          FROM documents
          WHERE regexp_matches(text, '{_TRIWORD_RX}'))
    """,
)
def _grok_multimap_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6 (ParseToMultiMap, grok.go:264-283): duplicate capture names
    accumulate into an array instead of last-wins. Surfaced as a
    '|'-joined string: the correctness driver's canonicalizer sorts on
    every output column and cannot order array cells."""
    from ..grok.spark import grok_match, grok_multimap

    docs = _tp(spark, sf_dir, "documents")
    matched = docs.filter(grok_match(_GROK, F.col("text"), "TRIWORD"))
    return grok_multimap(_GROK, matched, "text", "TRIWORD").select(
        "doc_id", F.concat_ws("|", "w_values").alias("w_values")
    )


@q(
    "optout_flag_json",
    """
    SELECT event_id,
           coalesce(json_extract_string(props, '$.k'), '') = '20' AS opted_out
    FROM events
    """,
)
def _optout_flag_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 (IgnoredApp, caching_lazyfill.go:21-23): a flag computed from
    a JSON env blob by key lookup — here over events.props, the same
    environment_json["F2S_DISABLE_LOGGING"]=="true" shape."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (
            F.coalesce(F.get_json_object("props", "$.k"), F.lit("")) == "20"
        ).alias("opted_out"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing + full-pipeline e2e (rows-only: not SQL-expressible)
# ---------------------------------------------------------------------------


@q(
    "multimodal_features",
    """
    WITH b AS (
      SELECT doc_id, length(text) AS n_bytes,
             list_transform(range(1, length(text) + 1),
                            i -> ord(substring(text, i, 1)) % 4) AS buckets
      FROM documents)
    SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           array_to_string(list_transform(range(0, 4), k ->
             printf('%.6f', round_even(len(list_filter(buckets, x -> x = k))
                                       / CAST(n_bytes AS DOUBLE), 6))), ',')
             AS media_features
    FROM b
    """,
)
def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + Arrow-batched feature extraction via
    mapInPandas (decode stubbed deterministically — no media libs in
    this container). The deterministic byte-bucket stub makes the
    features SQL-replayable (documents are ASCII, so DuckDB character
    ords == payload bytes), upgrading this from rows-only to the full
    value-hash oracle. Features surface as one '%.6f'-formatted string:
    stable cross-engine formatting, and the correctness driver's
    canonicalizer cannot sort array cells."""
    from ..operators import multimodal as M

    docs = _tp(spark, sf_dir, "documents")
    with_media = M.attach_binary(docs.select("doc_id", "text"), "text")
    feats = M.extract_features(with_media)
    return feats.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.concat_ws(
            ",",
            F.transform(
                "media_features", lambda x: F.format_string("%.6f", x)
            ),
        ).alias("media_features"),
    )


# Every stage below is the REAL Arrow plumbing (attach -> resize ->
# extract_features -> sample_frames, all mapInPandas); the deterministic
# decode stubs make the outputs SQL-expressible, so unlike
# multimodal_features (rows-only) this query gets the full value-hash
# oracle. 6x6 resize < min fixture text length (44) => pure truncation,
# no NUL padding to express in SQL.
_MM_W, _MM_H, _MM_FRAMES = 6, 6, 4
_MM_BYTES = _MM_W * _MM_H  # 36
_MM_STEP = _MM_BYTES // _MM_FRAMES  # 9

_MM_META_ORACLE = f"""
WITH p AS (SELECT doc_id, length(text) AS n_bytes_orig,
                  substring(text, 1, {_MM_BYTES}) AS p
           FROM documents),
b AS (SELECT doc_id, n_bytes_orig, p,
             list_transform(range(1, {_MM_BYTES} + 1),
                            i -> ord(substring(p, i, 1)) % 4) AS buckets
      FROM p)
SELECT doc_id, n_bytes_orig,
       CAST({_MM_W} AS BIGINT) AS width,
       CAST({_MM_H} AS BIGINT) AS height,
       CAST({_MM_BYTES} AS BIGINT) AS n_bytes,
       round(len(list_filter(buckets, x -> x = 0)) / {_MM_BYTES}.0, 6) AS f0,
       round(len(list_filter(buckets, x -> x = 1)) / {_MM_BYTES}.0, 6) AS f1,
       round(len(list_filter(buckets, x -> x = 2)) / {_MM_BYTES}.0, 6) AS f2,
       round(len(list_filter(buckets, x -> x = 3)) / {_MM_BYTES}.0, 6) AS f3,
       md5(substring(p, 1, {_MM_STEP})) AS frame0_md5,
       CAST({_MM_FRAMES} AS BIGINT) AS n_frames
FROM b
"""


@q("multimodal_meta_pipeline", _MM_META_ORACLE)
def _multimodal_meta_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal stage chain under the value oracle: binary
    attach -> deterministic resize (truncate to 6x6 bytes) -> Arrow
    feature extraction (byte-bucket histogram) -> frame sampling; the
    scalar outputs (meta, features, frame fingerprint) are replayed in
    SQL over the same bytes."""
    from ..operators import multimodal as M

    docs = _tp(spark, sf_dir, "documents")
    staged = M.attach_binary(docs.select("doc_id", "text"), "text")
    staged = staged.withColumn(
        "n_bytes_orig", F.col("media_meta.n_bytes")
    )
    staged = M.resize_media(staged, _MM_W, _MM_H)
    staged = M.extract_features(staged)
    staged = M.sample_frames(staged, _MM_FRAMES)
    return staged.select(
        "doc_id",
        "n_bytes_orig",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        *[
            F.element_at("media_features", i + 1).alias(f"f{i}")
            for i in range(4)
        ],
        F.md5(F.element_at("frames", 1)).alias("frame0_md5"),
        F.size("frames").alias("n_frames"),
    )


# -- pipeline_e2e oracle ----------------------------------------------------
# Replays the WHOLE parity pipeline in DuckDB: envelope synthesis from
# events (sources/envelopes.py), F1/F2 route ladder + F3 identifiability
# (the kept arm set {2,3,5,6,7} — independently re-derived from the
# FIXTURES.md A1 row mix, so a routing bug on either side mismatches),
# grok parsing via the SAME compiled patterns (duckdb_exprs), the cf
# snowflake dim rebuilt from range() (sources/envelopes.py
# synthesize_cf_dimensions), the enrichment left join with
# known/unknown-origin semantics, computed columns, and the md5 doc id.


def _grok_sql(pattern: str, name: str) -> str:
    """The bare DuckDB expression (no alias) for one grok capture of
    ``message``, from the same compiled pattern Spark executes."""
    from ..grok import duckdb_exprs

    for e in duckdb_exprs(_GROK, "message", pattern):
        expr, _, alias = e.rpartition(" AS ")
        if alias == name:
            return expr
    raise KeyError(f"{pattern}.{name}")


def _guid_sql(n: str) -> str:
    return f"'00000000-0000-4000-8000-' || lpad(CAST({n} AS VARCHAR), 12, '0')"


_ROUTER_LINE_FMT = (
    'host-%d.example.com - [2024-01-01T00:00:00+0000] \\"GET /p/%d HTTP/1.1\\" '
    '%d 10 200 \\"-\\" \\"UA\\" \\"10.0.0.1:1234\\" \\"10.0.1.2:61001\\" '
    'x_forwarded_for:\\"1.2.3.4\\" x_forwarded_proto:\\"https\\" '
    'vcap_request_id:\\"req-%d\\" response_time:0.012 app_id:\\"%s\\" '
    'app_index:\\"0\\" x_b3_traceid:\\"t\\" x_b3_spanid:\\"s\\" '
    'x_b3_parentspanid:\\"-\\"'
).replace('\\"', '"')


def _pipeline_oracle(
    kept_arms: str = "(2, 3, 5, 6, 7)",
    tail: str = """,
           CASE WHEN p.origin IN ('env1', 'env2')
                THEN coalesce(d.app_name, '') END AS "@cf.app",
           CASE WHEN p.origin IN ('env1', 'env2')
                THEN coalesce(d.org_name, '') END AS "@cf.org",
           p.log_event, p.rtr_status""",
) -> str:
    """The pipeline replay. ``kept_arms`` is the post-F1/F2/F3 arm set
    ({2,3,5,6,7} with disabled routes resurrected; {5,6,7} with the
    reference's enabled-only config, where arms 2/3 drop at the route
    ladder and 8 at F3). ``tail`` is the projection after the computed
    columns, for consumers exposing different columns off the same
    document set."""
    guid = _guid_sql("(event_id // 10) % 50")
    return f"""
    WITH syn AS (
      SELECT event_id, ts, user_id,
             event_id % 10 AS arm,
             {guid} AS guid,
             CASE WHEN user_id % 7 = 0 THEN 'envX'
                  WHEN user_id % 3 = 0 THEN 'env2' ELSE 'env1' END AS origin,
             CASE WHEN event_id % 10 = 2 THEN printf(
                    '{_ROUTER_LINE_FMT}',
                    user_id, event_id, (event_id % 5) * 100 + 200, event_id,
                    {guid})
                  ELSE printf('evt=%s value=%s props=%s', event_type,
                              round(value, 2)::VARCHAR, props)
             END AS message
      FROM events),
    routed AS (
      SELECT *,
             CASE arm WHEN 2 THEN 'gorouter_access'
                      WHEN 3 THEN 'bosh_director'
                      ELSE 'gorouter' END AS index_class,
             CASE WHEN arm = 2 THEN 'ROUTERACCESS'
                  ELSE 'GENERIC' END AS grok_pattern,
             CASE WHEN arm IN (3, 5, 7) THEN guid
                  WHEN arm = 6 THEN upper(guid)
                  ELSE '' END AS env_app_id
      FROM syn WHERE arm IN {kept_arms}),
    parsed AS (
      SELECT *,
             CASE WHEN grok_pattern = 'GENERIC'
                  THEN {_grok_sql("GENERIC", "log_event")} END AS log_event,
             CASE WHEN grok_pattern = 'ROUTERACCESS'
                  THEN {_grok_sql("ROUTERACCESS", "rtr_status")}
             END AS rtr_status,
             CASE WHEN env_app_id <> '' THEN env_app_id
                  WHEN grok_pattern = 'ROUTERACCESS' THEN
                    coalesce({_grok_sql("ROUTERACCESS", "rtr_app_id")}, '')
                  ELSE '' END AS app_guid
      FROM routed),
    envs AS (SELECT unnest(['env1', 'env2']) AS env),
    apps AS (
      SELECT env, n, lower({_guid_sql("n")}) AS guid_lc,
             'app-' || env || '-' || CAST(n AS VARCHAR) AS app_name,
             CASE WHEN n % 10 <> 9 THEN {_guid_sql("(n % 8) + 100")}
                  ELSE {_guid_sql("999")} END AS space_guid
      FROM envs, range(40) t(n)),
    spaces AS (
      SELECT env AS s_env, lower({_guid_sql("s + 100")}) AS s_guid_lc,
             'space-' || env || '-' || CAST(s AS VARCHAR) AS space_name,
             CASE WHEN s % 5 <> 4 THEN {_guid_sql("(s % 4) + 200")}
                  ELSE {_guid_sql("998")} END AS org_guid
      FROM envs, range(8) t(s)),
    orgs AS (
      SELECT env AS o_env, lower({_guid_sql("o + 200")}) AS o_guid_lc,
             'org-' || env || '-' || CAST(o AS VARCHAR) AS org_name
      FROM envs, range(4) t(o)),
    dim AS (
      SELECT a.env, a.guid_lc, a.app_name, o.org_name
      FROM apps a
      LEFT JOIN spaces s
        ON a.env = s.s_env AND lower(a.space_guid) = s.s_guid_lc
      LEFT JOIN orgs o
        ON a.env = o.o_env AND lower(s.org_guid) = o.o_guid_lc)
    SELECT md5('shard-' || CAST(p.event_id % 4 AS VARCHAR) || '|'
               || CAST(p.event_id AS VARCHAR)) AS doc_id,
           p.index_class || '-' || strftime(p.ts, '%Y-%m-%d') AS es_index,
           p.index_class,
           strftime(p.ts, '%Y-%m-%d') AS event_date,
           epoch_ms(p.ts) AS "timestamp"{tail}
    FROM parsed p
    LEFT JOIN dim d
      ON p.origin = d.env AND lower(p.app_guid) = d.guid_lc
    """


@q("pipeline_e2e", _pipeline_oracle())
def _pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parity pipeline (SURVEY §3.1) over synthesized envelopes —
    covers decode, F1/F2/F3, grok G1-G5, J1-J4, computed columns, P1,
    now under the full value-hash oracle (_pipeline_oracle replays
    synthesis, routing, grok, enrichment and computed columns in SQL).
    Streaming equivalence is asserted in tests/test_streaming.py."""
    from ..operators.enrichment import flatten_dimensions
    from ..pipeline import PipelineConfig, run_pipeline
    from ..sources.envelopes import (
        ALLOWED_ORIGINS,
        synthesize_cf_dimensions,
        synthesize_envelopes,
    )

    # The driver's events.parquet is one row group -> one partition; a
    # real Kinesis source delivers one partition per shard. Spread the
    # raw rows pre-synthesis so the grok/enrich hot path uses every core.
    # localCheckpoint cuts the synthesized records' lineage at the source
    # boundary: a real deployment's source is storage/Kinesis (already
    # materialized), whereas leaving the synthesis in the plan lets
    # Catalyst re-inline its expression tree into every downstream filter
    # and projection (measured 2x on the full pipeline at sf0.1).
    # eager=False folds the materialization into the consuming job's
    # first pass instead of paying a separate serial job up front
    # (measured 6.9s -> 2.0s cold, 1.7s -> 1.4s warm).
    records = synthesize_envelopes(
        spark, sf_dir, partitions=spark.sparkContext.defaultParallelism
    ).localCheckpoint(eager=False)
    dim = flatten_dimensions(*synthesize_cf_dimensions(spark))
    cfg = PipelineConfig(allowed_origins=ALLOWED_ORIGINS, enable_disabled_routes=True)
    docs = run_pipeline(records, dim, cfg)
    return docs.select(
        "doc_id",
        "es_index",
        "index_class",
        "event_date",
        "timestamp",
        "`@cf.app`",
        "`@cf.org`",
        F.col("parsed_generic.log_event").alias("log_event"),
        F.col("parsed_routeraccess.rtr_status").alias("rtr_status"),
    )


# ---------------------------------------------------------------------------
# Training-data hygiene: decontamination, data mixing, repetition filters
# ---------------------------------------------------------------------------

# every ~97th document stands in for the "benchmark/eval" corpus
_BENCH_MOD = 97

_MIX_FRACTIONS = {"en": 0.3, "de": 0.7}
_MIX_SEED = "mix0"


@q(
    "decontaminate_benchmark",
    f"""
    WITH docg AS (
      SELECT doc_id, {_shingle_sql(_norm_sql('text'))} AS sh FROM documents),
    bench AS (
      SELECT list_distinct(flatten(list(sh))) AS grams
      FROM docg WHERE doc_id % {_BENCH_MOD} = 0)
    SELECT doc_id,
           len(list_intersect(sh, grams)) AS n_overlap,
           len(list_intersect(sh, grams)) > 0 AS contaminated
    FROM docg, bench
    """,
)
def _decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: word-3-gram overlap of every training
    document against the (broadcast) gram set of an eval corpus."""
    docs = _tp(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
    return D.ngram_contamination(docs, bench, "text", "doc_id")


@q(
    "stratified_sample_mix",
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE substr(md5('{_MIX_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) <
          CASE lang
               WHEN 'de' THEN '{SM.hex_threshold(_MIX_FRACTIONS["de"])}'
               WHEN 'en' THEN '{SM.hex_threshold(_MIX_FRACTIONS["en"])}'
               ELSE '{SM.hex_threshold(1.0)}' END
    """,
)
def _stratified_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling (data mixing): keep
    30% of 'en', 70% of 'de', all of everything else — a pure narrow
    filter, reproducible run-to-run and engine-to-engine."""
    docs = _t(spark, sf_dir, "documents")
    return SM.stratified_hash_sample(
        docs, "doc_id", "lang", _MIX_FRACTIONS, seed=_MIX_SEED
    ).select("doc_id", "lang", "source")


@q(
    "text_repetition_signals",
    f"""
    WITH t AS (
      SELECT doc_id, text AS raw,
             string_split({_norm_sql('text')}, ' ') AS toks
      FROM documents),
    b AS (
      SELECT doc_id, raw, toks,
             list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
               i -> concat_ws(' ', list_extract(toks, i),
                              list_extract(toks, i + 1))) AS bi
      FROM t),
    m AS (
      SELECT doc_id,
             round(1 - len(list_distinct(toks)) / len(toks), 4)
               AS dup_token_frac,
             round(list_max(list_transform(list_distinct(bi),
                     g -> len(list_filter(bi, x -> x = g)))) / len(bi), 4)
               AS top_bigram_frac,
             round(len(regexp_extract_all(raw, '[^a-zA-Z0-9\\s]'))
                   / len(toks), 4) AS symbol_ratio
      FROM b)
    SELECT doc_id, dup_token_frac, top_bigram_frac, symbol_ratio,
           (dup_token_frac <= 0.6 AND top_bigram_frac <= 0.18
            AND symbol_ratio <= 0.5) AS repetition_pass
    FROM m
    """,
)
def _text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-token
    fraction, top-bigram share, symbol-per-token ratio, composite
    pass flag."""
    docs = _tp(spark, sf_dir, "documents")
    return T.repetition_signals(docs, "text", "doc_id")


_DUPN = 5

@q(
    "dup_ngram_char_frac",
    f"""
    WITH t AS (
      SELECT doc_id, string_split({_norm_sql('text')}, ' ') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= {_DUPN}
                  THEN list_transform(
                         generate_series(1, len(toks) - {_DUPN - 1}),
                         s -> array_to_string(toks[s : s + {_DUPN - 1}],
                                              ' '))
                  ELSE [] END AS grams
      FROM t),
    f AS (
      SELECT doc_id, toks,
             list_transform(grams,
               x -> len(list_filter(grams, h -> h = x)) >= 2) AS dup
      FROM g),
    c AS (
      SELECT doc_id, toks,
             CASE WHEN len(dup) >= 1
                  THEN list_transform(generate_series(1, len(toks)),
                         p -> len(list_filter(
                                generate_series(greatest(1, p - {_DUPN - 1}),
                                                least(p, len(dup))),
                                s -> dup[s])) > 0)
                  ELSE list_transform(toks, t -> false) END AS covered
      FROM f),
    s AS (
      SELECT doc_id,
             CAST(coalesce(list_sum(list_transform(
                    generate_series(1, len(toks)),
                    p -> CASE WHEN covered[p] THEN length(toks[p])
                              ELSE 0 END)), 0) AS BIGINT) AS cov_chars,
             CAST(coalesce(list_sum(list_transform(toks,
                    t -> length(t))), 0) AS BIGINT) AS tot_chars
      FROM c)
    SELECT doc_id, cov_chars, tot_chars,
           CASE WHEN tot_chars > 0
                THEN round(cov_chars / tot_chars, 4)
                ELSE CAST(0.0 AS DOUBLE) END AS dup_ngram_char_frac
    FROM s
    """,
)
def _dup_ngram_char_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb/Gopher duplicated-5-gram character fraction: the share
    of each document's characters inside a word 5-gram that occurs
    at least twice in the document (text.dup_ngram_coverage) — the
    long-verbatim-repeat signal the token/bigram ratios miss."""
    docs = _tp(spark, sf_dir, "documents")
    return T.dup_ngram_coverage(docs, "text", "doc_id", n=_DUPN)


_CHUNK = 64


@q(
    "chunk_documents",
    f"""
    WITH t AS (
      SELECT doc_id, string_split({_norm_sql('text')}, ' ') AS toks
      FROM documents),
    e AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest((len(toks) + {_CHUNK} - 1) // {_CHUNK},
                                      1))) AS chunk_id
      FROM t)
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(toks, chunk_id * {_CHUNK} + 1,
                                      chunk_id * {_CHUNK} + {_CHUNK}), ' ')
             AS chunk_text,
           len(list_slice(toks, chunk_id * {_CHUNK} + 1,
                          chunk_id * {_CHUNK} + {_CHUNK})) AS n_chunk_tokens
    FROM e
    """,
)
def _chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window training-sequence chunking: each document
    becomes ceil(n_tokens/64) ordered chunks, shuffle-free."""
    docs = _tp(spark, sf_dir, "documents")
    return T.chunk_tokens(docs, "text", "doc_id", chunk_size=_CHUNK)


@q(
    "dataset_summary",
    """
    SELECT source, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 4) AS avg_chars,
           count(DISTINCT md5(text)) AS n_unique
    FROM documents GROUP BY source, lang
    """,
)
def _dataset_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report per (source, lang): doc counts, size
    totals, exact-unique counts — the audit table behind mixing/dedup
    decisions. One map-side-combinable shuffle on a tiny key space."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_unique"),
    )


# ---------------------------------------------------------------------------
# Embedding near-dup + rolling-hash fingerprint (training-data dedup)
# ---------------------------------------------------------------------------

_NEAR_DUP_THR = 0.25  # driver embeddings are near-orthogonal (max pairwise
# cosine ~0.51); production near-dup thresholds sit at 0.9+ — the operator
# is threshold-agnostic, this value just keeps the fixture result non-empty


@q(
    "dedup_embedding_near",
    f"""
    WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_bucket_sql('embedding')} AS bucket
               FROM embeddings)
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           round(list_cosine_similarity(a.v, c.v), 4) AS sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE round(list_cosine_similarity(a.v, c.v), 4) >= {_NEAR_DUP_THR}
    """,
)
def _dedup_embedding_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-bit LSH bucket
    self-join (similarity.near_dup_pairs): the O(N^2) all-pairs cosine
    collapses to per-bucket joins; only (id, vector) ever shuffles."""
    emb = _tp(spark, sf_dir, "embeddings")
    return S.near_dup_pairs(emb, threshold=_NEAR_DUP_THR)


_ROLL_K = 8


@q(
    "text_rolling_fingerprint",
    f"""
    WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents)
    SELECT doc_id,
           list_aggregate(list_transform(
             range(1, greatest(length(norm) - {_ROLL_K - 1}, 1) + 1),
             i -> md5(substr(norm, i, {_ROLL_K}))), 'min') AS rolling_fp
    FROM n
    """,
)
def _text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash (winnowing-style) content fingerprint: min hash over
    all character 8-grams of the normalized text (text.rolling_fingerprint)."""
    docs = _tp(spark, sf_dir, "documents")
    return T.rolling_fingerprint(docs, "text", "doc_id", k=_ROLL_K)


_FRAME_DEDUP_ORACLE = f"""
WITH p AS (SELECT doc_id, substring(text, 1, {_MM_BYTES}) AS payload
           FROM documents),
f AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
             md5(substring(payload, i * {_MM_STEP} + 1, {_MM_STEP}))
               AS frame_md5
      FROM p, unnest([0, 1, 2, 3]) AS t(i))
SELECT frame_md5,
       min(doc_id * {_MM_FRAMES} + frame_idx) // {_MM_FRAMES} AS rep_doc_id,
       min(doc_id * {_MM_FRAMES} + frame_idx) % {_MM_FRAMES} AS rep_frame,
       count(*) AS n_copies
FROM f GROUP BY frame_md5
"""


@q("multimodal_frame_dedup", _FRAME_DEDUP_ORACLE)
def _multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level exact dedup across media payloads: the multimodal
    chain (attach -> resize -> sample_frames, real mapInPandas
    plumbing) composed with hash dedup — the cross-video duplicate
    frame detection a video training pipeline runs. Keep-first via an
    arg-min on the packed (doc, frame) key; the shuffle moves (16-byte
    hash, long) pairs, never frame bytes."""
    from ..operators import multimodal as M

    docs = _tp(spark, sf_dir, "documents")
    staged = M.attach_binary(docs.select("doc_id", "text"), "text")
    staged = M.resize_media(staged, _MM_W, _MM_H)
    staged = M.sample_frames(staged, _MM_FRAMES)
    frames = staged.select(
        "doc_id", F.posexplode("frames").alias("frame_idx", "frame")
    ).select(
        "doc_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        (F.col("doc_id") * _MM_FRAMES + F.col("frame_idx")).alias("__k"),
    )
    return frames.groupBy("frame_md5").agg(
        F.floor(F.min("__k") / _MM_FRAMES).alias("rep_doc_id"),
        (F.min("__k") % _MM_FRAMES).alias("rep_frame"),
        F.count("*").alias("n_copies"),
    )


_SCENE_ORACLE = f"""
WITH p AS (SELECT doc_id, substring(text, 1, {_MM_BYTES}) AS payload
           FROM documents),
f AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
             substring(payload, i * {_MM_STEP} + 1, {_MM_STEP}) AS frame
      FROM p, unnest([0, 1, 2, 3]) AS t(i)),
feat AS (SELECT doc_id, frame_idx,
                list_transform(range(0, 4), k ->
                  CASE WHEN length(frame) = 0 THEN 0.0
                       ELSE round_even(len(list_filter(
                              list_transform(range(1, length(frame) + 1),
                                             i -> ord(substring(frame, i, 1)) % 4),
                              x -> x = k)) / CAST(length(frame) AS DOUBLE), 6)
                  END) AS v
         FROM f),
d AS (SELECT doc_id, frame_idx, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pv
      FROM feat)
SELECT doc_id, frame_idx,
       CASE WHEN pv IS NULL THEN NULL
            ELSE round(list_sum(list_transform(range(1, 5),
                                               i -> abs(v[i] - pv[i]))), 6)
       END AS dist_prev,
       coalesce(round(list_sum(list_transform(range(1, 5),
                                              i -> abs(v[i] - pv[i]))), 6)
                > 0.25, FALSE) AS is_scene_change
FROM d
"""


@q("multimodal_scene_changes", _SCENE_ORACLE)
def _multimodal_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over the multimodal chain (attach ->
    resize -> sample_frames -> per-frame features -> consecutive-frame
    L1 distance, operators/multimodal.detect_scene_changes): the
    temporal-analysis stage of a video curation pipeline. Deterministic
    stubs keep every stage SQL-replayable, so boundaries are
    value-checked, not just counted."""
    from ..operators import multimodal as M

    docs = _tp(spark, sf_dir, "documents")
    staged = M.attach_binary(docs.select("doc_id", "text"), "text")
    staged = M.resize_media(staged, _MM_W, _MM_H)
    staged = M.sample_frames(staged, _MM_FRAMES)
    return M.detect_scene_changes(staged, id_col="doc_id", threshold=0.25)


_AUDIO_ORACLE = f"""
WITH p AS (SELECT doc_id, substring(text, 1, {_MM_BYTES}) AS payload
           FROM documents),
w AS (SELECT doc_id, i AS window_idx,
             substring(payload, i * {_MM_STEP} + 1, {_MM_STEP}) AS chunk
      FROM p, unnest([0, 1, 2, 3]) AS t(i)),
e AS (SELECT doc_id, window_idx,
             CASE WHEN length(chunk) = 0 THEN 0.0
                  ELSE round_even(list_sum(list_transform(
                         range(1, length(chunk) + 1),
                         i -> ord(substring(chunk, i, 1))))
                       / (255.0 * length(chunk)), 6)
             END > 0.5 AS active
      FROM w),
b AS (SELECT doc_id, window_idx, active,
             CASE WHEN lag(active) OVER
                         (PARTITION BY doc_id ORDER BY window_idx)
                       IS DISTINCT FROM active THEN 1 ELSE 0 END AS is_b
      FROM e),
n AS (SELECT doc_id, window_idx, active,
             CAST(sum(is_b) OVER (PARTITION BY doc_id ORDER BY window_idx
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS segment_no
      FROM b)
SELECT doc_id, segment_no, active,
       count(*) AS n_windows,
       CAST(min(window_idx) AS BIGINT) AS from_window,
       CAST(max(window_idx) AS BIGINT) AS to_window
FROM n GROUP BY doc_id, segment_no, active
"""


@q("multimodal_audio_segments", _AUDIO_ORACLE)
def _multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity segmentation (multimodal.audio_energy_segments):
    fixed byte windows scored with a deterministic energy stub, merged
    into contiguous active/silent segments by the boundary-running-count
    trick — the VAD-shaped stage of an audio curation pipeline, with
    every stage SQL-replayable."""
    from ..operators import multimodal as M

    docs = _tp(spark, sf_dir, "documents")
    staged = M.attach_binary(docs.select("doc_id", "text"), "text")
    staged = M.resize_media(staged, _MM_W, _MM_H)
    return M.audio_energy_segments(
        staged, id_col="doc_id", window_bytes=_MM_STEP, threshold=0.5
    )


# ---------------------------------------------------------------------------
# Directed shingle-containment dedup (dedup.containment_pairs): the
# subset/superset relation symmetric Jaccard misses. Corpus augmented
# (identically on both sides) with 80%-prefix snippets of every 7th
# document — true containment pairs with known direction.
# ---------------------------------------------------------------------------

_CONT_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         substring(text, 1, CAST(floor(0.8 * length(text)) AS INT)) AS text
  FROM documents WHERE doc_id % 7 = 0
"""

_CONT_ORACLE = f"""
WITH corpus AS ({_CONT_CORPUS}),
sig AS (
  SELECT doc_id,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 0)} AS mh0,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 1)} AS mh1,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 2)} AS mh2,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 3)} AS mh3
  FROM corpus),
banded AS (
  SELECT doc_id, 0 AS band_id, mh0 || '|' || mh1 AS band_key FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id, mh2 || '|' || mh3 AS band_key FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id),
sh AS (SELECT doc_id, {_shingle_sql(_norm_sql('text'))} AS s FROM corpus),
p AS (
  SELECT c.id_a, c.id_b,
         CASE WHEN len(sa.s) = 0 THEN 0.0
              ELSE len(list_intersect(sa.s, sb.s)) / CAST(len(sa.s) AS DOUBLE)
         END AS raw_ab,
         CASE WHEN len(sb.s) = 0 THEN 0.0
              ELSE len(list_intersect(sb.s, sa.s)) / CAST(len(sb.s) AS DOUBLE)
         END AS raw_ba
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b)
-- threshold/relation decisions on the UNROUNDED ratios; output rounded
SELECT id_a, id_b,
       round(raw_ab, 4) AS containment_ab,
       round(raw_ba, 4) AS containment_ba,
       CASE WHEN raw_ab >= 0.8 AND raw_ba >= 0.8 THEN 'mutual'
            WHEN raw_ab >= 0.8 THEN 'a_in_b'
            ELSE 'b_in_a' END AS relation
FROM p WHERE raw_ab >= 0.8 OR raw_ba >= 0.8
"""


@q("containment_dedup_pairs", _CONT_ORACLE)
def _containment_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset/superset near-dup pairs (dedup.containment_pairs): LSH
    candidates verified by DIRECTED shingle containment — the
    boilerplate-wrapped-copy / page-within-page duplicates whose
    Jaccard is capped at |A|/|B| no matter how perfect the overlap.
    Shingles are built only for candidate-pair docs (semi-join
    pruning); the documented recall caveat (banding keys on Jaccard)
    is exactly replayed by the oracle."""
    from ..operators.dedup import containment_pairs

    docs = _tp(spark, sf_dir, "documents").select("doc_id", "text")
    snippets = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.substring(
            F.col("text"),
            F.lit(1),
            F.floor(0.8 * F.length("text")).cast("int"),
        ).alias("text"),
    )
    corpus = docs.unionByName(snippets)
    return containment_pairs(
        corpus, "text", "doc_id", threshold=0.8, n_hashes=4, band_size=2
    )


# ---------------------------------------------------------------------------
# Within-document language segmentation (text.language_segments):
# mixed-language docs synthesized by concatenating neighbouring docs'
# texts (langs usually differ), split into monolingual window runs.
# ---------------------------------------------------------------------------

_SEG_W = 10

_SEG_ORACLE = f"""
WITH mixed AS (
  SELECT a.doc_id, a.text || ' ' || b.text AS text
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
t AS (SELECT doc_id, string_split(lower(text), ' ') AS all_toks FROM mixed),
w AS (
  SELECT doc_id, CAST(g.i AS INT) AS win_no,
         list_slice(all_toks, g.i * {_SEG_W} + 1,
                    g.i * {_SEG_W} + {_SEG_W}) AS toks
  FROM t, LATERAL (
    SELECT unnest(range(0, greatest(
      CAST(ceil(len(all_toks) / {_SEG_W}.0) AS BIGINT), 1))) AS i) g),
s AS (SELECT doc_id, win_no, {_LANG_SCORES} FROM w),
l AS (SELECT doc_id, win_no, {_LANG_CASE} AS lang FROM s),
flagged AS (
  SELECT *, CASE WHEN lag(lang) OVER win IS NULL
                      OR lag(lang) OVER win <> lang
                 THEN 1 ELSE 0 END AS chg
  FROM l WINDOW win AS (PARTITION BY doc_id ORDER BY win_no)),
runs AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY doc_id ORDER BY win_no
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_no
  FROM flagged)
SELECT doc_id, seg_no, min(lang) AS lang,
       CAST(min(win_no) AS BIGINT) AS from_win,
       CAST(max(win_no) AS BIGINT) AS to_win,
       count(*) AS n_windows
FROM runs GROUP BY doc_id, seg_no
"""


@q("language_segments_mixed", _SEG_ORACLE)
def _language_segments_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language document segmentation: fixed 10-token windows
    scored with the marker langid, consecutive same-language windows
    collapsed to monolingual spans (text.language_segments) — the
    per-document refinement of corpus lang_id that keeps the minority
    language's text instead of majority-voting it away. One doc-keyed
    exchange shared by the lag, the run numbering and the collapse."""
    docs = _tp(spark, sf_dir, "documents").select("doc_id", "text")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("__t2")
    )
    mixed = docs.join(nxt, "doc_id").select(
        "doc_id", F.concat_ws(" ", "text", "__t2").alias("text")
    )
    return T.language_segments(mixed, "text", "doc_id", window_tokens=_SEG_W)


# ---------------------------------------------------------------------------
# Accent folding (text.fold_accents): unicode-robust normalization.
# Accented variants are synthesized identically on both sides (vowels
# of odd docs swapped for accented forms); folding must restore the
# original text EXACTLY — witnessed by md5 equality — and the accent
# count is replayed via delete-translate.
# ---------------------------------------------------------------------------

_ACC_FROM, _ACC_TO = "aeiou", "áéíóú"

_ACCENT_ORACLE = f"""
WITH synth AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 1
              THEN translate(text, '{_ACC_FROM}', '{_ACC_TO}')
              ELSE text END AS accented,
         text AS original
  FROM documents)
SELECT doc_id,
       CAST(length(accented)
            - length(translate(accented, '{_ACC_TO}', '')) AS BIGINT)
         AS n_accented,
       md5(translate(accented, '{_ACC_TO}', '{_ACC_FROM}'))
         = md5(original) AS restored_ok
FROM synth
"""


@q("accent_fold_roundtrip", _ACCENT_ORACLE)
def _accent_fold_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accent folding ahead of ASCII normalization (text.fold_accents:
    an EXPLICIT translate table, not locale-dependent stripping —
    normalized_text's [^a-z0-9] strip would DELETE accented letters,
    'café' -> 'caf'). Synthesized accented docs must fold back to
    md5-identical originals; narrow codegen expressions only."""
    docs = _tp(spark, sf_dir, "documents").select("doc_id", "text")
    synth = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 1,
            F.translate("text", _ACC_FROM, _ACC_TO),
        )
        .otherwise(F.col("text"))
        .alias("accented"),
        F.col("text").alias("original"),
    )
    from ..operators.text import fold_accents

    return synth.select(
        "doc_id",
        (
            F.length("accented")
            - F.length(F.translate("accented", _ACC_TO, ""))
        )
        .cast("long")
        .alias("n_accented"),
        (
            F.md5(fold_accents(F.col("accented"))) == F.md5(F.col("original"))
        ).alias("restored_ok"),
    )


# ---------------------------------------------------------------------------
# Cross-source overlap matrix: which pairs of ingest sources share
# near-duplicate content — the corpus-analytics view that decides
# which sources to de-prioritize or dedup against each other before
# training. Candidates come from the SAME banding scheme as
# minhash_lsh_candidates; verification is token Jaccard on candidate
# docs only (semi-join pruning, as fuzzy_dedup_keep).
# ---------------------------------------------------------------------------

_OVL_THRESHOLD = 0.5

_OVERLAP_ORACLE = f"""
WITH sig AS (
  SELECT doc_id,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 0)} AS mh0,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 1)} AS mh1,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 2)} AS mh2,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 3)} AS mh3
  FROM documents),
banded AS (
  SELECT doc_id, 0 AS band_id, mh0 || '|' || mh1 AS band_key FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id, mh2 || '|' || mh3 AS band_key FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id),
t AS (SELECT doc_id,
             list_distinct(string_split({_norm_sql('text')}, ' ')) AS toks
      FROM documents),
v AS (
  SELECT c.id_a, c.id_b,
         round(CASE WHEN len(list_distinct(list_concat(ta.toks, tb.toks))) = 0
                    THEN 0.0
                    ELSE len(list_intersect(ta.toks, tb.toks))
                         / len(list_distinct(list_concat(ta.toks, tb.toks)))
               END, 4) AS j
  FROM cand c JOIN t ta ON ta.doc_id = c.id_a
              JOIN t tb ON tb.doc_id = c.id_b),
s AS (SELECT v.j, da.source AS sa, db.source AS sb
      FROM v JOIN documents da ON da.doc_id = v.id_a
             JOIN documents db ON db.doc_id = v.id_b)
SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(count(*) FILTER (WHERE j >= {_OVL_THRESHOLD}) AS BIGINT)
         AS n_neardup
FROM s GROUP BY 1, 2
"""


@q("source_overlap_matrix", _OVERLAP_ORACLE)
def _source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate overlap between ingest sources: LSH candidate
    pairs (same banding as minhash_lsh_candidates) verified by token
    Jaccard, counted per unordered source pair. Scale shape mirrors
    fuzzy_dedup_keep: signatures map-side, one band-key shuffle,
    token arrays fetched ONLY for candidate docs via a semi join,
    candidates checkpointed once before their three downstream uses
    (verify join x2 + source attachment); sources attach to the slim
    verified pair list, not the corpus."""
    docs = _tp(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, "text", "doc_id", n_hashes=_MH_N)
    cands = D.lsh_candidate_pairs(
        sig, "doc_id", n_hashes=_MH_N, band_size=2
    ).localCheckpoint()
    needed = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionAll(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    toks = (
        docs.join(needed, "doc_id", "left_semi")
        .select("doc_id", D.tokens(F.col("text")).alias("toks"))
        # joined twice (id_a / id_b arm) — materialize the pruned token
        # table once, exactly as fuzzy_dedup does. AQE does NOT reuse
        # the arm exchanges here (different join keys above the same
        # subtree), so without the cut the tokenize + semi-join
        # pipeline executes per arm: a wash at sf0.1 but 2.45x at the
        # 10x scale sweep (20.1 -> 8.2 s median, SCALING_r10 data dir)
        .localCheckpoint()
    )
    v = (
        cands.join(
            toks.select(
                F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a")
            ),
            "id_a",
        )
        .join(
            toks.select(
                F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            D.jaccard(F.col("toks_a"), F.col("toks_b")).alias("j"),
        )
    )
    src = docs.select("doc_id", "source")
    s = (
        v.join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
    )
    return (
        s.groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.count(F.when(F.col("j") >= _OVL_THRESHOLD, 1))
            .cast("long")
            .alias("n_neardup"),
        )
    )


# ---------------------------------------------------------------------------
# Retrieval evaluation as a first-class operator: recall@k of the LSH
# approximate top-k against the exact brute-force top-k, per query —
# the metric that decides whether a bucketing scheme is good enough to
# replace the exact scan at 100 TB. Both arms reuse the exact SQL the
# individual queries already pin.
# ---------------------------------------------------------------------------

_RECALL_ORACLE = f"""
WITH b AS (SELECT vec_id, {_bucket_sql()} AS bucket FROM embeddings),
q AS (SELECT e.vec_id AS query_id, e.embedding::DOUBLE[] AS qv, b.bucket
      FROM embeddings e JOIN b ON e.vec_id = b.vec_id
      WHERE e.vec_id < {_N_QUERIES}),
c AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS cv, b.bucket
      FROM embeddings e JOIN b ON e.vec_id = b.vec_id),
ex AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                      c.vec_id ASC) AS rank
    FROM q JOIN c ON q.query_id <> c.vec_id)
  WHERE rank <= {_TOPK}),
ap AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                      c.vec_id ASC) AS rank
    FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.vec_id)
  WHERE rank <= {_TOPK}),
h AS (SELECT ex.query_id, count(ap.vec_id) AS n_hits
      FROM ex LEFT JOIN ap USING (query_id, vec_id)
      GROUP BY ex.query_id)
SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
       round(n_hits / {_TOPK}.0, 4) AS recall
FROM h
"""


@q("ann_recall_at_k", _RECALL_ORACLE)
def _ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of sign-bit LSH retrieval vs the exact cosine top-k,
    per query vector. Scale shape: the exact arm is the broadcast-
    query corpus stream, the LSH arm prunes to same-bucket candidates;
    the hit intersection joins two k-row-per-query rank lists —
    evaluation costs no more than the two retrievals it grades."""
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    exact = S.cosine_topk(emb, queries, k=_TOPK).select("query_id", "vec_id")
    approx = S.lsh_topk(emb, queries, k=_TOPK).select(
        "query_id", F.col("vec_id").alias("__av")
    )
    hits = (
        exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["vec_id"] == approx["__av"]),
            "left",
        )
        .groupBy(exact["query_id"].alias("query_id"))
        .agg(F.count("__av").cast("long").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.round(F.col("n_hits") / float(_TOPK), 4).alias("recall"),
    )
