"""Web-curation + data-mixing declared queries under the DuckDB
oracle: URL/domain filtering, paragraph-level keep-first dedup, the
linear quality classifier, and temperature-based source mixing.

The documents fixture has no URL column and single-line text, so the
URL and paragraph queries synthesize those shapes identically on both
sides from (doc_id, source) — same technique as the boilerplate and
PII queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import text as T
from ..operators import web as W
from .declared import q
from .northstar import _norm_sql, _tp

# ---------------------------------------------------------------------------
# URL / domain filtering
# ---------------------------------------------------------------------------

_BLOCKED_DOMAINS = ("src117.org", "src25.org", "src311.org")
_BLOCKED_TLDS = ("biz",)
_SPAM_PATH_RE = r"[?&]utm_"

# url = https://www.{source}{doc_id%40}.{org|biz}/p/{doc_id}[?utm_source=feed]
_URL_SQL = (
    "'https://www.' || source || CAST(doc_id % 40 AS VARCHAR)"
    " || CASE WHEN doc_id % 11 = 0 THEN '.biz' ELSE '.org' END"
    " || '/p/' || CAST(doc_id AS VARCHAR)"
    " || CASE WHEN doc_id % 13 = 0 THEN '?utm_source=feed' ELSE '' END"
)

_URL_ORACLE = f"""
WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
p AS (SELECT doc_id,
             regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
             regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)', 1) AS path
      FROM u),
d AS (SELECT doc_id, host, path,
             regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
             regexp_extract(host, '\\.([^.]+)$', 1) AS tld
      FROM p)
SELECT doc_id, host, domain, tld,
       reason IS NOT NULL AS blocked, reason
FROM (SELECT *,
             CASE WHEN domain IN {_BLOCKED_DOMAINS} THEN 'domain'
                  WHEN tld IN ('biz') THEN 'tld'
                  WHEN regexp_matches(path, '[?&]utm_') THEN 'path'
             END AS reason
      FROM d)
"""


def _synth_url(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            (F.col("doc_id") % 40).cast("string"),
            F.when(F.col("doc_id") % 11 == 0, F.lit(".biz")).otherwise(
                F.lit(".org")
            ),
            F.lit("/p/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 13 == 0, F.lit("?utm_source=feed")).otherwise(
                F.lit("")
            ),
        ).alias("url"),
    )


@q("url_domain_filter", _URL_ORACLE)
def _url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL filter: parse host/domain/TLD/path and classify
    against a domain blocklist, banned TLDs and a spam path pattern
    (web.domain_filter)."""
    docs = _tp(spark, sf_dir, "documents")
    return W.domain_filter(
        _synth_url(docs),
        "url",
        "doc_id",
        blocked_domains=_BLOCKED_DOMAINS,
        blocked_tlds=_BLOCKED_TLDS,
        spam_path_re=_SPAM_PATH_RE,
    )


# ---------------------------------------------------------------------------
# Paragraph-level keep-first dedup
# ---------------------------------------------------------------------------

_PARA_W = 8  # words per synthesized paragraph

_PARA_SQL = f"""
SELECT doc_id,
       array_to_string(
         list_transform(
           range(0, CAST(ceil(len(string_split(text, ' ')) / {_PARA_W}.0) AS INT)),
           i -> array_to_string(
                  list_slice(string_split(text, ' '),
                             i * {_PARA_W} + 1, i * {_PARA_W} + {_PARA_W}),
                  ' ')),
         chr(10)) AS t
FROM documents
"""

_PARA_ORACLE = f"""
WITH s AS ({_PARA_SQL}),
l AS (SELECT doc_id, string_split(t, chr(10)) AS paras FROM s),
x AS (SELECT doc_id,
             unnest(range(0, len(paras))) AS pos,
             unnest(paras) AS para
      FROM l),
h AS (SELECT doc_id, pos, para, md5(para) AS h,
             doc_id * 2147483648 + pos AS key
      FROM x),
o AS (SELECT h, min(key) AS owner FROM h GROUP BY h),
f AS (SELECT h.doc_id, h.pos, h.para, h.key = o.owner AS kept
      FROM h JOIN o ON h.h = o.h)
SELECT doc_id,
       count(*) AS n_paras,
       CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       md5(coalesce(array_to_string(list(para ORDER BY pos) FILTER (WHERE kept),
                                    chr(10)), '')) AS retained_md5
FROM f GROUP BY doc_id
"""


def _synth_paragraphs(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    n_paras = F.ceil(F.size(toks) / F.lit(float(_PARA_W))).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_paras - 1),
        lambda i: F.array_join(F.slice(toks, i * _PARA_W + 1, _PARA_W), " "),
    )
    return docs.select("doc_id", F.array_join(paras, "\n").alias("text"))


@q("paragraph_dedup_stats", _PARA_ORACLE)
def _paragraph_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact paragraph dedup with keep-first semantics:
    later occurrences of any exact paragraph are dropped; per-doc
    retention stats + cleaned-text md5 (dedup.paragraph_dedup)."""
    docs = _tp(spark, sf_dir, "documents")
    return D.paragraph_dedup(_synth_paragraphs(docs), "text", "doc_id")


# ---------------------------------------------------------------------------
# Linear quality classifier
# ---------------------------------------------------------------------------

_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in T.STOPWORDS) + "]"

_QC_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
f AS (SELECT doc_id,
             round(len(list_filter(toks, t -> list_contains({_STOP_LIST}, t)))
                   / len(toks), 6) AS stop_ratio,
             round(len(list_distinct(toks)) / len(toks), 6) AS uniq_ratio,
             round(list_sum(list_transform(toks, t -> length(t)))
                   / len(toks), 6) AS mean_wlen,
             round(list_sum(list_transform(toks,
                     t -> length(regexp_replace(t, '[^0-9]', '', 'g'))))
                   / list_sum(list_transform(toks, t -> length(t))), 6)
               AS digit_ratio
      FROM t)
SELECT doc_id, stop_ratio, uniq_ratio, mean_wlen, digit_ratio,
       round(-1.0 + 3.0 * stop_ratio + 2.0 * uniq_ratio
             + 0.2 * mean_wlen + -4.0 * digit_ratio, 6) AS score,
       round(-1.0 + 3.0 * stop_ratio + 2.0 * uniq_ratio
             + 0.2 * mean_wlen + -4.0 * digit_ratio, 6) >= 0.0 AS keep
FROM f
"""


@q("quality_classifier_keep", _QC_ORACLE)
def _quality_classifier_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier keep/drop over interpretable features
    (text.quality_classifier)."""
    docs = _tp(spark, sf_dir, "documents")
    return T.quality_classifier(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# Temperature-based source mixing
# ---------------------------------------------------------------------------

_MIX_TARGET = 200
_MIX_SEED = "temp0"

_MIX_ORACLE = f"""
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
s AS (SELECT sum(wt) AS wsum FROM w),
f AS (SELECT source,
             round(least(1.0, {_MIX_TARGET}.0 * wt / wsum / n), 9)
               AS mix_fraction
      FROM w CROSS JOIN s),
thr AS (SELECT source, mix_fraction,
               CASE WHEN mix_fraction >= 1.0 THEN 'gggggggg'
                    ELSE lpad(lower(hex(CAST(floor(mix_fraction * 4294967296.0)
                                             AS BIGINT))), 8, '0')
               END AS t
        FROM f)
SELECT d.doc_id, d.source, thr.mix_fraction
FROM documents d JOIN thr ON d.source = thr.source
WHERE substring(md5('{_MIX_SEED}:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.t
"""


@q("temperature_mix_sample", _MIX_ORACLE)
def _temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (alpha=0.5): deterministic
    hash sample sized to each source's tempered share
    (sampling.temperature_mix)."""
    docs = _tp(spark, sf_dir, "documents")
    return SM.temperature_mix(
        docs, "doc_id", "source", _MIX_TARGET, alpha=0.5, seed=_MIX_SEED
    )


# ---------------------------------------------------------------------------
# URL canonicalization + per-domain cap
# ---------------------------------------------------------------------------

# Messy-URL synthesis (identical on both sides): five shapes covering
# every canonicalization rule — case, www, default ports, fragments,
# utm params in first/middle/lone position, trailing slash.
_MESSY_URL_SQL = """
CASE doc_id % 5
  WHEN 0 THEN 'HTTP://WWW.' || upper(source) || '.ORG:80/a/'
              || CAST(doc_id AS VARCHAR) || '/'
  WHEN 1 THEN 'https://' || source || '.org:443/p/' || CAST(doc_id AS VARCHAR)
              || '?utm_source=x&q=' || CAST(doc_id AS VARCHAR)
  WHEN 2 THEN 'https://www.' || source || '.org/p/' || CAST(doc_id AS VARCHAR)
              || '?a=1&utm_medium=m&b=2#frag'
  WHEN 3 THEN 'http://' || source || '.org/p/' || CAST(doc_id AS VARCHAR)
              || '?utm_campaign=c'
  ELSE 'https://' || source || '.org/'
END
"""

_CANON_ORACLE = f"""
WITH u AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents),
h AS (SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             regexp_replace(
               lower(regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
               '^www\\.', '') AS hp,
             regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) AS pq0
      FROM u),
h2 AS (SELECT doc_id, url, scheme,
              CASE WHEN scheme = 'http' THEN regexp_replace(hp, ':80$', '')
                   WHEN scheme = 'https' THEN regexp_replace(hp, ':443$', '')
                   ELSE hp END AS hp,
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(pq0, '&utm_[^&]*', '', 'g'),
                    '\\?utm_[^&]*&', '?'),
                  '\\?utm_[^&]*$', ''),
                '\\?$', '') AS pq1
       FROM h)
SELECT doc_id, url,
       scheme || '://' || hp || regexp_replace(pq1, '^(/.+)/$', '\\1')
         AS canon_url
FROM h2
"""


def _messy_url(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    shape = d % 5
    ds = d.cast("string")
    return docs.select(
        "doc_id",
        F.when(
            shape == 0,
            F.concat(
                F.lit("HTTP://WWW."), F.upper("source"), F.lit(".ORG:80/a/"),
                ds, F.lit("/"),
            ),
        )
        .when(
            shape == 1,
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".org:443/p/"), ds,
                F.lit("?utm_source=x&q="), ds,
            ),
        )
        .when(
            shape == 2,
            F.concat(
                F.lit("https://www."), F.col("source"), F.lit(".org/p/"), ds,
                F.lit("?a=1&utm_medium=m&b=2#frag"),
            ),
        )
        .when(
            shape == 3,
            F.concat(
                F.lit("http://"), F.col("source"), F.lit(".org/p/"), ds,
                F.lit("?utm_campaign=c"),
            ),
        )
        .otherwise(F.concat(F.lit("https://"), F.col("source"), F.lit(".org/")))
        .alias("url"),
    )


@q("url_canonicalize", _CANON_ORACLE)
def _url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization ahead of URL-level dedup (web.canonicalize_url):
    case, www, default ports, fragments, utm params, trailing slash."""
    docs = _tp(spark, sf_dir, "documents")
    u = _messy_url(docs)
    return u.select(
        "doc_id", "url", W.canonicalize_url(F.col("url")).alias("canon_url")
    )


_DOMAIN_CAP = 3

_DOMAIN_CAP_ORACLE = f"""
WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
d AS (SELECT doc_id,
             regexp_extract(
               regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
               '([^.]+\\.[^.]+)$', 1) AS domain
      FROM u)
SELECT doc_id, domain,
       CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id, doc_id)
            AS BIGINT) AS key_rank,
       row_number() OVER (PARTITION BY domain ORDER BY doc_id, doc_id)
         <= {_DOMAIN_CAP} AS kept
FROM d
"""


@q("domain_cap_sample", _DOMAIN_CAP_ORACLE)
def _domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style per-domain cap: keep the first {cap} docs of
    each registered domain in deterministic doc_id order, audit view
    with rank + kept flag (sampling.per_key_cap)."""
    docs = _tp(spark, sf_dir, "documents")
    u = _synth_url(docs)
    with_domain = u.select(
        "doc_id", W.url_parts(F.col("url"))["domain"].alias("domain")
    )
    return SM.per_key_cap(with_domain, "domain", "doc_id", _DOMAIN_CAP)


# ---------------------------------------------------------------------------
# Fuzzy key join (edit distance <= 1)
# ---------------------------------------------------------------------------

# Typo'd lookup keys synthesized from doc sources: delete one char,
# append one char, substitute the first char, or exact — by doc_id arm.
_TYPO_SQL = """
CASE doc_id % 4
  WHEN 0 THEN substring(source, 1, CAST(doc_id % length(source) AS INT))
              || substring(source, CAST(doc_id % length(source) AS INT) + 2,
                           length(source))
  WHEN 1 THEN source || 'x'
  WHEN 2 THEN 'z' || substring(source, 2, length(source))
  ELSE source
END
"""

# The oracle is the BRUTE-FORCE similarity join — an independent check
# that deletion-neighborhood blocking loses no pair at distance <= 1.
_FUZZY_ORACLE = f"""
WITH typos AS (SELECT DISTINCT {_TYPO_SQL} AS l_key FROM documents),
canon AS (SELECT DISTINCT source AS r_key FROM documents)
SELECT l_key, r_key,
       CAST(levenshtein(l_key, r_key) AS BIGINT) AS distance
FROM typos, canon
WHERE levenshtein(l_key, r_key) <= 1
"""


@q("fuzzy_join_sources", _FUZZY_ORACLE)
def _fuzzy_join_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-key entity resolution: typo'd source names matched to the
    canonical source list at edit distance <= 1 via deletion-
    neighborhood blocking (operators/fuzzyjoin.py) — the oracle runs
    the quadratic levenshtein join, so blocking recall is verified
    against ground truth."""
    from ..operators.fuzzyjoin import fuzzy_join_edit1

    docs = _tp(spark, sf_dir, "documents")
    pos = (F.col("doc_id") % F.length("source")).cast("int")
    typo = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.substring("source", F.lit(1), pos),
                F.substring(F.col("source"), pos + 2, F.length("source")),
            ),
        )
        .when(F.col("doc_id") % 4 == 1, F.concat(F.col("source"), F.lit("x")))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("z"), F.expr("substring(source, 2, length(source))")),
        )
        .otherwise(F.col("source"))
    )
    typos = docs.select(typo.alias("key"))
    canon = docs.select("source")
    out = fuzzy_join_edit1(typos, canon, "key", "source")
    return out.select(
        "l_key", "r_key", F.col("distance").cast("long").alias("distance")
    )


# ---------------------------------------------------------------------------
# Weight-proportional deterministic sampling
# ---------------------------------------------------------------------------

_WS_BASE, _WS_CAP, _WS_SEED = 0.8, 600.0, "wmix0"

_WEIGHTED_ORACLE = f"""
WITH p AS (
  SELECT doc_id, source, n_chars,
         round({_WS_BASE} * (least(CAST(n_chars AS DOUBLE), {_WS_CAP})
                             / {_WS_CAP}), 9) AS keep_p
  FROM documents)
SELECT doc_id, source, n_chars, keep_p
FROM p
WHERE substring(md5('{_WS_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE WHEN keep_p >= 1.0 THEN 'gggggggg'
           ELSE lpad(lower(hex(CAST(floor(keep_p * 4294967296.0)
                                    AS BIGINT))), 8, '0') END
"""


@q("weighted_sample_docs", _WEIGHTED_ORACLE)
def _weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sampling
    (sampling.weighted_hash_sample): keep probability proportional to
    min(n_chars, cap) — the quality/length-weighted mixing move, as a
    pure narrow md5-threshold predicate (no RNG, no shuffle, monotone
    in the weight, replayed row-for-row by the oracle)."""
    docs = _tp(spark, sf_dir, "documents")
    return SM.weighted_hash_sample(
        docs.select("doc_id", "source", "n_chars"),
        "doc_id",
        "n_chars",
        _WS_BASE,
        _WS_CAP,
        seed=_WS_SEED,
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling (sampling.negative_samples)
# ---------------------------------------------------------------------------

_NEG_SEED, _NEG_K, _NEG_RINGS = "neg0", 2, 16

_NEG_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS anchor_id,
         substring(md5('{_NEG_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)
           AS pos
  FROM documents),
ring AS (
  SELECT anchor_id, pos,
         (('0x' || substring(pos, 1, 4))::BIGINT % {_NEG_RINGS}) AS ring
  FROM base),
ranked AS (
  SELECT *, row_number() OVER w AS rn,
         lead(anchor_id, 1) OVER w AS n1,
         lead(anchor_id, 2) OVER w AS n2
  FROM ring WINDOW w AS (PARTITION BY ring ORDER BY pos, anchor_id)),
heads AS (
  SELECT ring, list(anchor_id ORDER BY pos, anchor_id) AS h
  FROM ranked WHERE rn <= {_NEG_K} GROUP BY ring),
sizes AS (SELECT ring, count(*) AS N FROM ring GROUP BY ring),
x AS (
  SELECT r.anchor_id, 1 AS neg_rank,
         coalesce(r.n1, h.h[CAST(r.rn + 1 - s.N AS INT)]) AS negative_id
  FROM ranked r JOIN heads h USING (ring) JOIN sizes s USING (ring)
  UNION ALL
  SELECT r.anchor_id, 2,
         coalesce(r.n2, h.h[CAST(r.rn + 2 - s.N AS INT)])
  FROM ranked r JOIN heads h USING (ring) JOIN sizes s USING (ring))
SELECT anchor_id, negative_id, CAST(neg_rank AS BIGINT) AS neg_rank
FROM x WHERE negative_id IS NOT NULL AND negative_id <> anchor_id
"""


@q("negative_samples_ring", _NEG_ORACLE)
def _negative_samples_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-ring negative sampling for contrastive
    training pairs (sampling.negative_samples): each anchor's
    negatives are its successors on one of 16 INDEPENDENT salted md5
    rings (ring membership is hash-uniform, so partners are still
    effectively uniform over the corpus) — reproducible across runs/
    engines/retries, exactly k per anchor once rings exceed k rows.
    The partitioned rings keep the sort+lead() an ordinary parallel
    window, never a single-partition global sort."""
    docs = _tp(spark, sf_dir, "documents")
    return SM.negative_samples(
        docs, "doc_id", _NEG_K, seed=_NEG_SEED, n_rings=_NEG_RINGS
    )


# ---------------------------------------------------------------------------
# Exact-substring (token-window) dedup with keep-first rewriting
# ---------------------------------------------------------------------------

_SPAN_W = 5  # tokens per window

_SPAN_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split({_norm_sql('text')}, ' ') AS toks
           FROM documents),
g AS (SELECT doc_id, p,
             md5(array_to_string(toks[p + 1 : p + {_SPAN_W}], ' ')) AS gh
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - {_SPAN_W})) AS p
            FROM t)),
own AS (SELECT gh, min(doc_id * 2147483648 + p) AS owner FROM g GROUP BY gh),
dup AS (SELECT g.doc_id, g.p FROM g JOIN own USING (gh)
        WHERE g.doc_id * 2147483648 + g.p <> own.owner),
tok AS (SELECT doc_id,
               unnest(toks) AS tok,
               generate_subscripts(toks, 1) - 1 AS i
        FROM t),
cov AS (SELECT DISTINCT d.doc_id, unnest(generate_series(d.p, d.p + {_SPAN_W} - 1)) AS i
        FROM dup d),
kept AS (SELECT tok.doc_id, tok.i, tok.tok
         FROM tok LEFT JOIN cov
           ON tok.doc_id = cov.doc_id AND tok.i = cov.i
         WHERE cov.i IS NULL),
k2 AS (SELECT doc_id, count(*) AS n_kept,
              md5(array_to_string(list(tok ORDER BY i), ' '))
                AS retained_md5
       FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - coalesce(k2.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(k2.retained_md5, md5('')) AS retained_md5
FROM t LEFT JOIN k2 USING (doc_id)
"""


@q("span_dedup_stats", _SPAN_ORACLE)
def _span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact-substring dedup at 5-token-window granularity
    with keep-first rewriting (dedup.span_dedup — the ExactSubstr
    recipe of Lee et al. 2022 on fixed windows): every repeated 5-token
    span loses all but its first occurrence, within and across
    documents; output is per-doc removal stats + the md5 of the
    rewritten text. The oracle replays ownership, coverage and the
    rebuild with token-level joins straight off the corpus."""
    docs = _tp(spark, sf_dir, "documents")
    return D.span_dedup(docs, "text", "doc_id", w=_SPAN_W)


_SPAN_IDX_SPLIT = 250  # ascending-id batch boundary

# Ascending-id batches make the incremental answer EQUAL the one-shot
# span dedup (smaller keys always arrive first), so the oracle is the
# one-shot replay plus the batch label.
_SPAN_IDX_ORACLE = f"""
SELECT doc_id,
       CAST(CASE WHEN doc_id < {_SPAN_IDX_SPLIT} THEN 0 ELSE 1 END AS BIGINT)
         AS batch,
       n_tokens, n_removed, retained_md5
FROM ({_SPAN_ORACLE})
"""


@q("span_index_batches", _SPAN_IDX_ORACLE)
def _span_index_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent cross-batch SPAN-dedup index (sinks/spanindex.py):
    two sequential ascending-id batches rewritten against the same
    stored gram index — batch 2's documents lose every 5-token span
    batch 1 registered (and their own within-batch repeats). The
    append-sequence == one-shot equivalence contract means the oracle
    is simply the one-shot ExactSubstr replay; any failure of
    cross-batch suppression (or over-suppression on replayed grams)
    breaks the hash."""
    import shutil
    import tempfile
    from pathlib import Path

    from ..sinks.spanindex import span_dedup_against_index

    sf = Path(sf_dir).name or "sf"
    root = Path(tempfile.gettempdir()) / "spark_graft_span_idx" / sf
    shutil.rmtree(root, ignore_errors=True)

    docs = _tp(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") < _SPAN_IDX_SPLIT)
    b2 = docs.filter(F.col("doc_id") >= _SPAN_IDX_SPLIT)
    # ordering (index appended before batch 2 plans) is guaranteed by
    # span_dedup_against_index itself: the fresh-gram append is an
    # ACTION inside the call, and batch 1's result plan reads only the
    # checkpointed gram frame — no extra eager materialization needed
    s1 = span_dedup_against_index(
        spark, b1, root, "text", "doc_id", w=_SPAN_W
    )
    s2 = span_dedup_against_index(
        spark, b2, root, "text", "doc_id", w=_SPAN_W
    )
    return s1.withColumn("batch", F.lit(0).cast("long")).unionByName(
        s2.withColumn("batch", F.lit(1).cast("long"))
    ).select("doc_id", "batch", "n_tokens", "n_removed", "retained_md5")


# ---------------------------------------------------------------------------
# Diversified sampler (ES diversified_sampler parity): global top-k by
# score with at most m hits per source — dominance caps for corpus
# sampling. The per-source prune rides the shuffle-light topk operator
# (map-side per-key head, then one exact window), so the global cut
# sees only <= sources x m candidate rows.
# ---------------------------------------------------------------------------

_DIV_ORACLE = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id DESC) AS rank
  FROM documents
)
SELECT doc_id, source, n_chars, rank
FROM r WHERE rank <= 3
ORDER BY n_chars DESC, doc_id
LIMIT 50
"""


@q("diversified_sample_topk", _DIV_ORACLE)
def diversified_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 longest documents with at most 3 per source. The
    per-source cap prunes map-side (operators/topk.py) before any
    exchange; the global ORDER BY runs over the tiny capped set."""
    from ..operators.topk import topk_per_key

    docs = _tp(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    capped = topk_per_key(
        docs,
        key_col="source",
        order_col="n_chars",
        k=3,
        tiebreak_col="doc_id",
        ascending=False,
    )
    return capped.orderBy(F.col("n_chars").desc(), "doc_id").limit(50)
