"""Deduplication operators for LLM-data pipelines (north star,
BASELINE.json): exact, MinHash(+LSH banding), SimHash, n-gram Jaccard.

Scale posture (100 TB): exact dedup is one hash-shuffle on a 32-char
key (not the full text — map-side md5 first, so the shuffle moves
hashes, not documents). MinHash signatures are computed map-side per
row (no shuffle); LSH banding shuffles once per band on small band-key
tuples; candidate verification touches only candidate pairs, never the
full cross product. All hashes are md5-derived so the DuckDB oracle can
reproduce them bit-for-bit (no engine-specific hash functions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "exact_dedup",
    "normalized_text",
    "tokens",
    "minhash_signature",
    "minhash_signatures",
    "lsh_band_keys",
    "lsh_candidate_pairs",
    "token_hashes",
    "simhash_bits",
    "jaccard",
    "word_shingles",
    "ngram_contamination",
    "paragraph_dedup",
    "span_dedup",
]


def normalized_text(col: Column) -> Column:
    """Canonical form for near-dup work: lowercase, collapse whitespace,
    strip non-alphanumerics (keeps spaces)."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct md5(text) with
    the minimum id as representative + duplicate count.

    At scale: the groupBy shuffles (md5, id) pairs only — 40ish bytes
    per row regardless of document size.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count("*").alias("n_copies"),
        )
    )


def tokens(col: Column) -> Column:
    """Distinct word set of the normalized text."""
    return F.array_distinct(F.split(normalized_text(col), " "))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the MinHash input unit) from a
    token-array column.

    IMPORTANT: pass a *materialized* token column (a prior projection's
    attribute), not an inline ``split(normalize(...))`` expression —
    this expression references ``toks`` ~array-size times, and Catalyst
    inlines (re-evaluates) non-attribute subexpressions at every
    reference site, turning O(W) into O(W * regex) per row (measured
    20x slowdown). ``minhash_signatures`` stages the projections
    correctly."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
    )


# The one definition of the minhash slicing scheme — shared by the
# single-value helper, the batched signature path, and mirrored by the
# oracle generator (plans.northstar._minhash_sql). Hash function `seed`
# is slice `seed % 4` of md5('b<seed//4>:' + shingle), prefix '' for
# block 0: md5's bits are uniform and the four 8-hex-char slices are
# independent, so each is a proper 32-bit MinHash permutation at a
# QUARTER of the cost of seeded-md5-per-function.


def _mh_block_prefix(block: int) -> str:
    return "" if block == 0 else f"b{block}:"


def _mh_block_hash(block: int):
    prefix = _mh_block_prefix(block)
    return lambda t: F.md5(F.concat(F.lit(prefix), t))


def _mh_slice(seed: int):
    slot = seed % 4
    return lambda h: F.substring(h, slot * 8 + 1, 8)


def minhash_signature(shingles: Column, seed: int) -> Column:
    """One MinHash value: the lexicographic minimum, over the shingle
    set, of an 8-hex-char md5 slice (scheme above) — reproducible in
    any engine with md5 (the DuckDB oracle)."""
    block_hash, slice_ = _mh_block_hash(seed // 4), _mh_slice(seed)
    return F.array_min(
        F.transform(shingles, lambda t: slice_(block_hash(t)))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """id + mh0..mh{n-1} signature columns, computed map-side (no
    shuffle; the heavy regex/hash work stays in codegen).

    Staged projections (tokens -> shingles -> per-block hash arrays ->
    signatures) so each expensive intermediate is an attribute computed
    once per row; the multi-reference aliases block Catalyst's
    CollapseProject from inlining them back into every use site. The
    hash-array stage materializes ONE md5 per shingle per block of
    four hash functions — the mh columns then slice it, so hashing
    cost is ceil(n_hashes / 4) md5 evals per shingle, not n_hashes."""
    out = df.select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("__toks"),
    )
    out = out.select(
        F.col(id_col), word_shingles(F.col("__toks"), shingle_n).alias("__sh")
    )
    # the shared scheme factories return single-arg lambdas: pyspark's
    # transform() reads lambda arity, so a bound default arg would be
    # mistaken for the index slot
    n_blocks = (n_hashes + 3) // 4
    out = out.select(
        F.col(id_col),
        *[
            F.transform(F.col("__sh"), _mh_block_hash(b)).alias(f"__hb{b}")
            for b in range(n_blocks)
        ],
    )
    return out.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform(F.col(f"__hb{i // 4}"), _mh_slice(i))
            ).alias(f"mh{i}")
            for i in range(n_hashes)
        ],
    )


def lsh_band_keys(sig_df: DataFrame, n_hashes: int, band_size: int) -> DataFrame:
    """Signature rows -> (band_id, band_key) rows. Docs agreeing on all
    hashes of any band become LSH candidates."""
    bands = []
    for b in range(0, n_hashes // band_size):
        cols = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        bands.append(
            F.struct(
                F.lit(b).alias("band_id"), F.concat_ws("|", *cols).alias("band_key")
            )
        )
    return sig_df.select(
        *[c for c in sig_df.columns if not c.startswith("mh")],
        F.explode(F.array(*bands)).alias("band"),
    ).select(*[c for c in sig_df.columns if not c.startswith("mh")], "band.*")


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing at least one full
    band.

    Shape chosen for scale: groupBy band key -> in-bucket pair
    expansion, NOT a self-join. A self-join would evaluate the whole
    signature pipeline twice (once per join side) and shuffle it twice;
    here signatures are computed once, ONE shuffle moves (band_key, id)
    tuples, and pair blow-up is bounded by bucket size (quadratic only
    within a bucket — the premise of LSH banding). The final distinct
    dedups pairs that collide in several bands."""
    banded = lsh_band_keys(sig_df, n_hashes, band_size)
    buckets = (
        banded.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        buckets.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per document, how many of its word
    n-gram shingles also occur anywhere in a benchmark/eval corpus —
    the standard pre-training hygiene check (drop or flag training docs
    that leak test material).

    Shape chosen for scale: the benchmark gram set is tiny relative to
    the corpus (eval suites are MBs against TBs of training text), so
    it collapses to ONE row holding the sorted distinct gram array and
    broadcasts under the corpus scan; the overlap count is then a
    narrow ``array_intersect`` per document — the 100 TB corpus is
    never shuffled, exploded, or self-joined. If a benchmark ever
    outgrew broadcast size, the fallback is an exploded gram
    broadcast-semi-join, which still leaves the corpus unshuffled.

    Returns (id, n_overlap, contaminated).
    """
    from pyspark.sql.functions import broadcast

    def grams(df: DataFrame, *keep: str) -> DataFrame:
        out = df.select(
            *keep, F.split(normalized_text(F.col(text_col)), " ").alias("__toks")
        )
        return out.select(*keep, word_shingles(F.col("__toks"), shingle_n).alias("__sh"))

    bench_row = (
        grams(benchmark)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("__sh")))
            ).alias("__bench")
        )
    )
    overlap = F.size(F.array_intersect(F.col("__sh"), F.col("__bench")))
    return (
        grams(docs, id_col)
        .crossJoin(broadcast(bench_row))
        .select(
            F.col(id_col),
            overlap.alias("n_overlap"),
            (overlap > 0).alias("contaminated"),
        )
    )


def jaccard(a: Column, b: Column, ndigits: int = 4) -> Column:
    """Jaccard similarity of two array-set columns, rounded for
    cross-engine hash stability."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.round(
        F.when(union == 0, F.lit(0.0)).otherwise(inter / union), ndigits
    )


def fuzzy_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 4,
    band_size: int = 2,
    threshold_num: int = 7,
    threshold_den: int = 10,
) -> DataFrame:
    """End-to-end fuzzy (near-duplicate) corpus dedup — the full
    MinHash-LSH recipe composed into one operator:

        signatures -> LSH banding -> candidate pairs
        -> exact-Jaccard VERIFY (kills LSH false positives)
        -> connected components over verified edges
        -> canonical election (min id per cluster)

    Returns one row per input doc: ``(id, component, cluster_size,
    kept)`` where ``kept`` marks the cluster's canonical survivor.
    Filtering ``kept`` yields the deduplicated corpus.

    Verification threshold is the exact integer test
    ``|A ∩ B| * den >= |A ∪ B| * num`` on distinct token sets — no
    float compare, so any engine agrees on the edge set bit-exactly.

    Scale posture (100 TB): signatures are computed once, map-side;
    the LSH shuffle moves (band_key, id) tuples only; token arrays for
    the verify stage are built ONLY for docs that appear in some
    candidate pair (semi-join pruning — at production dup rates this
    is a tiny fraction of the corpus); component propagation runs on
    the verified edge set, which is strictly smaller still. Documents
    themselves are never shuffled.
    """
    from .components import connected_components

    sig = minhash_signatures(df, text_col, id_col, n_hashes=n_hashes)
    # cand feeds three downstream plans (both cand_ids arms + the
    # verify join): materialize it once, or the signature+banding
    # pipeline re-executes per reference inside the verified-edges job
    cand = lsh_candidate_pairs(
        sig, id_col, n_hashes=n_hashes, band_size=band_size
    ).localCheckpoint()
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # joined twice (id_a / id_b side) — tokenize the pruned set once
    toks = df.join(cand_ids, id_col, "semi").select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).localCheckpoint()
    verified = (
        cand.join(
            toks.select(F.col(id_col).alias("id_a"), F.col("__toks").alias("__ta")),
            "id_a",
        )
        .join(
            toks.select(F.col(id_col).alias("id_b"), F.col("__toks").alias("__tb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__ta", "__tb")).alias("__i"),
            F.size(F.array_union("__ta", "__tb")).alias("__u"),
        )
        .filter(F.col("__i") * threshold_den >= F.col("__u") * threshold_num)
        .select("id_a", "id_b")
    )
    # propagate labels over the EDGE SUBGRAPH only — endpoints of
    # verified edges, a tiny fraction of the corpus at production dup
    # rates — then left-join back; every non-endpoint doc is its own
    # singleton. Feeding the whole corpus as vertices would turn every
    # propagation round into a corpus-sized shuffle for no information.
    # Materialize the (tiny) verified edge set once: endpoints + the
    # propagation loop would otherwise re-run the signature/verify
    # pipeline on every reference.
    verified = verified.localCheckpoint()
    endpoints = (
        verified.select(F.col("id_a").alias(id_col))
        .union(verified.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    labels = connected_components(
        endpoints, verified, id_col=id_col, src_col="id_a", dst_col="id_b"
    ).select(F.col("id").alias(id_col), "component")
    sizes = labels.groupBy("component").agg(F.count("*").alias("cluster_size"))
    labeled = labels.join(sizes, "component")
    comp = F.coalesce("component", F.col(id_col))
    return (
        df.select(id_col)
        .join(labeled, id_col, "left")
        .select(
            id_col,
            comp.alias("component"),
            F.coalesce("cluster_size", F.lit(1)).cast("long").alias(
                "cluster_size"
            ),
            (comp == F.col(id_col)).alias("kept"),
        )
    )


def token_hashes(toks: Column) -> Column:
    """One md5 per token — the staged input for simhash_bits. Callers
    materialize this as a projection attribute so the 32 hex chars
    serve all simhash bits from a single hash evaluation."""
    return F.transform(toks, lambda t: F.md5(t))


def simhash_bits(hashes: Column, n_bits: int = 16) -> Column:
    """SimHash as a bit string from a *materialized* token-HASH array
    column (``token_hashes``; see word_shingles on why an inline
    expression would re-evaluate per bit): bit b is the sign of the
    vote sum over tokens, where a token votes +1 iff hex char b of its
    md5 is below '8' (the nibble's top bit — md5's chars are uniform
    and independent, so each of the 32 positions is an unbiased coin).
    ONE md5 per token serves every bit; n_bits <= 32."""
    if n_bits > 32:
        raise ValueError("simhash_bits supports at most 32 bits per md5")

    def _vote(b: int):
        return lambda acc, h: acc + F.when(
            F.substring(h, b + 1, 1) < "8", 1
        ).otherwise(-1)

    bits = []
    for b in range(n_bits):
        vote = F.aggregate(hashes, F.lit(0), _vote(b))
        bits.append(F.when(vote >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def paragraph_dedup(
    df: DataFrame, text_col: str, id_col: str, sep: str = "\n"
) -> DataFrame:
    """Exact paragraph-level dedup with keep-first semantics
    (Falcon/RefinedWeb-style span dedup at paragraph granularity):
    across the WHOLE corpus, only the first occurrence of each exact
    paragraph survives, where "first" is the smallest (doc id,
    position-in-doc). Returns per-doc
    `(id, n_paras, n_dropped, retained_md5)` — retained_md5
    fingerprints the document with later-occurrence duplicate
    paragraphs removed, original order preserved.

    Differs from line_boilerplate (text.py): boilerplate removes ALL
    copies of over-repeated lines via a tiny broadcast set; this keeps
    exactly one copy of EVERY paragraph, so the duplicate universe is
    unbounded and the op must shuffle. Scale shape: two exchanges, both
    on compact keys — paragraphs group by md5 (the shuffle moves
    (md5-prefix, owner-key) pairs, with map-side partial min), and the
    winning flags group back by doc id. The corpus text itself moves
    once, in the second exchange, as (doc, pos, paragraph) rows; no
    self-join, no broadcast of an unbounded set.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__para"),
    )
    # composite first-occurrence key: 2^31 multiplier is collision-free
    # for any int position and non-negative ids < 2^32 (same scheme as
    # span_dedup)
    key = F.col(id_col).cast("long") * 2147483648 + F.col("__pos")
    hashed = paras.select(
        F.col(id_col),
        "__pos",
        "__para",
        F.md5(F.col("__para")).alias("__h"),
        key.alias("__key"),
    )
    owner = hashed.groupBy("__h").agg(F.min("__key").alias("__owner"))
    flagged = hashed.join(owner, "__h").withColumn(
        "__kept", F.col("__key") == F.col("__owner")
    )
    kept_struct = F.when(
        F.col("__kept"), F.struct(F.col("__pos"), F.col("__para"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(F.col("__kept"), 0).otherwise(1)).alias("n_dropped"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["__para"],
                    ),
                    sep,
                )
            ).alias("retained_md5"),
        )
    )


def containment(a: Column, b: Column, ndigits: int | None = 4) -> Column:
    """Directed containment |a INTERSECT b| / |a| of two array-set
    columns: ~1.0 when a is (nearly) a subset of b. The asymmetric
    companion to jaccard — a boilerplate-wrapped copy of a page has low
    Jaccard against the original but containment ~1 in one direction.
    ``ndigits=None`` returns the raw ratio (for threshold decisions)."""
    inter = F.size(F.array_intersect(a, b))
    ratio = F.when(F.size(a) == 0, F.lit(0.0)).otherwise(inter / F.size(a))
    return F.round(ratio, ndigits) if ndigits is not None else ratio


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Subset/superset near-dup detection: candidate pairs from MinHash
    LSH banding, verified by DIRECTED shingle containment — catches the
    page-embedded-in-a-larger-page duplicates that symmetric Jaccard
    thresholds miss (|A|<<|B| caps Jaccard at |A|/|B| even when A ⊂ B).

    Returns ``(id_a, id_b, containment_ab, containment_ba, relation)``
    for pairs where either direction reaches ``threshold``; relation ∈
    {a_in_b, b_in_a, mutual}.

    Scale shape: identical to fuzzy_dedup's verify stage — shingle
    arrays are built ONLY for documents appearing in some candidate
    pair (semi-join pruning); the banding shuffle moves (band_key, id)
    and the verify join moves pruned shingle arrays. One caveat
    inherent to MinHash: banding recall is driven by JACCARD, so a
    tiny-doc-in-huge-doc pair (Jaccard ~ |A|/|B|) may not surface as a
    candidate; at production scale the containment-tuned variant swaps
    the signature for a bottom-k sketch of A only. The oracle replays
    candidates + verification exactly, so this recall contract is
    pinned, not hidden."""
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_n)
    # cands feeds THREE downstream plans (both arms of `needed` plus
    # the verify join); cut its lineage so the signature + banding
    # pipeline runs once, exactly as fuzzy_dedup does for its edges
    # (VERDICT r2: xchg=44 without this cut).
    cands = lsh_candidate_pairs(sigs, id_col, n_hashes, band_size).localCheckpoint()
    needed = (
        cands.select(F.col("id_a").alias(id_col))
        .unionAll(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    toks = df.join(needed, id_col, "left_semi").select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("__toks"),
    )
    # sh is joined twice (id_a side and id_b side); materialize the
    # pruned shingle table once so tokenize + semi-join don't run per
    # pair-join arm
    sh = toks.select(
        F.col(id_col), word_shingles(F.col("__toks"), shingle_n).alias("__sh")
    ).localCheckpoint()
    pairs = (
        cands.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sa")),
            "id_a",
        )
        .join(
            sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            # threshold decisions use the UNROUNDED ratios — rounding
            # first would admit pairs up to 5e-5 below the bar (and
            # mislabel the relation); output columns are rounded for
            # cross-engine hash stability only
            containment(F.col("__sa"), F.col("__sb"), ndigits=None).alias(
                "__raw_ab"
            ),
            containment(F.col("__sb"), F.col("__sa"), ndigits=None).alias(
                "__raw_ba"
            ),
        )
    )
    thr = F.lit(float(threshold))
    return pairs.filter(
        (F.col("__raw_ab") >= thr) | (F.col("__raw_ba") >= thr)
    ).select(
        "id_a",
        "id_b",
        F.round("__raw_ab", 4).alias("containment_ab"),
        F.round("__raw_ba", 4).alias("containment_ba"),
        F.when(
            (F.col("__raw_ab") >= thr) & (F.col("__raw_ba") >= thr),
            "mutual",
        )
        .when(F.col("__raw_ab") >= thr, "a_in_b")
        .otherwise("b_in_a")
        .alias("relation"),
    )


def span_dedup(
    df: DataFrame, text_col: str, id_col: str, w: int = 10
) -> DataFrame:
    """Exact-substring dedup at token-window granularity with
    keep-first rewriting (the ExactSubstr recipe of "Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022,
    approximated on w-token windows instead of a suffix array): any
    w-token span whose exact content already occurred earlier in the
    corpus — in another document OR earlier in the same document — is
    removed from the text; the first occurrence (smallest (doc id,
    position)) keeps its copy.

    Returns per-doc ``(id, n_tokens, n_removed, retained_md5)`` where
    ``retained_md5`` fingerprints the rewritten text (surviving tokens
    in original order, space-joined; empty string when the whole doc is
    covered). Documents shorter than ``w`` tokens emit no windows and
    are never rewritten.

    Scale shape: window hashes are built IN-ROW from the token array
    (no position self-join), so the corpus explodes only to (id, pos,
    gram-md5) rows — evaluated ONCE: ownership is a min-over-gram-hash
    window on that single gram stream (one compact-key exchange; the
    groupBy+self-join formulation would evaluate the md5 gram pipeline
    on both join sides). Only DUPLICATE window positions — typically a
    tiny fraction — flow onward, grouped per doc into one position
    array. The corpus text shuffles exactly once (the id join that
    attaches that array); token filtering and the rebuild are narrow
    in-row expressions. Per-row cost of the coverage filter is
    O(n_tokens x n_dup_spans_in_doc), bounded by document length.
    """
    if w < 2:
        raise ValueError(f"window must be >= 2 tokens: {w}")
    # staged (the normalized token arrays) feeds BOTH the gram explode
    # and the final rewrite join — without a cut the corpus is
    # tokenized twice inside the one action (the two subtrees are not
    # exchange-reusable). Materialize it once: 1.37x at the 10x scale
    # sweep (6.60 -> 4.81 s median), ~10% at sf0.1, results identical.
    # Space trade (guide §5): the token stream persists for the
    # query's duration (MEMORY_AND_DISK, spills) — the standard
    # tokenize-once layout real ExactSubstr pipelines write to disk.
    # type guard FIRST (before the eager checkpoint materializes
    # anything): the ownership exchange ships only (16-byte binary
    # gram hash, key) — id and position are recovered arithmetically
    # from the key encoding (id * 2^31 + p), so the hex md5 / id / p
    # columns never shuffle. The decode makes the __key numeric-id
    # constraint LOAD-BEARING for correctness (ADVICE r09): a numeric
    # STRING id in non-canonical form ('007' -> cast 7 -> decode '7')
    # would silently miss the final per-id join and never rewrite
    # those docs — so non-integral id types fail loudly here instead.
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            "span_dedup requires an integral id column (non-negative,"
            f" < 2^32) for its (id * 2^31 + pos) key encoding; got"
            f" {id_col}: {id_type}"
        )
    staged = _span_staged(df, text_col, id_col).localCheckpoint()
    grams = _span_grams(staged, id_col, w)
    win = Window.partitionBy("__ghb")
    dup_pos = (
        grams.select(F.unhex("__gh").alias("__ghb"), "__key")
        .withColumn("__owner", F.min("__key").over(win))
        .filter(F.col("__key") != F.col("__owner"))
        .select(
            F.expr("__key div 2147483648").cast(id_type).alias(id_col),
            F.expr("__key % 2147483648").cast("int").alias("__p"),
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__p")).alias("__dup"))
    )
    return _span_rewrite(staged.join(dup_pos, id_col, "left"), id_col, w)


def _span_staged(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("__toks"),
    )


def _span_grams(staged: DataFrame, id_col: str, w: int) -> DataFrame:
    """(id, __p, __gh, __key) rows: one per w-token window, built
    in-row from the staged token array. __key is the global
    first-occurrence order (id * 2^31 + position)."""
    n = F.size(F.col("__toks"))
    # sequence(0, n-w) would count DOWN for short docs (Spark infers
    # step -1) — guard to an empty window list instead
    gram_pos = F.when(
        n >= w, F.sequence(F.lit(0), n - w)
    ).otherwise(F.array().cast("array<int>"))
    return (
        staged.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    gram_pos,
                    lambda p: F.struct(
                        p.alias("p"),
                        F.md5(
                            F.array_join(
                                F.slice(F.col("__toks"), p + 1, w), " "
                            )
                        ).alias("gh"),
                    ),
                )
            ).alias("__g"),
        )
        .select(
            id_col, F.col("__g.p").alias("__p"), F.col("__g.gh").alias("__gh")
        )
        .withColumn(
            # 2^31 multiplier: __p is a 32-bit int, so (id << 31) + p is
            # collision-free and order-preserving for any non-negative
            # numeric id < 2^32 — no silent key aliasing on huge docs
            "__key",
            F.col(id_col).cast("long") * 2147483648 + F.col("__p"),
        )
    )


def _span_rewrite(joined: DataFrame, id_col: str, w: int) -> DataFrame:
    """Rebuild stats from staged tokens + an optional __dup position
    array: drop every token under a duplicate window."""
    dup = F.coalesce(F.col("__dup"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("__toks"),
        lambda x, i: ~F.exists(dup, lambda p: (p <= i) & (i < p + w)),
    )
    return joined.select(
        F.col(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.md5(F.array_join(kept, " ")).alias("retained_md5"),
    )
