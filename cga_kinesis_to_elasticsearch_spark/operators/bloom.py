"""Bloom-prefiltered semi join: prune the big side before the shuffle.

A semi join `fact ⋉ dim_keys` where the key set is too large to
broadcast as an exact hash set normally shuffles the ENTIRE fact table
on the join key. A Bloom filter built over the dim keys is tiny
(k bit-arrays of m bits — size independent of key cardinality), inlines
as a literal under the fact scan, and rejects most non-matching fact
rows with a narrow O(k)-per-row expression — so the shuffle moves only
probable matches, and the exact semi join afterwards removes the false
positives. This is the manual, engine-portable version of Spark's
runtime bloom-filter join pruning (`spark.sql.optimizer.runtime.
bloomFilter.*`), kept explicit so the construction is deterministic
and replayable in the DuckDB oracle.

Hashing is md5-based like the count-min sketch family
(sketches._cm_bucket): probe j of key x is hex WINDOW j of ONE shared
md5('b:' + x) — chars [j*hex_chars+1, (j+1)*hex_chars] — read as an
integer bucket in [0, 16^hex_chars); md5's hex chars are uniform and
independent, so each window is an independent hash at one hash's cost
(see bloom_bucket). Bits are PACKED 32 PER INT WORD and probed with
``element_at`` + ``getbit`` — O(1) per probe. (The representation
matters: a '0'/'1' bitmap STRING costs O(position) per probe because
UTF8 substring must scan from the start — measured 180+ s for 600k
rows against a 64Ki-char literal, vs milliseconds for the packed
words.) False negatives are impossible by construction (the oracle's
plain semi join verifies this end to end); the false-positive rate is
~(1-(1-1/m)^n)^k — pick hex_chars so m >> n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "bloom_bucket",
    "build_bloom",
    "bloom_might_contain",
    "bloom_prefilter",
    "bloom_semi_join",
]

WORD_BITS = 32


def _words_lit(probe_words: list[int]) -> Column:
    """Literal BIGINT array of packed filter words, built as ONE parsed
    SQL expression. ``F.lit(list)`` constructs the array literal
    element by element over py4j — measured ~1.7 s of pure driver time
    for the default 2x2048-word filter (each element is a JVM
    round-trip), vs ~1 ms to parse the equivalent ``array(...)`` SQL
    string. Same Catalyst literal either way (constant-folded before
    execution)."""
    return F.expr("array(" + ",".join(f"{int(w)}L" for w in probe_words) + ")")


def bloom_bucket(key: Column, probe: int, hex_chars: int = 4) -> Column:
    """Integer bucket of ``key`` for probe ``probe``: hex window
    ``probe`` of ONE shared md5 — md5's hex chars are uniform and
    independent, so each window is an independent hash at no extra
    hashing cost (the same one-md5-serves-all trick as the MinHash
    and SimHash operators). Requires (probe+1)*hex_chars <= 32."""
    if (probe + 1) * hex_chars > 32:
        raise ValueError("bloom probes exhaust the md5 hex budget")
    h = F.substring(F.md5(F.concat(F.lit("b:"), key)), probe * hex_chars + 1, hex_chars)
    # long, not int: 8 hex chars reach 2^32-1, and an int cast would
    # throw under ANSI (or NULL without it — silent false negatives)
    return F.conv(h, 16, 10).cast("long")


def build_bloom(
    keys: DataFrame, key_col: str, k_probes: int = 2, hex_chars: int = 4
) -> list[list[int]]:
    """Materialize the filter: ``k_probes`` lists of 16^hex_chars / 32
    int words (m/8 bytes per probe, however many keys went in). One
    short map-side-combinable job: (probe, bucket) rows bit_or'd into
    per-word values — duplicates are harmless under OR, so no distinct
    pre-shuffle, and the exchange carries at most k * m/32 partial
    rows. Like Spark's own runtime bloom filter, the result is
    collected and inlined as a plan literal."""
    m = 16**hex_chars
    n_words = m // WORD_BITS
    # NULL keys have no buckets (and would land a NULL word index);
    # they also never match on the probe side — equi-join semantics.
    keys = keys.filter(F.col(key_col).isNotNull())
    key = F.col(key_col).cast("string")
    buckets = keys.select(
        F.posexplode(
            F.array(*[bloom_bucket(key, j, hex_chars) for j in range(k_probes)])
        ).alias("probe", "bucket")
    )
    words = (
        buckets.groupBy(
            "probe",
            F.floor(F.col("bucket") / WORD_BITS).cast("int").alias("wi"),
        )
        # bit_or makes duplicate buckets harmless — no distinct()
        # pre-shuffle needed; pow stays exact (doubles are exact
        # integers below 2^53)
        .agg(
            F.bit_or(
                F.pow(F.lit(2.0), F.col("bucket") % WORD_BITS).cast("long")
            ).alias("wv")
        )
        .collect()
    )
    out = [[0] * n_words for _ in range(k_probes)]
    for r in words:
        out[r.probe][r.wi] = int(r.wv)
    return out


def bloom_might_contain(
    key: Column,
    words: list[list[int]],
    hex_chars: int = 4,
) -> Column:
    """Membership predicate over literal word arrays: per probe, one
    O(1) ``element_at`` into the literal array plus one ``getbit`` —
    no join, nothing for Catalyst to reorder away from the scan."""
    cond = F.lit(True)
    for j, probe_words in enumerate(words):
        b = bloom_bucket(key, j, hex_chars)
        w = F.element_at(
            _words_lit(probe_words), (F.floor(b / WORD_BITS) + 1).cast("int")
        )
        cond = cond & (
            F.call_function("getbit", w, b.bitwiseAND(F.lit(WORD_BITS - 1))) == 1
        )
    return cond


def bloom_prefilter(
    df: DataFrame,
    key: Column,
    words: list[list[int]],
    hex_chars: int = 4,
) -> DataFrame:
    """``df`` filtered to rows whose ``key`` probably appears in the
    filter, with the shared md5 evaluated ONCE per row.

    ``bloom_might_contain`` is a pure Column predicate, but each probe
    reference re-evaluates the md5: Catalyst does not CSE across
    conjuncts, and staging the hash with ``withColumn`` doesn't help —
    ``PushPredicateThroughNonJoin`` substitutes the alias back into the
    pushed-down predicate, restoring one md5 PER REFERENCE (measured
    2x the scan cost at 2 probes). The fix: read ALL probe windows with
    one ``conv`` over the concatenated hex span, and bind that value
    through ``explode(array(h))`` — a Generate is a predicate-pushdown
    barrier, so the filter stays above it and the hash evaluates
    exactly once. Bucket values are bit-identical to per-window
    ``bloom_bucket`` (window j = digits of H in base 16^hex_chars), so
    filters built by ``build_bloom`` — and the DuckDB oracle replay —
    need no change.

    Falls back to the per-probe predicate when the combined span
    exceeds 15 hex chars (conv's exact-long budget) — at the default
    2x4 chars the fused path always applies."""
    k_probes = len(words)
    span = k_probes * hex_chars
    if span > 15:
        return df.filter(bloom_might_contain(key, words, hex_chars))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("b:"), key)), 1, span), 16, 10
    ).cast("long")
    staged = df.select("*", F.explode(F.array(h)).alias("__bloom_h"))
    m = 16**hex_chars
    cond = F.lit(True)
    for j, probe_words in enumerate(words):
        div = m ** (k_probes - 1 - j)
        b = F.col("__bloom_h")
        if div > 1:
            # integer floor division: exact for the whole 15-hex conv
            # budget (a float divide would round above 2^53 — 13.25
            # hex chars — and probe the wrong word near carry
            # boundaries)
            b = F.expr(f"__bloom_h DIV {div}L")
        b = b % m
        w = F.element_at(
            _words_lit(probe_words), (F.floor(b / WORD_BITS) + 1).cast("int")
        )
        cond = cond & (
            F.call_function("getbit", w, b.bitwiseAND(F.lit(WORD_BITS - 1))) == 1
        )
    return staged.filter(cond).drop("__bloom_h")


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    k_probes: int = 2,
    hex_chars: int = 4,
) -> DataFrame:
    """``fact ⋉ dim_keys`` with a Bloom prefilter before the exchange.

    The filter words are MATERIALIZED (one short job over the key set)
    and inlined as literals, exactly how Spark's own runtime bloom
    filter injects its subquery result. Inlining matters: expressed as
    a cross join, Catalyst's join reordering hoists the probe ABOVE
    the semi join, shuffling the whole fact table first — as a literal
    Filter it stays glued to the fact scan, so only probable matches
    reach the exchange, and the exact left-semi join afterwards
    removes the Bloom's false positives."""
    words = build_bloom(dim_keys, dim_key, k_probes, hex_chars)
    pre = bloom_prefilter(
        fact, F.col(fact_key).cast("string"), words, hex_chars
    )
    return pre.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)), fact_key, "left_semi"
    )
