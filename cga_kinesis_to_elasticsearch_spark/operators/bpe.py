"""Distributed BPE tokenizer training (iterative merge learning).

``plans/corpus.bpe_merge_pairs`` exposes ONE merge iteration's pair
counts; this module runs the full classic BPE training loop (Sennrich
et al. 2016) on a Spark cluster:

1. one corpus scan builds the WORD-FREQUENCY table — the working set
   for every later iteration is vocabulary-sized, not corpus-sized
   (the standard trick that makes BPE training tractable);
2. per iteration: adjacent-symbol pair counts weighted by word
   frequency (a map-side-combinable agg over the small word table),
   argmax pair with a deterministic (count DESC, pair ASC) tiebreak,
   then the merge applied to every word's symbol array with an exact
   greedy left-to-right fold — the same non-overlapping semantics as
   the reference implementation (verified token-for-token against a
   pure-Python BPE in tests);
3. ``localCheckpoint`` truncates the word table's lineage each round
   (the iterative-plan-growth trap, same as connected_components).

The driver sees one argmax row per iteration; the word table never
leaves the cluster. Iterative argmax-then-rewrite is not expressible
in one SQL statement, so the declared query is rows-only — quality is
pinned by the reference-equality tests instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = ["bpe_word_freqs", "apply_merge", "bpe_train", "bpe_encode"]


def bpe_word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms) — distinct words of the normalized corpus
    with counts and their initial character-symbol arrays."""
    from .dedup import normalized_text

    words = df.select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("word")
    ).filter(F.col("word") != "")
    freqs = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    syms = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return freqs.select("word", "freq", syms.alias("syms"))


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping application of merge
    (left, right) -> left+right on a symbol-array column, as an exact
    JVM fold: the accumulator carries (emitted symbols, pending
    symbol); a pending ``left`` followed by ``right`` emits the merged
    symbol and clears, anything else flushes the pending symbol. ''
    is a safe pending sentinel — symbols are never empty."""
    merged = F.lit(left + right)

    def step(acc, x):
        flush = F.when(
            acc["pend"] == "", acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))
        return F.when(
            (acc["pend"] == left) & (x == right),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit("").alias("pend"),
            ),
        ).otherwise(F.struct(flush.alias("out"), x.alias("pend")))

    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit("").alias("pend"),
        ),
        step,
        lambda acc: F.when(acc["pend"] == "", acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("syms") - 1, F.lit(0))),
        lambda i: F.struct(
            F.element_at("syms", i.cast("int")).alias("l"),
            F.element_at("syms", (i + 1).cast("int")).alias("r"),
        ),
    )
    return (
        words.filter(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("n"))
    )


def bpe_train(
    spark: SparkSession, df: DataFrame, text_col: str, n_merges: int = 8
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns
    ``(rank LONG, left STRING, right STRING, pair_count LONG)`` in
    learned order. Stops early if no pair occurs twice."""
    words = bpe_word_freqs(df, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0].n < 2:
            break
        l, r, n = top[0].l, top[0].r, top[0].n
        merges.append((rank, l, r, int(n)))
        words = words.select(
            "word", "freq", apply_merge(F.col("syms"), l, r).alias("syms")
        ).localCheckpoint()
    return spark.createDataFrame(
        merges or [(None, None, None, None)],
        "rank long, left string, right string, pair_count long",
    ).filter(F.col("rank").isNotNull())


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a learned merge sequence to every document — the
    TOKENIZE side of bpe_train, completing the train->encode loop a
    tokenizer pipeline needs. Returns
    ``(id, n_words, n_tokens, n_chars)`` where n_tokens is the
    post-merge symbol count (chars collapse as merges apply).

    Scale shape: the merge fold runs once per DISTINCT word (the
    vocabulary table — Zipf-small vs the corpus), not per occurrence;
    documents then join the encoded vocabulary (broadcast — vocabulary
    << corpus) and aggregate per doc. Each merge is one exact JVM
    fold (apply_merge), chained in rank order; expression depth grows
    with len(merges), so large merge lists (10k+) belong in a
    vectorized Pandas-UDF encoder — the structure (vocab-level encode,
    broadcast join back) is the part that matters at scale and stays
    identical."""
    from .dedup import normalized_text

    occ = df.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "word"
        ),
    ).filter(F.col("word") != "")
    vocab = occ.groupBy("word").agg(F.count(F.lit(1)).alias("__n_occ"))
    syms = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    for left, right in merges:
        syms = apply_merge(syms, left, right)
    encoded = vocab.select(
        "word",
        F.size(syms).alias("__w_tokens"),
        F.length("word").alias("__w_chars"),
    )
    return (
        occ.join(F.broadcast(encoded), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__w_tokens").alias("n_tokens"),
            F.sum("__w_chars").alias("n_chars"),
        )
    )
