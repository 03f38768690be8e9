"""Bloom-prefiltered semi join: prune the big side before the shuffle.

A semi join `fact ⋉ dim_keys` where the key set is too large to
broadcast as an exact hash set normally shuffles the ENTIRE fact table
on the join key. A Bloom filter built over the dim keys is tiny
(k bitmaps of m bits — size independent of key cardinality), broadcasts
under the fact scan, and rejects most non-matching fact rows with a
narrow O(k)-per-row expression — so the shuffle moves only probable
matches, and the exact semi join afterwards removes the false
positives. This is the manual, engine-portable version of Spark's
runtime bloom-filter join pruning (`spark.sql.optimizer.runtime.
bloomFilter.*`), kept explicit so the construction is deterministic
and replayable in the DuckDB oracle.

Construction is md5-based like the count-min sketch family
(sketches._cm_bucket): probe j of key x is the first ``hex_chars`` hex
chars of md5('b<j>:' + x) read as an integer bucket in [0, 16^hex_chars).
Each probe row is a '0'/'1' bitmap STRING of m chars; membership tests
one substr per probe. False negatives are impossible by construction
(the oracle's plain semi join verifies this end to end); the
false-positive rate is ~(1-(1-1/m)^n)^k — pick hex_chars so m >> n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast

__all__ = ["bloom_bucket", "bloom_bitmaps", "bloom_might_contain", "bloom_semi_join"]


def bloom_bucket(key: Column, probe: int, hex_chars: int = 3) -> Column:
    """Integer bucket of ``key`` for probe row ``probe``."""
    h = F.substring(F.md5(F.concat(F.lit(f"b{probe}:"), key)), 1, hex_chars)
    return F.conv(h, 16, 10).cast("int")


def bloom_bitmaps(
    keys: DataFrame, key_col: str, k_probes: int = 2, hex_chars: int = 3
) -> DataFrame:
    """ONE row with columns ``bm0..bm{k-1}``: per-probe bitmap strings
    of 16^hex_chars chars. Built by one map-side-combinable
    collect_set aggregation over the key set — the result is
    ~k * m / 8 bytes of state no matter how many keys went in."""
    m = 16**hex_chars
    key = F.col(key_col).cast("string")
    per = keys.select(
        *[bloom_bucket(key, j, hex_chars).alias(f"__b{j}") for j in range(k_probes)]
    )
    row = per.agg(
        *[F.collect_set(F.col(f"__b{j}")).alias(f"__s{j}") for j in range(k_probes)]
    )
    def _bit(j: int):
        # factory returning a SINGLE-ARG lambda: transform() reads
        # lambda arity, so a bound default arg would be mistaken for
        # the element-index slot (same gotcha as dedup's hash factories)
        return lambda i: F.when(
            F.array_contains(F.col(f"__s{j}"), i.cast("int")), "1"
        ).otherwise("0")

    return row.select(
        *[
            F.concat_ws(
                "", F.transform(F.sequence(F.lit(0), F.lit(m - 1)), _bit(j))
            ).alias(f"bm{j}")
            for j in range(k_probes)
        ]
    )


def bloom_might_contain(
    key: Column,
    bitmaps: "list[str] | None" = None,
    k_probes: int = 2,
    hex_chars: int = 3,
) -> Column:
    """Membership predicate: AND over probes of one dynamic substr
    each — O(k) per row. With ``bitmaps`` (literal strings) the
    predicate is self-contained; without, it references cross-joined
    ``bm*`` columns."""
    cond = F.lit(True)
    for j in range(k_probes):
        pos = bloom_bucket(key, j, hex_chars) + 1
        bm = F.lit(bitmaps[j]) if bitmaps is not None else F.col(f"bm{j}")
        cond = cond & (bm.substr(pos, F.lit(1)) == "1")
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    k_probes: int = 2,
    hex_chars: int = 3,
) -> DataFrame:
    """``fact ⋉ dim_keys`` with a Bloom prefilter before the exchange.

    The bitmaps are MATERIALIZED (one short aggregation job over the
    key set — k * m/8 bytes of result however many keys went in) and
    inlined as literals, exactly how Spark's own runtime bloom filter
    injects its subquery result. Inlining matters: expressed as a
    cross join, Catalyst's join reordering hoists the probe ABOVE the
    semi join, shuffling the whole fact table first — as a literal
    Filter it stays glued to the fact scan, so only probable matches
    reach the exchange, and the exact left-semi join afterwards
    removes the Bloom's false positives."""
    row = bloom_bitmaps(dim_keys, dim_key, k_probes, hex_chars).collect()[0]
    bitmaps = [row[f"bm{j}"] for j in range(k_probes)]
    pre = fact.filter(
        bloom_might_contain(
            F.col(fact_key).cast("string"), bitmaps, k_probes, hex_chars
        )
    )
    return pre.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)), fact_key, "left_semi"
    )
