#!/usr/bin/env python3
"""Synthesize a larger, referentially-consistent copy of a testdata SF
dir by replicating every table K times with per-copy key offsets —
a MEASURING INSTRUMENT for core-scaling sweeps, not an oracle input.

Rationale (r09 verdict item 6): at sf0.1 every headline query is
dominated by fixed driver/job overhead, so 8-core vs 32-core wall
ratios read ≈1 and the bench cannot distinguish plan quality from the
scheduling floor. The driver's testdata tops out at sf0.1 and is
read-only; this generator upsamples it deterministically (copy k
shifts every primary/foreign key of the big tables by k * offset, so
join fan-outs and per-key cardinalities are preserved exactly) into a
separate directory that queries() can consume via their sf_dir
argument. Value distributions (dates, prices, text, vectors) are the
originals, unchanged.

Usage: python scripts/gen_scale_data.py [src_dir] [dst_dir] [K]
Defaults: /root/testdata/sf0.1 /root/sfgen/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

# per-copy id offsets: comfortably above each table's max key, and
# multiples of nothing queries filter on (keys are only joined/grouped,
# never range-filtered in the registry). documents stays < 2^32 / 2^31
# per span_dedup's key-encoding contract.
OFF = {
    "custkey": 1_000_000,
    "suppkey": 100_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}

# table -> {column: offset-key}; nation/region are dimension constants
# shared by every copy (FK columns to them are left untouched).
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_AS_IS = ("region", "nation")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/sfgen/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from cga_kinesis_to_elasticsearch_spark.io import load_table
    from cga_kinesis_to_elasticsearch_spark.session import get_spark

    spark = get_spark("gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    # NOT the INT96 default: pyarrow reports INT96 as timestamp[ns],
    # which would trip load_table's nanos-repair probe on read-back
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    Path(dst).mkdir(parents=True, exist_ok=True)

    # load_table (not a raw read): it repairs the testdata's INT64
    # TIMESTAMP(NANOS) columns into proper TimestampType, so the copies
    # land as plain micros timestamps that any consumer reads directly
    for t in COPY_AS_IS:
        load_table(spark, src, t).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied")

    for t, shifts in SHIFTS.items():
        base = load_table(spark, src, t)
        copies = []
        for i in range(k):
            c = base
            for col, key in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * OFF[key]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # spread output files so downstream scans start parallel (the
        # sf0.1 originals are single row groups — fine at that size,
        # but a 10x table in one row group would serialize every scan)
        out.repartition(16).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows ({k}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
