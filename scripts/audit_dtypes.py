#!/usr/bin/env python3
"""Cross-engine pandas-dtype audit: for every oracle-checked query,
compare the pandas dtype of each output column as produced by Spark's
toPandas() vs DuckDB's fetchdf().

Why: the driver's canonicalizer compares the two pandas frames — a
column that lands int64 on one side and float64 on the other (e.g.
DuckDB sum(BIGINT) returns HUGEINT, which pandas renders as float64)
can hash-mismatch even when every value is numerically identical. Fix
is always on the ORACLE side: CAST(sum(...) AS BIGINT). NULLable int
columns are fine — BOTH engines' pandas conversions promote them to
float64, so they stay consistent.

Usage: python scripts/audit_dtypes.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from cga_kinesis_to_elasticsearch_spark.plans import QUERY_REGISTRY
    from cga_kinesis_to_elasticsearch_spark.session import get_spark

    spark = get_spark("dtype-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    bad = 0
    for name, (fn, sql) in sorted(QUERY_REGISTRY.items()):
        if sql is None:
            continue
        try:
            odf = con.execute(sql).fetchdf()
            sdf = fn(spark, sf).toPandas()
        except Exception as exc:
            print(f"ERR   {name}: {exc}")
            bad += 1
            continue
        for c in odf.columns:
            if c not in sdf.columns:
                continue
            ok, sk = odf[c].dtype.kind, sdf[c].dtype.kind
            if {ok, sk} <= {"i", "u"} or ok == sk:
                continue
            print(
                f"DTYPE {name}.{c}: duckdb {odf[c].dtype} vs spark "
                f"{sdf[c].dtype} (nulls o={int(odf[c].isna().sum())} "
                f"s={int(sdf[c].isna().sum())})"
            )
            bad += 1
    print(f"\n{bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
