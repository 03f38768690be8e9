#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each declared
query on Spark AND its oracle SQL on DuckDB over the same parquet, then
compare row count, schema (column names) and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(
    name: str, sdf: pd.DataFrame, odf: pd.DataFrame
) -> tuple[list[str], int]:
    problems = []
    notes = 0
    if len(sdf) != len(odf):
        problems.append(f"row count {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        return problems, notes
    a, b = normalize(sdf), normalize(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype) != str(bv.dtype):
                if av.dtype.kind == bv.dtype.kind == "i":
                    # same-kind width difference (int32 vs int64): the
                    # driver's canonicalizer provably tolerates this
                    # (round-1 hash matches on int32 outputs) — but the
                    # repo convention is width-note-free (BIGINT both
                    # sides), so notes count toward a non-zero exit
                    print(f"note  {name}.{c}: int width {av.dtype} vs {bv.dtype}")
                    notes += 1
                else:
                    # int-vs-float / numeric-vs-object CAN hash-mismatch
                    problems.append(
                        f"col {c}: DTYPE MISMATCH {av.dtype} vs {bv.dtype}"
                    )
            try:
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    import numpy as np

                    af = av.astype(float)
                    bf = bv.astype(float)
                    both_nan = af.isna() & bf.isna()
                    exact = (af == bf) | both_nan
                    if not exact.all():
                        close = np.isclose(af.fillna(0), bf.fillna(0), rtol=1e-9, atol=1e-12) | both_nan
                        n_ex = int((~exact).sum())
                        if close.all():
                            problems.append(
                                f"col {c}: {n_ex} rows differ in last-ulp only (HASH RISK)"
                            )
                        else:
                            idx = (~close).idxmax()
                            problems.append(
                                f"col {c}: VALUE MISMATCH e.g. {af[idx]} vs {bf[idx]}"
                            )
                else:
                    if not (av.fillna("<N>") == bv.fillna("<N>")).all():
                        neq = av.fillna("<N>") != bv.fillna("<N>")
                        idx = neq.idxmax()
                        problems.append(
                            f"col {c}: VALUE MISMATCH e.g. {av[idx]!r} vs {bv[idx]!r} ({int(neq.sum())} rows)"
                        )
            except Exception as exc:
                problems.append(f"col {c}: compare error {exc}")
    return problems, notes


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib.util

    spec = importlib.util.spec_from_file_location("entry", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    if os.environ.get("SPARK_GRAFT_DRIVER_SIM"):
        # Emulate the correctness driver's session: a host-owned
        # SparkSession with TIMESTAMP_NTZ as the default timestamp type
        # and none of our engine confs pre-applied. Queries must survive
        # this via tune_session + load_table normalization alone.
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("oracle-check-driver-sim")
            .config("spark.sql.timestampType", "TIMESTAMP_NTZ")
            .getOrCreate()
        )
    else:
        from cga_kinesis_to_elasticsearch_spark.session import get_spark

        spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = 0
    total_notes = 0
    n_ok = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf_spark = fn(spark, sf_dir)
            # The driver's canonicalizer sorts on every output column and
            # crashes on array/map/struct cells (unhashable ndarray) —
            # flag complex types as hard failures here too.
            complex_cols = [
                f.name
                for f in sdf_spark.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct", "binary")
            ]
            if complex_cols:
                print(
                    f"FAIL  {name}: complex output columns {complex_cols} "
                    "(driver canon cannot sort these — stringify them)"
                )
                failures += 1
                continue
            sdf = sdf_spark.toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems, notes = compare(name, sdf, odf)
        total_notes += notes
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            n_ok += 1
            print(f"OK    {name}: {len(sdf)} rows")
    # notes are non-zero-exit too: the repo convention is width-note-free
    # (every surfaced integer BIGINT on both sides) so a note is a
    # regression even though the driver's hash happens to tolerate it
    print(f"\n{n_ok} OK, {failures} failures, notes={total_notes}")
    return 1 if (failures or total_notes) else 0


if __name__ == "__main__":
    raise SystemExit(main())
