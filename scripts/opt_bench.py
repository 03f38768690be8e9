#!/usr/bin/env python3
"""Optimization-round measurement helper (guide §1).

Times named declared queries through the noop sink (best-of-N, warm)
at a given SF dir and optionally dumps .explain("formatted") to
plans/r10/<query>_<suffix>.txt.

Usage:
  python scripts/opt_bench.py [--sf DIR] [--runs N] [--explain SUFFIX] q1 q2 ...
  python scripts/opt_bench.py --all            # whole bench.py HEADLINE list
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None, help="suffix: write plans/r10/<q>_<suffix>.txt")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location("entry", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from cga_kinesis_to_elasticsearch_spark.session import get_spark

    spark = get_spark("opt-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()

    names = args.names
    if args.all:
        import bench

        names = list(bench.HEADLINE)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    # warm codegen once per query at the smallest SF
    for n in names:
        with contextlib.suppress(Exception):
            qs[n](spark, args.warm_sf).write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {}
    for n in names:
        spark.sparkContext.setJobGroup(f"opt-bench:{n}", n)
        samples = []
        err = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            try:
                qs[n](spark, args.sf).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                err = f"{type(exc).__name__}: {exc}"[:160]
                break
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobGroup("opt-bench:tail", "tail")
        out[n] = {"best": min(samples), "all": samples} if samples else {"error": err}
        print(json.dumps({n: out[n]}), flush=True)
        if args.explain and samples:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[n](spark, args.sf).explain("formatted")
            p = REPO / "plans" / "r10" / f"{n}_{args.explain}.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(buf.getvalue())

    # per-query executor-time attribution (same best-effort REST path
    # as bench.py — exec covers all --runs runs of a query)
    try:
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId

        def _get(path):
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}{path}", timeout=10
            ) as r:
                return json.loads(r.read().decode())

        stage_ms = {
            st["stageId"]: st.get("executorRunTime", 0)
            for st in _get("/stages?status=complete")
        }
        exec_sec: dict[str, float] = {}
        for job in _get("/jobs"):
            grp = job.get("jobGroup") or ""
            if grp.startswith("opt-bench:") and grp[10:] in out:
                q = grp[10:]
                ms = sum(stage_ms.get(s, 0) for s in job.get("stageIds", []))
                exec_sec[q] = round(exec_sec.get(q, 0.0) + ms / 1000.0, 3)
        if exec_sec:
            print(json.dumps({"exec_sec_all_runs": exec_sec}))
    except Exception:  # noqa: BLE001
        pass

    total = sum(v["best"] for v in out.values() if isinstance(v, dict) and "best" in v)
    print(json.dumps({"total_best": round(total, 3), "n": len(out)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
