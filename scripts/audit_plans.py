#!/usr/bin/env python3
"""Physical-plan audit across the whole declared-query surface: for
every query, count the scale-critical plan features (hash exchanges,
sort-merge joins, broadcast joins, cartesian products, Python stages,
window ops) so regressions that only a human would spot in one plan
show up as a diffable table.

Usage: python scripts/audit_plans.py [sf_dir] > PLANS.txt
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from cga_kinesis_to_elasticsearch_spark.plans import queries
    from cga_kinesis_to_elasticsearch_spark.session import get_spark

    spark = get_spark("plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    rows = []
    for name, fn in sorted(queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # streaming-only queries can't explain here
            rows.append((name, f"SKIP ({type(exc).__name__})"))
            continue
        lines = plan.splitlines()
        feats = {
            "xchg": sum(1 for l in lines if "Arguments: hashpartitioning" in l),
            "smj": plan.count(") SortMergeJoin"),
            "bhj": plan.count(") BroadcastHashJoin"),
            "bnlj": plan.count(") BroadcastNestedLoopJoin"),
            "cart": plan.count(") CartesianProduct"),
            "win": sum(1 for l in lines if re.match(r"^\s*\(\d+\) Window", l)),
            "py": sum(
                1
                for l in lines
                if re.search(r"\) (ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)", l)
            ),
        }
        rows.append(
            (
                name,
                " ".join(f"{k}={v}" for k, v in feats.items() if v)
                or "narrow",
            )
        )

    width = max(len(n) for n, _ in rows)
    for name, desc in rows:
        print(f"{name:<{width}}  {desc}")

    # hard red flags: an unintentional cross product anywhere
    bad = [n for n, d in rows if "cart=" in d]
    if bad:
        print(f"\nCARTESIAN PRODUCTS in: {', '.join(bad)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
