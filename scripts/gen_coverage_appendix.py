"""Regenerate the declared-query inventory appendix in COVERAGE.md.

Usage: python scripts/gen_coverage_appendix.py
Rewrites everything from '## Appendix: declared-query inventory' to
EOF, AND refreshes every '<N> declared queries' prose count in
COVERAGE.md / README.md plus the '<N> queries' count in the PLANS.md
header line — three rounds of stale-count nits end here; a test
(tests/test_counts.py) pins every literal to the live registry.
"""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from cga_kinesis_to_elasticsearch_spark import plans  # noqa: E402

HEADER = "## Appendix: declared-query inventory"


def main() -> None:
    reg = plans.QUERY_REGISTRY
    n = len(reg)
    n_oracle = sum(1 for _, (_, sql) in reg.items() if sql is not None)
    rows_only = sorted(name for name, (_, sql) in reg.items() if sql is None)
    if rows_only:
        tail = (
            f"oracles; only {', '.join('`%s`' % r for r in rows_only)} "
            "stays rows-only."
        )
    else:
        tail = "oracles; every declared query is value-hash-checked."
    lines = [
        HEADER,
        "",
        f"{n} declared queries; {n_oracle} with full DuckDB value-hash",
        tail,
        "",
        "| query | oracle | summary |",
        "|---|---|---|",
    ]
    for name in sorted(reg):
        fn, sql = reg[name]
        doc = (fn.__doc__ or "").strip().splitlines()
        summary = doc[0].strip() if doc else ""
        kind = "value-hash" if sql is not None else "rows-only"
        lines.append(f"| `{name}` | {kind} | {summary} |")
    root = pathlib.Path(__file__).resolve().parent.parent
    path = root / "COVERAGE.md"
    text = path.read_text()
    head = text.split(HEADER)[0].rstrip() + "\n\n"
    path.write_text(head + "\n".join(lines) + "\n")
    print(f"wrote appendix: {n} queries ({n_oracle} value-hash)")

    # refresh every prose count literal (the stale-count class)
    for fname in ("COVERAGE.md", "README.md"):
        p = root / fname
        t = p.read_text()
        t2 = re.sub(r"\b\d+ declared queries", f"{n} declared queries", t)
        if t2 != t:
            p.write_text(t2)
            print(f"refreshed prose count in {fname}")
    plans_md = root / "PLANS.md"
    if plans_md.exists():
        lines_md = plans_md.read_text().splitlines(keepends=True)
        first = re.sub(r"\b\d+ queries\)", f"{n} queries)", lines_md[0])
        if first != lines_md[0]:
            plans_md.write_text(first + "".join(lines_md[1:]))
            print("refreshed header count in PLANS.md")


if __name__ == "__main__":
    main()
