"""Regenerate docs/QUERIES.md: one row per registered query with its
check type and first docstring line. Run: python scripts/dump_query_catalog.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    ORACLE,
    QUERIES,
)


def main() -> None:
    lines = [
        "# QUERIES — driver-contract catalog",
        "",
        f"{len(QUERIES)} named queries; {len(ORACLE)} DuckDB-oracle-backed "
        "(value-hash checked at sf0.01), the rest rows-only with unit-test "
        "coverage (see PARITY.md).",
        "",
        "| query | check | summary |",
        "|---|---|---|",
    ]
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        doc = (fn.__doc__ or "").strip().splitlines()
        # first full sentence of the first paragraph (not the first
        # physical line — docstrings wrap at ~72 cols mid-sentence)
        para: list[str] = []
        for ln in doc:
            if not ln.strip():
                break
            para.append(ln.strip())
        flat = " ".join(para)
        # first sentence end that is NOT an abbreviation (e.g./i.e./…)
        import re

        end = None
        for m in re.finditer(r"[.!?] ", flat):
            head = flat[: m.start()].rsplit(None, 1)
            last = head[-1].lower() if head else ""
            if last in ("e.g", "i.e", "vs", "etc", "cf", "al", "resp"):
                continue
            end = m.start() + 1
            break
        summary = flat[:end] if end else flat
        summary = summary.replace("|", "\\|")
        check = "oracle" if name in ORACLE else "rows-only"
        lines.append(f"| `{name}` | {check} | {summary} |")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "QUERIES.md",
    )
    # Preserve the hand-written prose (queue policy, rotation history)
    # that follows the generated table: everything from the first "## "
    # heading onward survives regeneration.
    prose = ""
    if os.path.exists(out):
        with open(out) as f:
            old = f.read()
        idx = old.find("\n## ")
        if idx != -1:
            prose = old[idx:]
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + prose)
    print(f"wrote {out} ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
