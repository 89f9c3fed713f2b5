"""Diff two bench artifacts and flag per-query regressions.

Usage: python scripts/compare_bench.py OLD.json NEW.json [threshold]

Accepts either a raw bench.py JSON line or the driver's BENCH_r{N}.json
wrapper (extracts the embedded JSON line from its "tail"). Exit code 1
if any common query regressed more than threshold (default 1.5x) AND
by more than 0.5s absolute — mirrors the round-3 SCALING.md audit.
"""

from __future__ import annotations

import json
import os
import re
import sys


def load(path: str) -> dict:
    raw = json.load(open(path))
    if "queries" in raw:
        return raw
    # Driver wrapper: the tail holds the compact summary line (last, always
    # whole) and possibly a clipped full line before it. Walk lines from the
    # end and take the first parseable bench object.
    found = None
    for line in reversed(raw.get("tail", "").splitlines()):
        if '"metric"' not in line:
            continue
        m = re.search(r'\{"metric".*\}', line)
        if not m:
            continue
        try:
            found = json.loads(m.group(0))
            break
        except json.JSONDecodeError:
            continue
    if found is None:
        raise SystemExit(f"{path}: no bench JSON line found")
    if "queries" not in found:
        # compact summary — pull per-query timings from the committed
        # full artifact written by bench.py next to the wrapper
        full = os.path.join(os.path.dirname(os.path.abspath(path)),
                            found.get("full") or "BENCH_LOCAL.json")
        if os.path.exists(full):
            detail = json.load(open(full))
            detail.update({k: found[k] for k in ("value", "n_ok", "n_errors")})
            return detail
        found["queries"] = dict(found.get("slowest") or {})
    return found


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    regressions = []
    for k in common:
        if nq[k] > threshold * oq[k] and nq[k] - oq[k] > 0.5:
            regressions.append((k, oq[k], nq[k], nq[k] / oq[k]))
    print(
        f"common: {len(common)}  old_total: {sum(oq[k] for k in common):.1f}s"
        f"  new_total: {sum(nq[k] for k in common):.1f}s"
    )
    print(f"new-only: {sorted(set(nq) - set(oq))}")
    print(f"dropped: {sorted(set(oq) - set(nq))}")
    if new.get("errors"):
        print(f"NEW ERRORS: {new['errors']}")
    for k, a, b, r in sorted(regressions, key=lambda x: -x[3]):
        print(f"REGRESSION {k}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    if not regressions:
        print(f"no regressions beyond {threshold}x (+0.5s absolute)")
    sys.exit(1 if regressions or new.get("errors") else 0)


if __name__ == "__main__":
    main()
