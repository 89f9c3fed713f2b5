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
        # full artifact written by bench.py next to the wrapper. The
        # mutable BENCH_LOCAL.json pointer belongs to the NEWEST run
        # only, so it must be sha-verified: r5 and r6 wrappers both
        # naming it made old-vs-new comparison silently self-compare.
        base = os.path.dirname(os.path.abspath(path))
        sha = found.get("full_sha")
        candidates = []
        if sha:
            # sha-named snapshots moved to bench_archive/ in r8; check
            # both homes so pre-r8 wrappers still resolve
            candidates.append(
                os.path.join(base, "bench_archive", f"BENCH_LOCAL-{sha}.json")
            )
            candidates.append(os.path.join(base, f"BENCH_LOCAL-{sha}.json"))
        candidates.append(os.path.join(base, found.get("full") or "BENCH_LOCAL.json"))
        import hashlib

        for full in candidates:
            if not os.path.exists(full):
                continue
            blob = open(full).read()
            if sha and hashlib.sha256(blob.encode()).hexdigest()[:8] != sha:
                continue  # stale pointer from a later run
            detail = json.loads(blob)
            if sha is None and abs(
                sum(detail.get("queries", {}).values()) - found["value"]
            ) > 0.05:
                continue  # pre-sha wrapper + mismatched totals: stale
            detail.update({k: found[k] for k in ("value", "n_ok", "n_errors")})
            detail["_full_path"] = full
            detail["_summary"] = found
            return detail
        # Pre-sha wrapper whose BENCH_LOCAL.json has since been
        # overwritten: the round's snapshot commit that recorded this
        # wrapper also committed the matching BENCH_LOCAL.json — recover
        # it from git history.
        import subprocess

        try:
            commit = subprocess.run(
                ["git", "-C", base, "log", "--format=%H", "-n", "1", "--",
                 os.path.basename(path)],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
            if commit:
                blob = subprocess.run(
                    ["git", "-C", base, "show", f"{commit}:BENCH_LOCAL.json"],
                    capture_output=True, text=True, check=True,
                ).stdout
                detail = json.loads(blob)
                if abs(
                    sum(detail.get("queries", {}).values()) - found["value"]
                ) <= 0.05:
                    detail.update(
                        {k: found[k] for k in ("value", "n_ok", "n_errors")}
                    )
                    detail["_full_path"] = f"git:{commit[:10]}:BENCH_LOCAL.json"
                    detail["_summary"] = found
                    return detail
        except (subprocess.CalledProcessError, OSError, json.JSONDecodeError):
            pass
        print(f"note: {path}: no sha-matching full artifact; "
              "falling back to the embedded 'slowest' tail", file=sys.stderr)
        found["queries"] = dict(found.get("slowest") or {})
    return found


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    if (
        sys.argv[1] != sys.argv[2]
        and old.get("_full_path")
        and old.get("_full_path") == new.get("_full_path")
    ):
        # Two different wrappers resolved to ONE full artifact (pre-r7
        # wrappers carry no full_sha): the older one would self-compare.
        # Degrade it to its own embedded tail instead of lying.
        print(
            f"warning: both artifacts resolve to {old['_full_path']}; "
            "using the OLD artifact's embedded 'slowest' tail only",
            file=sys.stderr,
        )
        old = dict(old["_summary"])
        old["queries"] = dict(old.get("slowest") or {})
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
    # streaming legs: throughput is better-is-higher, so the regression
    # direction flips (new < old/threshold). Informational only for the
    # exit code unless throughput halves — streaming numbers on a
    # shared host swing ±20% (r7's "drops" were all contention).
    so, sn = old.get("streaming") or {}, new.get("streaming") or {}
    stream_reg = []
    for k in sorted(set(so) & set(sn)):
        a, b = so[k], sn[k]
        if not (isinstance(a, dict) and isinstance(b, dict)):
            continue
        ra, rb = a.get("rows_per_sec"), b.get("rows_per_sec")
        if not ra or rb is None:
            continue
        print(
            f"stream {k}: {ra:,.0f} -> {rb:,.0f} rows/s ({rb / ra:.2f}x), "
            f"trigger {a.get('trigger_ms_avg', '?')} -> "
            f"{b.get('trigger_ms_avg', '?')} ms avg"
        )
        if rb < ra / 2:
            stream_reg.append(k)
    for k in stream_reg:
        print(f"STREAM REGRESSION {k}: throughput halved")
    sys.exit(1 if regressions or stream_reg or new.get("errors") else 0)


if __name__ == "__main__":
    main()
