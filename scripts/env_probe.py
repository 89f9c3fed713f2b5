"""Engine-version probe (VERDICT r10 next-step #1a).

The r10 driver graded three engine-surface certificates red
(`xml_extract_orders`, `codec_roundtrip_suite`, `mixture_sample_docs`)
that were bit-identical Spark-vs-DuckDB in THIS environment in three
session configurations — the leading hypothesis is that the grading
environment runs different engine versions than the repo venv. This
probe records every version a hash-certificate can be sensitive to
(pyspark, the JVM behind it, duckdb, pyarrow, pandas, numpy, python)
so the next divergence is diagnosable: compare the committed
`ENV_PROBE.json` against the grading round's red rows.

Usage:
    python scripts/env_probe.py          # prints + writes ENV_PROBE.json
    from scripts.env_probe import probe  # dict for embedding in artifacts

`probe()` is also embedded into every `BENCH_LOCAL.json` under "env"
(bench.py) so each archived bench run carries its engine fingerprint.
"""

from __future__ import annotations

import json
import os
import platform
import sys


def probe(spark=None) -> dict:
    """Versions of every engine a value-hash certificate touches.

    Never raises: a missing import is reported as None — the probe
    must be embeddable in artifacts whose emission cannot fail.
    """
    out: dict[str, str | None] = {
        "python": platform.python_version(),
        "platform": platform.platform(),
    }
    for mod in ("pyspark", "duckdb", "pyarrow", "pandas", "numpy"):
        try:
            out[mod] = __import__(mod).__version__
        except Exception:  # noqa: BLE001 - absence is the finding
            out[mod] = None
    out["java_home"] = os.environ.get("JAVA_HOME")
    # The JVM actually executing the plans (only reachable through a
    # live session; spark.version is the pyspark dist, already above).
    if spark is not None:
        try:
            out["jvm"] = spark.sparkContext._jvm.System.getProperty(
                "java.version"
            )
        except Exception:  # noqa: BLE001
            out["jvm"] = None
    return out


def main() -> None:
    result = probe()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "ENV_PROBE.json")
    with open(path, "w") as fh:
        fh.write(json.dumps(result, indent=1))
    json.dump(result, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
