"""Static gates over every registered oracle SQL string.

Each closed engine-drift class gets a mechanical re-entry guard, so a
NEW query cannot silently reintroduce a retired pattern (the decimal
final-surface class has its guard inside `oracle_harness.compare` and
`test_plan_hygiene`; these cover the SQL-text-level classes).
"""

from __future__ import annotations

import re

import pytest

from sentiment_analysis_of_reviews_with_spark_ml_and_spark_streaming_spark.plans.queries import (
    ORACLE,
)


def _clause_bodies(sql: str, opener: re.Pattern) -> list[str]:
    """Paren-balanced bodies of every `opener(`-introduced clause."""
    out = []
    for m in opener.finditer(sql):
        start = m.end() - 1
        depth, i = 0, start
        while i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        out.append(sql[start + 1 : i])
    return out


_OVER = re.compile(r"\bOVER\s*\(", re.I)
_NAMED = re.compile(r"\bWINDOW\s+\w+\s+AS\s*\(", re.I)
_ORDER_KEY = re.compile(r"ORDER\s+BY", re.I)
_NULLS = re.compile(r"NULLS\s+(FIRST|LAST)", re.I)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_window_order_by_states_null_position(name):
    """Every window-function ORDER BY must qualify its null position
    explicitly (r12 campaign): Spark sorts nulls FIRST ascending where
    DuckDB sorts them LAST (and the reverse descending), so an
    unqualified window ORDER BY is a latent registry-wide hash flip
    waiting on the first fixture regen that carries nulls."""
    sql = ORACLE[name]
    for body in _clause_bodies(sql, _OVER) + _clause_bodies(sql, _NAMED):
        ob = _ORDER_KEY.search(body)
        if not ob:
            continue
        # every top-level sort key must carry a NULLS qualifier; cheap
        # proxy: at least one qualifier per key (comma count at depth 0
        # of the key section + 1)
        tail = body[ob.end():]
        stop = re.search(r"\b(ROWS|RANGE|GROUPS)\b", tail, re.I)
        keys_text = tail[: stop.start()] if stop else tail
        depth, n_keys = 0, 1
        for ch in keys_text:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                n_keys += 1
        n_quals = len(_NULLS.findall(keys_text))
        assert n_quals >= n_keys, (
            f"{name}: window ORDER BY with {n_keys} key(s) carries only "
            f"{n_quals} NULLS qualifier(s) — state the null position "
            f"explicitly on every key (docs/QUERIES.md r12 rotation "
            f"note):\n{body[:200]}"
        )


def test_no_bare_whitespace_shorthand_in_oracle_regexes():
    """Java's \\s includes \\x0B where RE2's does not — whitespace
    shorthand inside an oracle regex silently diverges from the Spark
    twin on vertical-tab text (r11 ADVICE; swept registry-wide in
    r12). New SQL must spell the class out, e.g.
    `[ \\t\\n\\x0B\\f\\r]+` (see textstats.TRAILING_WS_PATTERN)."""
    offenders = {}
    for name, sql in ORACLE.items():
        hits = [
            ln.strip()[:100]
            for ln in sql.splitlines()
            if ("\\s" in ln or "\\S" in ln)
            and not ln.lstrip().startswith("--")  # SQL comments exempt
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, offenders
