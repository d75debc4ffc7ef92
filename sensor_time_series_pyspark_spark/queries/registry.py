"""Query/oracle registry. Family modules register their maps at
import time; ANY duplicate name raises immediately — the structural cure
for the silent-shadowing incidents of rounds 3 and 4 (a flat 25k-line
module let a later `def _q_x` rebind every registry entry pointing at
the earlier one)."""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLE_SQL: dict[str, str] = {}


def register_many(
    funcs: dict[str, Callable], oracles: dict[str, str]
) -> None:
    """Register a family module's queries and oracle SQL; raise on any
    duplicate registration or oracle-without-query."""
    for name, fn in funcs.items():
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
    for name, sql in oracles.items():
        if name in ORACLE_SQL:
            raise ValueError(f"duplicate oracle registration: {name}")
        if name not in QUERIES:
            raise ValueError(f"oracle registered without query: {name}")
        ORACLE_SQL[name] = sql
