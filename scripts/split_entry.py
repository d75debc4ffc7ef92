"""One-shot refactoring script: split the monolithic __spark_entry__.py
into per-family modules under sensor_time_series_pyspark_spark/queries/,
registered through a duplicate-raising registry (VERDICT r4 item 2).

Mechanics: AST-parse the monolith; every top-level statement that is not
a query function / entry / queries / oracle_sql goes VERBATIM (with its
preceding comment block) into queries/common.py; query functions are
packed in definition order into ~2.4k-line family modules together with
their oracle-SQL source expressions; each family module registers its
(name → fn, name → sql) maps via registry.register_many, which raises on
any duplicate. __spark_entry__.py becomes a thin façade re-exporting the
same public contract.

Run once from the repo root: python scripts/split_entry.py
"""

from __future__ import annotations

import ast
import os
from collections import OrderedDict

SRC = "__spark_entry__.py"
PKG = "sensor_time_series_pyspark_spark/queries"

CHUNK_NAMES = [
    ("core", "Core relational, temporal, dedup/similarity/text and ML\nsurface queries (flagship .. q81)."),
    ("windows_signal", "Windowed signal analytics: ACF, CUSUM, rolling\nstats, drift and compression (q82 .. q143)."),
    ("sketches_graph", "Sketches, sequences, cohorts, survival, graph and\nmergeable-moment queries (q144 .. q199)."),
    ("business", "Business/ops analytics: funnels, SLAs, finance windows,\nfeature tables (q200 .. q243)."),
    ("stats_sampling", "Statistics and sampling estimators (q244 .. q283)."),
    ("ml_analytics", "ML-adjacent analytics: neighbors, silhouettes,\nretrieval, histograms, periodicity (q284 .. q322)."),
    ("drift_stats", "Hypothesis tests and drift monitors (q323 .. q354)."),
    ("experiments", "Experimentation, causal and curve analyses\n(q355 .. q383)."),
    ("stats_ts", "Round-4 statistical/time-series batch: ICC, rank tests,\nsurvival, spectra (q384 .. q407)."),
    ("quality_ops", "Data-quality, calibration and ops-audit batch\n(q408 .. q438)."),
    ("latest", "Newest queries (q439+). Append here; start a new module\npast ~2.4k lines."),
]

src = open(SRC, encoding="utf-8").read()
lines = src.split("\n")
tree = ast.parse(src)

mod_doc = ast.get_docstring(tree, clean=False)

qfuncs: list[ast.FunctionDef] = []
qdict = odict = entryfn = None
common_nodes: list[ast.stmt] = []
future_import = None
for i, node in enumerate(tree.body):
    if i == 0 and isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
        continue  # module docstring
    if isinstance(node, ast.ImportFrom) and node.module == "__future__":
        future_import = node
        continue
    if isinstance(node, ast.FunctionDef):
        if node.name == "queries":
            qdict = node
            continue
        if node.name == "oracle_sql":
            odict = node
            continue
        if node.name == "entry":
            entryfn = node
            continue
        if node.name.startswith("_q_"):
            qfuncs.append(node)
            continue
    common_nodes.append(node)

assert qdict is not None and odict is not None and entryfn is not None

# name -> fn identifier, name -> oracle source expr
qret = qdict.body[-1].value
name2fn = OrderedDict(
    (k.value, v.id) for k, v in zip(qret.keys, qret.values)
)
fn2name = {v: k for k, v in name2fn.items()}
oret = odict.body[-1].value
name2sql_src = OrderedDict()
for k, v in zip(oret.keys, oret.values):
    seg = ast.get_source_segment(src, v)
    assert seg is not None
    name2sql_src[k.value] = (seg, v.end_lineno - v.lineno + 1)

assert len(name2fn) == len(set(name2fn)), "dup keys in queries()"
assert set(name2sql_src) <= set(name2fn), "oracle without query"


# true predecessor (any category) for every top-level node, so gap
# comments attach to the right statement and never swallow unrelated
# intermediate definitions
pred_end: dict[int, int] = {}
prev = 0
for node in tree.body:
    pred_end[node.lineno] = prev
    prev = node.end_lineno


def segment_with_gap(node: ast.stmt) -> str:
    """Source of node including the comment/blank gap before it."""
    return "\n".join(lines[pred_end[node.lineno] : node.end_lineno])


# ---- common.py -----------------------------------------------------------
common_parts = []
exported: list[str] = []
for node in common_nodes:
    common_parts.append(segment_with_gap(node))
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        for a in node.names:
            exported.append(a.asname or a.name.split(".")[0])
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                exported.append(t.id)
    elif isinstance(node, ast.FunctionDef):
        exported.append(node.name)

# skip: common nodes interleave with query funcs; preserve only ORDER of
# common nodes themselves (they have no forward deps among each other at
# import time beyond definition order, which we keep).

exported += ["register_many"]
seen = set()
exported = [n for n in exported if not (n in seen or seen.add(n))]

common_src = (
    '"""Shared context for the query-family modules: every import,\n'
    "constant and helper the monolithic __spark_entry__.py defined at\n"
    "module level, preserved verbatim and in original order. Family\n"
    "modules do `from ...queries.common import *` (underscore helpers\n"
    "are exported explicitly via __all__).\"\"\"\n\n"
    "from __future__ import annotations\n\n"
    "from sensor_time_series_pyspark_spark.queries.registry import register_many\n"
    + "\n".join(common_parts)
    + "\n\n__all__ = [\n"
    + "".join(f"    {n!r},\n" for n in exported)
    + "]\n"
)

# ---- chunking ------------------------------------------------------------
chunks: list[list[ast.FunctionDef]] = []
cur: list[ast.FunctionDef] = []
cl = 0
for f in qfuncs:
    fl = f.end_lineno - f.lineno + 1
    qname = fn2name.get(f.name)
    ol = name2sql_src.get(qname, ("", 0))[1] if qname else 0
    if cl + fl + ol > 2400 and cur:
        chunks.append(cur)
        cur, cl = [], 0
    cur.append(f)
    cl += fl + ol
if cur:
    chunks.append(cur)
assert len(chunks) <= len(CHUNK_NAMES), (len(chunks), len(CHUNK_NAMES))

fn_home = {}
for ci, chunk in enumerate(chunks):
    for f in chunk:
        fn_home[f.name] = CHUNK_NAMES[ci][0]

os.makedirs(PKG, exist_ok=True)

# ---- registry.py ---------------------------------------------------------
open(f"{PKG}/registry.py", "w", encoding="utf-8").write(
    '''"""Query/oracle registry. Family modules register their maps at
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
'''
)

# ---- family modules ------------------------------------------------------
import re

all_fn_names = {f.name for f in qfuncs}
for ci, chunk in enumerate(chunks):
    mod_name, mod_desc = CHUNK_NAMES[ci]
    parts = [
        "\n".join(lines[chunk[0].lineno - 1 : chunk[0].end_lineno])
    ] + [segment_with_gap(f) for f in chunk[1:]]
    body = "\n".join(parts)
    # cross-module _q_ references
    here = {f.name for f in chunk}
    refs = set(re.findall(r"\b(_q_[a-z0-9_]+)\b", body)) & all_fn_names - here
    xi = ""
    for r in sorted(refs):
        xi += (
            f"from sensor_time_series_pyspark_spark.queries."
            f"{fn_home[r]} import {r}\n"
        )
    reg_funcs = "".join(
        f"        {fn2name[f.name]!r}: {f.name},\n"
        for f in chunk
        if f.name in fn2name
    )
    reg_oracles = "".join(
        f"        {fn2name[f.name]!r}: {name2sql_src[fn2name[f.name]][0]},\n"
        for f in chunk
        if f.name in fn2name and fn2name[f.name] in name2sql_src
    )
    open(f"{PKG}/{mod_name}.py", "w", encoding="utf-8").write(
        f'"""{mod_desc}\n\nSplit out of the former monolithic __spark_entry__.py; function\nsources are verbatim. See queries/common.py for shared helpers and\nqueries/registry.py for the duplicate-raising registration."""\n\n'
        "from __future__ import annotations\n\n"
        "from sensor_time_series_pyspark_spark.queries.common import *  # noqa: F401,F403\n"
        + xi
        + "\n"
        + body
        + "\n\n\nregister_many(\n    {\n"
        + reg_funcs
        + "    },\n    {\n"
        + reg_oracles
        + "    },\n)\n"
    )

open(f"{PKG}/common.py", "w", encoding="utf-8").write(common_src)

# ---- __init__.py ---------------------------------------------------------
mods = [CHUNK_NAMES[i][0] for i in range(len(chunks))]
open(f"{PKG}/__init__.py", "w", encoding="utf-8").write(
    '"""Query families (split from the former monolithic\n'
    "__spark_entry__.py). Importing this package imports every family\n"
    "module, whose register_many() calls populate QUERIES/ORACLE_SQL —\n"
    'and raise on any duplicate name."""\n\n'
    "from sensor_time_series_pyspark_spark.queries.registry import (  # noqa: F401\n"
    "    ORACLE_SQL,\n    QUERIES,\n    register_many,\n)\n\n"
    + "".join(
        f"from sensor_time_series_pyspark_spark.queries import {m}  # noqa: F401,E402\n"
        for m in mods
    )
)

# ---- new __spark_entry__.py ---------------------------------------------
entry_src = "\n".join(lines[entryfn.lineno - 1 : entryfn.end_lineno])
open(SRC, "w", encoding="utf-8").write(
    f'"""{mod_doc}"""\n\n'
    "from __future__ import annotations\n\n"
    "from collections.abc import Callable\n\n"
    "from pyspark.sql import DataFrame, SparkSession\n\n"
    "from sensor_time_series_pyspark_spark.queries import ORACLE_SQL, QUERIES\n"
    "# compat re-exports: helpers (_dsum/_davg/_dec, read_table, …) keep\n"
    "# their historical `__spark_entry__.<name>` addresses\n"
    "from sensor_time_series_pyspark_spark.queries.common import *  # noqa: F401,F403\n"
    "from sensor_time_series_pyspark_spark.queries.common import SF0001  # noqa: F401\n\n\n"
    + entry_src
    + "\n\n\ndef queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:\n"
    "    return dict(QUERIES)\n\n\n"
    "def oracle_sql() -> dict[str, str]:\n"
    "    return dict(ORACLE_SQL)\n"
)

print("wrote", len(chunks), "family modules:", mods)
