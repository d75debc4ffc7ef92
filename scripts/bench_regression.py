"""Round-over-round bench regression gate (VERDICT r9 ask #6): diff a
current ``bench.py`` run against the BEST prior per-query time across
every recorded ``BENCH_r*.json`` and fail loudly when any query
regresses beyond the ratio bound at comparable machine load.

Baseline = per-query MIN across rounds (the best recorded idle time):
taking the min filters load noise out of the reference side, so the
gate only ever gets STRICTER as better idle runs are recorded. The
current side is load-gated instead — a run captured at load1 above
``--load-cap`` can't be told apart from a real regression, so the
gate reports SKIPPED (exit 0 with a warning) rather than crying wolf.

Usage:
    python scripts/bench_regression.py                 # runs bench.py
    python scripts/bench_regression.py --current F     # pre-recorded run
        [--ratio 1.5] [--load-cap 2.0] [--bench-glob 'BENCH_r*.json']

Exit codes: 0 pass/skipped, 1 regression, 2 no baseline/parse error.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _extract(payload: dict) -> dict:
    """Accept either bench.py's raw one-line JSON or the driver's
    wrapper ({'parsed': {...}})."""
    if "queries" in payload:
        return payload
    if isinstance(payload.get("parsed"), dict):
        return payload["parsed"]
    raise ValueError("no 'queries' dict found in payload")


def load_baseline(pattern: str) -> dict[str, tuple[float, str]]:
    best: dict[str, tuple[float, str]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, pattern))):
        try:
            parsed = _extract(json.load(open(f)))
        except (ValueError, json.JSONDecodeError):
            continue
        for q, sec in parsed.get("queries", {}).items():
            if not isinstance(sec, (int, float)) or sec <= 0:
                continue
            if q not in best or sec < best[q][0]:
                best[q] = (float(sec), os.path.basename(f))
    return best


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError(f"bench.py emitted no JSON line (rc={out.returncode})")


def main() -> int:
    args = sys.argv[1:]

    def opt(name, default):
        return args[args.index(name) + 1] if name in args else default

    ratio = float(opt("--ratio", "1.5"))
    load_cap = float(opt("--load-cap", "2.0"))
    pattern = opt("--bench-glob", "BENCH_r*.json")
    current_file = opt("--current", None)

    baseline = load_baseline(pattern)
    if not baseline:
        print(f"FAIL: no baseline queries found under {pattern}")
        return 2
    if current_file:
        current = _extract(json.load(open(current_file)))
    else:
        current = _extract(run_bench())

    load1 = current.get("load1")
    if load1 is not None and float(load1) > load_cap:
        print(
            f"SKIPPED: current run load1={load1} > cap {load_cap} — "
            "regression vs load contention are indistinguishable; "
            "re-run idle"
        )
        return 0

    regressions, rows = [], []
    for q, sec in sorted(current.get("queries", {}).items()):
        if q not in baseline:
            rows.append((q, sec, None, None, "new"))
            continue
        ref, src = baseline[q]
        r = sec / ref
        flag = "REGRESSED" if r > ratio else "ok"
        if r > ratio:
            regressions.append(q)
        rows.append((q, sec, ref, r, f"{flag} (best {src})"))
    width = max(len(q) for q, *_ in rows)
    for q, sec, ref, r, note in rows:
        ref_s = f"{ref:7.3f}" if ref is not None else "      –"
        r_s = f"{r:5.2f}x" if r is not None else "     –"
        print(f"{q:<{width}}  {sec:7.3f}s  best {ref_s}s  {r_s}  {note}")
    if regressions:
        print(f"FAIL: {len(regressions)} regression(s) >{ratio}x: "
              + ", ".join(regressions))
        return 1
    print(f"PASS: {len(rows)} queries within {ratio}x of best recorded "
          f"(load1={load1})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
