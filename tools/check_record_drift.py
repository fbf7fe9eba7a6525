"""Record-drift checker (round-4, VERDICT #3): prose vs committed record.

Rounds 2 and 3 each shipped one stale prose number (Fenwick, reduce_sum)
against the rule that the README perf table and the PERF_NOTES scoreboard
quote ONLY numbers present in the authoritative bench JSON. This makes the
rule mechanical: extract every quoted rate from those two tables and fail
unless it matches a number in the record.

Scope (deliberately narrow — the claims these tables make):
  * README.md: the "Measured performance" table
  * docs/PERF_NOTES.md: the scoreboard table (first table in the file)
Experiment tables deeper in PERF_NOTES quote tool-probe outputs, not
bench.py rows; they are out of scope by design (each cites its tool).

A token counts as quoted if it is a decimal (121.7, 0.261) or a
comma-grouped integer (10,034) — bare integers are shapes/peaks and are
skipped. A token matches if some number in the record rounds to it at the
token's own precision (1.96 matches a recorded 1.9574; commas stripped).

Usage: python tools/check_record_drift.py [record.json]
Exit 0 = clean; 1 = drift (unmatched tokens listed).
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Tokens that are genuinely not bench rows, each with why.
ALLOW = {
    "1e-5", "1e-6",          # error-bar contracts, not rates
    "7.8e-8",                # exp accurate tier's measured max abs err
}

# Prose scales units for readability (record: GFLOP/s & raw /s; prose:
# TFLOP/s, k-sweeps, M/s) — a token matches at any of these factors.
SCALES = (1.0, 1e3, 1e-3, 1e6, 1e-6)

NUM = re.compile(r"\d{1,3}(?:,\d{3})+(?:\.\d+)?|\d+\.\d+(?:e-?\d+)?")


def record_numbers(path: str) -> list[float]:
    """Every number anywhere in the record, including inside strings."""
    out = []

    def walk(x):
        if isinstance(x, bool):
            return
        if isinstance(x, (int, float)):
            out.append(float(x))
        elif isinstance(x, str):
            for t in NUM.findall(x.replace(",", "")):
                try:
                    out.append(float(t))
                except ValueError:
                    pass
            for t in re.findall(r"\d+\.\d+|\d+", x):
                try:
                    out.append(float(t))
                except ValueError:
                    pass
        elif isinstance(x, dict):
            for v in x.values():
                walk(v)
        elif isinstance(x, (list, tuple)):
            for v in x:
                walk(v)

    walk(json.load(open(path)))
    return out


def table_lines(path: str, *, first_table_only: bool, after: str = "") -> list[str]:
    lines, in_tab, seen = [], False, False
    started = not after
    for ln in open(path):
        if not started:
            started = after in ln
            continue
        if ln.lstrip().startswith("|"):
            if seen and first_table_only and not in_tab:
                break
            in_tab = seen = True
            lines.append(ln)
        else:
            in_tab = False
    return lines


def check(lines: list[str], nums: list[float], src: str) -> list[str]:
    bad = []
    for ln in lines:
        if set(ln.strip()) <= {"|", "-", " ", ":"}:
            continue  # separator row
        for tok in NUM.findall(ln):
            if tok in ALLOW:
                continue
            clean = tok.replace(",", "")
            prec = len(clean.split(".")[1]) if "." in clean else 0
            v = float(clean)
            tol = 0.5000001 * 10.0 ** -prec  # conventional half-up rounding
            if any(abs(n * s - v) <= tol for n in nums for s in SCALES):
                continue
            bad.append(f"{src}: {tok!r} not in record  <- {ln.strip()[:90]}")
    return bad


def main() -> int:
    rec = sys.argv[1] if len(sys.argv) > 1 else None
    if rec is None:
        cands = sorted(
            f for f in os.listdir(os.path.join(REPO, "docs"))
            if re.fullmatch(r"BENCH_ROUND\d+\.json", f))
        rec = os.path.join(REPO, "docs", cands[-1])
    nums = record_numbers(rec)
    # reference-CPU comparators quoted in prose live in BASELINE.json
    base = os.path.join(REPO, "BASELINE.json")
    if os.path.exists(base):
        nums += record_numbers(base)
    print(f"record: {rec} (+BASELINE.json; {len(nums)} numbers)")
    bad = []
    bad += check(table_lines(os.path.join(REPO, "README.md"),
                             first_table_only=True,
                             after="## Measured performance"),
                 nums, "README.md")
    bad += check(table_lines(os.path.join(REPO, "docs", "PERF_NOTES.md"),
                             first_table_only=True),
                 nums, "PERF_NOTES.md")
    for b in bad:
        print("DRIFT", b)
    print("clean" if not bad else f"{len(bad)} drifting tokens")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
