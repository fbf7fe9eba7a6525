"""Full-matrix hardware test run (round-4 item #6).

Executes every tests/test_*.py file with LASER_TEST_BACKEND=tpu — the same
suite that gates CI in interpret mode, compiled and run on the real chip —
and writes docs/HW_TESTS.json + docs/HW_TESTS.md (file -> pass/fail/skip
counts, wall time, and the failure head if any). This is the reference's
"benchmarks double as at-scale integration tests" discipline
(/root/reference/benchmarks/gemm/gemm_bench_float32.nim:356-367) applied to
the pytest suite.

Each file runs in its OWN process (fresh backend, bounded compile-cache
growth); a per-file timeout keeps one pathological compile from eating the
session. Results accumulate into the json on every file completion, so an
interrupted run resumes with --resume (skips files already recorded).

Usage: python tools/hw_test_matrix.py [--timeout 1800] [--resume] [files...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(REPO, "docs", "HW_TESTS.json")
OUT_MD = os.path.join(REPO, "docs", "HW_TESTS.md")


def run_file(path: str, timeout: int) -> dict:
    env = dict(os.environ)
    env["LASER_TEST_BACKEND"] = "tpu"
    env.pop("JAX_PLATFORMS", None)  # let the axon/tpu plugin pick the chip
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-m", "pytest", path, "-q", "--tb=line",
             "-p", "no:cacheprovider"],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=timeout)
        out = p.stdout[-4000:]
        code = p.returncode
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace"))[-4000:]
        code = -1
    wall = round(time.time() - t0, 1)
    # parse the pytest summary tail: "N passed, M skipped in S"
    import re

    counts = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    m = re.findall(r"(\d+) (passed|failed|skipped|error)", out)
    for n, k in m:
        counts[k if k != "error" else "errors"] = int(n)
    status = ("timeout" if code == -1 else
              "pass" if code == 0 else "fail")
    rec = {"file": os.path.basename(path), "status": status,
           "wall_s": wall, **counts}
    if status not in ("pass",):
        tail = [ln for ln in out.splitlines() if ln.strip()][-12:]
        rec["tail"] = tail
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("files", nargs="*")
    args = ap.parse_args()

    files = args.files or sorted(glob.glob(os.path.join(REPO, "tests",
                                                        "test_*.py")))
    done = {}
    if args.resume and os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            done = {r["file"]: r for r in json.load(f)["files"]}

    results = list(done.values())
    for path in files:
        base = os.path.basename(path)
        if base in done:
            continue
        print(f"== {base}", flush=True)
        rec = run_file(path, args.timeout)
        print(json.dumps(rec), flush=True)
        results = [r for r in results if r["file"] != base] + [rec]
        results.sort(key=lambda r: r["file"])
        with open(OUT_JSON, "w") as f:
            json.dump({"backend": "tpu (axon tunnel, v5e)",
                       "note": "one process per file; LASER_TEST_BACKEND="
                       "tpu compiles every kernel (interpret=False)",
                       "files": results}, f, indent=1)
        write_md(results)


def write_md(results):
    tot = {k: sum(r.get(k, 0) for r in results)
           for k in ("passed", "failed", "skipped", "errors")}
    n_all = len(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    scope = ("Every test file" if len(results) >= n_all else
             f"{len(results)} of {n_all} test files (run resumable "
             "via --resume; compile time bounds each session)")
    lines = [
        "# Full-suite hardware run (`LASER_TEST_BACKEND=tpu`)",
        "",
        f"{scope} executed COMPILED on the real chip (one process "
        "per file, tools/hw_test_matrix.py); the same suite runs in "
        "interpret mode in CI. Totals: "
        f"**{tot['passed']} passed, {tot['failed']} failed, "
        f"{tot['skipped']} skipped, {tot['errors']} errors**.",
        "",
        "| file | status | passed | failed | skipped | wall (s) |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(f"| {r['file']} | {r['status']} | {r['passed']} | "
                     f"{r['failed']} | {r['skipped']} | {r['wall_s']} |")
    fails = [r for r in results if r["status"] != "pass"]
    if fails:
        lines += ["", "## Non-passing files", ""]
        for r in fails:
            lines += [f"### {r['file']} ({r['status']})", "```"]
            lines += r.get("tail", [])
            lines += ["```", ""]
    with open(OUT_MD, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
