#!/usr/bin/env python
"""Sharded test-suite runner: one pytest subprocess per test file.

Why not plain ``pytest tests/``: the suite compiles ~130 XLA:CPU programs in
one long-lived process, and late in that process XLA:CPU's
``backend_compile_and_load`` / persistent-cache ``serialize()`` crash
(SIGSEGV/SIGABRT) nondeterministically — the same compiles always succeed in
a fresh process (see tests/test_timing.py for the first isolated instance).
Sharding per file bounds each process's compile count, so a compiler crash
can take out at most one shard — and crashed shards are retried once in a
fresh process before being declared failed.

This is the suite gate the reference's ``cargo test --all-features`` CI step
maps to (/root/reference/.github/workflows/ci.yml:38-41).

Usage:
    python scripts/run_tests.py [-j N] [-k EXPR] [--files glob ...] [-v]
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Compile-heaviest shards first so a parallel run's wall clock isn't
# serialized behind a long tail (measured cold-cache ordering).
HEAVY_FIRST = [
    "test_config_variants.py",
    "test_timeblocks.py",
    "test_integration.py",
    "test_accuracy_battery.py",
    "test_tempogram.py",
    "test_key.py",
]

def shard_sort_key(p: Path):
    try:
        return (HEAVY_FIRST.index(p.name), p.name)
    except ValueError:
        return (len(HEAVY_FIRST), p.name)


def parse_counts(output: str):
    """Extract (passed, failed, skipped, errors) from pytest's summary line."""
    passed = failed = skipped = errors = 0
    for line in reversed(output.splitlines()):
        if re.search(r"\d+ (passed|failed|skipped|error)", line):
            for n, word in re.findall(r"(\d+) (passed|failed|skipped|error)", line):
                if word == "passed":
                    passed = int(n)
                elif word == "failed":
                    failed = int(n)
                elif word == "skipped":
                    skipped = int(n)
                else:
                    errors = int(n)
            break
    return passed, failed, skipped, errors


def run_shard(path: Path, extra: list[str], timeout: int):
    cmd = [sys.executable, "-m", "pytest", str(path), "-q", "--no-header", *extra]
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
        rc, out = proc.returncode, proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = -signal.SIGALRM
        out = ((e.stdout or b"").decode(errors="replace")
               + (e.stderr or b"").decode(errors="replace")
               + f"\nTIMEOUT after {timeout}s")
    return rc, out, time.time() - t0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-j", "--jobs", type=int, default=2,
                   help="parallel shards (default 2; each shard is its own process)")
    p.add_argument("-k", default=None, help="pytest -k expression passed to every shard")
    p.add_argument("--files", nargs="*", default=None,
                   help="explicit test files (default: tests/test_*.py)")
    p.add_argument("--timeout", type=int, default=3600, help="per-shard timeout (s)")
    p.add_argument("-v", "--verbose", action="store_true",
                   help="print each shard's full output, not just failures")
    args, extra = p.parse_known_args(argv)
    if args.k:
        extra = ["-k", args.k, *extra]

    if args.files:
        files = [Path(f) for f in args.files]
    else:
        files = sorted((REPO / "tests").glob("test_*.py"), key=shard_sort_key)
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    totals = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    failures: list[str] = []
    crashes: list[str] = []
    t0 = time.time()

    def run_with_retry(path: Path):
        rc, out, dt = run_shard(path, extra, args.timeout)
        retried = False
        if rc not in (0, 1, 5):  # crash (signal / internal error): retry once fresh
            rc2, out2, dt2 = run_shard(path, extra, args.timeout)
            retried = True
            if rc2 in (0, 1, 5):
                rc, out, dt = rc2, out2, dt + dt2
        return path, rc, out, dt, retried

    with concurrent.futures.ThreadPoolExecutor(max_workers=max(args.jobs, 1)) as ex:
        for path, rc, out, dt, retried in ex.map(run_with_retry, files):
            passed, failed, skipped, errors = parse_counts(out)
            totals["passed"] += passed
            totals["failed"] += failed
            totals["skipped"] += skipped
            totals["errors"] += errors
            note = " [retried-after-crash]" if retried else ""
            if rc == 0 or rc == 5:
                status = "ok" if rc == 0 else "no-tests"
                print(f"  {path.name:<34} {status}: {passed} passed"
                      + (f", {skipped} skipped" if skipped else "")
                      + f"  ({dt:.0f}s){note}", flush=True)
                if args.verbose:
                    print(out)
            elif rc == 1:
                failures.append(path.name)
                print(f"  {path.name:<34} FAILED: {failed} failed, {passed} passed"
                      f"  ({dt:.0f}s){note}", flush=True)
                print(out)
            else:
                crashes.append(path.name)
                totals["errors"] += 1
                print(f"  {path.name:<34} CRASHED rc={rc} ({dt:.0f}s){note}", flush=True)
                print(out[-4000:])

    wall = time.time() - t0
    ok = not failures and not crashes
    print(f"\n{'GREEN' if ok else 'RED'}: {totals['passed']} passed, "
          f"{totals['failed']} failed, {totals['skipped']} skipped, "
          f"{len(crashes)} crashed shard(s) in {wall:.0f}s "
          f"across {len(files)} shards")
    if failures:
        print("failed shards: " + ", ".join(failures))
    if crashes:
        print("crashed shards: " + ", ".join(crashes))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
