#!/usr/bin/env python
"""Sharded test runner: the whole suite, one command, process-recycled.

Why: a single-process run of all ~490 tests accumulates hundreds of XLA:CPU
jit executables and eventually segfaults inside backend_compile_and_load
(observed twice in round 3 after ~385 tests — upstream jax 0.9/XLA:CPU issue,
each individual test passes in a fresh process). This runner executes the
suite in fresh-process batches so cumulative compiler state stays bounded,
then aggregates one summary line.

Usage:
  python scripts/run_tests.py              # full suite (sharded, serial)
  python scripts/run_tests.py --fast       # -m "not slow" smoke tier
  python scripts/run_tests.py --batch 4    # files per process
  python scripts/run_tests.py -k corrmap   # forwarded to pytest
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

SUMMARY_RE = re.compile(
    r"(?:(\d+) failed)?(?:, )?(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?"
)


def parse_counts(output: str) -> tuple[int, int, int, bool]:
    """(failed, passed, skipped, parsed_ok) from pytest's summary line."""
    failed = passed = skipped = 0
    ok = False
    for line in output.strip().splitlines()[::-1]:
        line = line.strip().strip("=").strip()
        if not any(w in line for w in ("passed", "failed", "skipped",
                                       "deselected", "no tests ran")):
            continue
        if "no tests ran" in line or re.fullmatch(
                r"\d+ deselected in .*", line):
            return 0, 0, 0, True
        for part in line.split(" in ")[0].split(","):
            part = part.strip()
            m = re.match(r"(\d+) (failed|passed|skipped|deselected|error(?:s)?|warnings?)", part)
            if not m:
                continue
            n, kind = int(m.group(1)), m.group(2)
            if kind == "failed":
                failed += n
            elif kind == "passed":
                passed += n
            elif kind == "skipped":
                skipped += n
            elif kind.startswith("error"):
                failed += n
            ok = True
        if ok:
            break
    return failed, passed, skipped, ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6, help="test files per process")
    ap.add_argument("--fast", action="store_true", help='run -m "not slow" only')
    ap.add_argument("--timeout", type=int, default=1800, help="per-batch seconds")
    args, passthrough = ap.parse_known_args()

    files = sorted((ROOT / "tests").glob("test_*.py"))
    batches = [files[i : i + args.batch] for i in range(0, len(files), args.batch)]

    totals = dict(failed=0, passed=0, skipped=0)
    bad_batches: list[str] = []
    t0 = time.time()
    for bi, batch in enumerate(batches):
        # NOTE: no "-q" here — pyproject addopts already passes -q, and a
        # second one (-qq) suppresses the summary line parse_counts needs
        cmd = [sys.executable, "-m", "pytest", "-p", "no:cacheprovider"]
        if args.fast:
            cmd += ["-m", "not slow"]
        cmd += passthrough
        cmd += [str(p.relative_to(ROOT)) for p in batch]
        names = " ".join(p.stem for p in batch)
        print(f"[batch {bi + 1}/{len(batches)}] {names}", flush=True)
        bt0 = time.time()
        try:
            r = subprocess.run(
                cmd, cwd=ROOT, capture_output=True, text=True,
                timeout=args.timeout,
            )
        except subprocess.TimeoutExpired:
            print(f"  TIMEOUT after {args.timeout}s", flush=True)
            bad_batches.append(names + " (timeout)")
            totals["failed"] += 1
            continue
        out = r.stdout + r.stderr
        failed, passed, skipped, ok = parse_counts(out)
        if not ok and r.returncode == 0:
            # -qq style output (no summary line): fall back to counting the
            # progress characters on the dot lines
            chars = "".join(
                ln.split("[")[0].replace(" ", "")
                for ln in out.splitlines()
                if ln.rstrip().endswith("%]")
            )
            if chars and set(chars) <= set(".sxX"):
                # '.'=passed, 'x'=xfailed, 'X'=xpassed — count x/X as skipped
                # rather than passed so the totals stay faithful to pytest's
                # own accounting (rc==0 guarantees no F/E here)
                passed = chars.count(".")
                skipped = chars.count("s") + chars.count("x") + chars.count("X")
                ok = True
        if not ok or r.returncode not in (0, 1, 5) or (
                r.returncode == 1 and not failed):
            # crashed process (segfault etc.) — report, count as failure
            tail = "\n".join(out.strip().splitlines()[-15:])
            print(f"  CRASH (rc={r.returncode}):\n{tail}", flush=True)
            bad_batches.append(names + f" (rc={r.returncode})")
            totals["failed"] += max(failed, 1)
            totals["passed"] += passed
            totals["skipped"] += skipped
            continue
        totals["failed"] += failed
        totals["passed"] += passed
        totals["skipped"] += skipped
        status = "ok" if failed == 0 else f"{failed} FAILED"
        print(
            f"  {passed} passed, {skipped} skipped [{status}] "
            f"({time.time() - bt0:.0f}s)",
            flush=True,
        )
        if failed:
            tail = "\n".join(
                ln for ln in out.splitlines() if ln.startswith("FAILED")
            )
            print(tail, flush=True)
            bad_batches.append(names)

    dt = time.time() - t0
    print(
        f"\nTOTAL: {totals['passed']} passed, {totals['failed']} failed, "
        f"{totals['skipped']} skipped in {dt:.0f}s "
        f"({len(batches)} process batches)",
        flush=True,
    )
    if bad_batches:
        print("failing batches:\n  " + "\n  ".join(bad_batches))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
