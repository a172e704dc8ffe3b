#!/usr/bin/env python
"""Segfault-tolerant test-suite runner.

XLA:CPU segfaults sporadically mid-suite on some sandbox host types
(the jaxlib in this environment removed the legacy-runtime fallback
flag that used to avoid it).  This runner executes one pytest process
per test file, retries crashed files once, and prints an aggregate —
a crash loses one file's progress, not the suite.

Usage: python tools/run_suite.py [pytest args...]
"""
import glob
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_file(path, extra):
    cmd = [sys.executable, "-m", "pytest", path, "-q", "--no-header",
           *extra]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    dt = time.time() - t0
    tail = (r.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    crashed = r.returncode in (-11, -6, 134, 139) or \
        "Segmentation fault" in (r.stderr or "") or \
        "Fatal Python error" in (r.stderr or "")
    return r.returncode, crashed, summary, dt


def collect_tests(path):
    r = subprocess.run([sys.executable, "-m", "pytest", path,
                        "--collect-only", "-q", "--no-header"],
                       cwd=ROOT, capture_output=True, text=True)
    return [ln.strip() for ln in (r.stdout or "").splitlines()
            if "::" in ln]


def run_per_test(path, extra):
    """Per-test fallback for files that crash cumulatively (XLA:CPU
    compiler state): one pytest process per test."""
    npass = nfail = ncrash = 0
    t0 = time.time()
    for nodeid in collect_tests(path):
        rc, crashed, summary, _ = run_file(nodeid, extra)
        if crashed:
            ncrash += 1
        elif rc in (0, 5):
            npass += 1
        else:
            nfail += 1
    return npass, nfail, ncrash, time.time() - t0


def main():
    extra = sys.argv[1:]
    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    total_pass = total_fail = 0
    failures, crashes = [], []
    for path in files:
        name = os.path.basename(path)
        rc, crashed, summary, dt = run_file(path, extra)
        if crashed:
            rc, crashed, summary, dt2 = run_file(path, extra)
            dt += dt2
            if crashed:
                npass, nfail, ncrash, dt3 = run_per_test(path, extra)
                dt += dt3
                total_pass += npass
                total_fail += nfail
                if ncrash:
                    crashes.append(f"{name} ({ncrash} tests)")
                if nfail:
                    failures.append(name)
                print(f"{name:42s} per-test fallback: {npass} passed,"
                      f" {nfail} failed, {ncrash} crashed "
                      f"[{dt:6.1f}s]", flush=True)
                continue
        import re
        m = re.search(r"(\d+) passed", summary)
        p = int(m.group(1)) if m else 0
        m = re.search(r"(\d+) failed", summary)
        f = int(m.group(1)) if m else 0
        total_pass += p
        total_fail += f
        if f or rc not in (0, 5):
            failures.append(name)
        print(f"{name:42s} {summary[:60]:60s} [{dt:6.1f}s]",
              flush=True)
    print(f"\nTOTAL: {total_pass} passed, {total_fail} failed, "
          f"{len(crashes)} crashed files")
    if failures:
        print("failing files:", ", ".join(failures))
    if crashes:
        print("crashed files:", ", ".join(crashes))
    return 1 if (total_fail or crashes) else 0


if __name__ == "__main__":
    sys.exit(main())
