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


def run_half(path, extra, tests):
    """Run an explicit list of test node ids in one process."""
    cmd = [sys.executable, "-m", "pytest", *tests, "-q",
           "--no-header", *extra]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    dt = time.time() - t0
    tail = (r.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else ""
    crashed = r.returncode in (-11, -6, 134, 139) or \
        "Segmentation fault" in (r.stderr or "") or \
        "Fatal Python error" in (r.stderr or "")
    return r.returncode, crashed, summary, dt


def run_bisect(path, extra, tests, depth=0):
    """Crash fallback: bisect the file's tests into halves instead of
    one process per test (the XLA:CPU segfault is cumulative-state
    dependent; halves usually pass, and each split costs one jit
    warmup instead of len(tests))."""
    import re
    if not tests:
        return 0, 0, 0, 0.0
    rc, crashed, summary, dt = run_half(path, extra, tests)
    if not crashed:
        m = re.search(r"(\d+) passed", summary)
        p_ = int(m.group(1)) if m else 0
        m = re.search(r"(\d+) failed", summary)
        f_ = int(m.group(1)) if m else 0
        return p_, f_, 0, dt
    if len(tests) == 1:
        return 0, 0, 1, dt
    mid = len(tests) // 2
    p1, f1, c1, d1 = run_bisect(path, extra, tests[:mid], depth + 1)
    p2, f2, c2, d2 = run_bisect(path, extra, tests[mid:], depth + 1)
    return p1 + p2, f1 + f2, c1 + c2, dt + d1 + d2


def run_one(path, extra):
    """Run one test file with crash retry + bisect fallback.
    Returns a result dict (the JSON artifact row)."""
    name = os.path.basename(path)
    rc, crashed, summary, dt = run_file(path, extra)
    if crashed:
        rc, crashed, summary, dt2 = run_file(path, extra)
        dt += dt2
        if crashed:
            tests = collect_tests(path)
            npass, nfail, ncrash, dt3 = run_bisect(path, extra, tests)
            dt += dt3
            return {"file": name, "passed": npass, "failed": nfail,
                    "crashed_tests": ncrash, "seconds": round(dt, 1),
                    "mode": "bisect"}
    import re
    m = re.search(r"(\d+) passed", summary)
    p = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", summary)
    f = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) error", summary)
    f += int(m.group(1)) if m else 0
    if f == 0 and p == 0 and rc not in (0, 5):
        f = 1      # import error etc.
    return {"file": name, "passed": p, "failed": f,
            "crashed_tests": 0, "seconds": round(dt, 1),
            "mode": "file"}


def main():
    args = sys.argv[1:]
    jobs = 2
    if "--jobs" in args:
        k = args.index("--jobs")
        jobs = int(args[k + 1])
        del args[k:k + 2]
    extra = args
    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    results = []
    t0 = time.time()
    if jobs > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(jobs) as ex:
            futs = {ex.submit(run_one, p, extra): p for p in files}
            from concurrent.futures import as_completed
            for fut in as_completed(futs):
                r = fut.result()
                results.append(r)
                print(f"{r['file']:42s} {r['passed']:4d} passed "
                      f"{r['failed']:3d} failed "
                      f"{r['crashed_tests']:3d} crashed "
                      f"[{r['seconds']:7.1f}s {r['mode']}]",
                      flush=True)
    else:
        for p in files:
            r = run_one(p, extra)
            results.append(r)
            print(f"{r['file']:42s} {r['passed']:4d} passed "
                  f"{r['failed']:3d} failed "
                  f"{r['crashed_tests']:3d} crashed "
                  f"[{r['seconds']:7.1f}s {r['mode']}]", flush=True)
    wall = time.time() - t0
    total_pass = sum(r["passed"] for r in results)
    total_fail = sum(r["failed"] for r in results)
    ncrash = sum(r["crashed_tests"] for r in results)
    failures = [r["file"] for r in results if r["failed"]]
    crashes = [r["file"] for r in results if r["crashed_tests"]]
    print(f"\nTOTAL: {total_pass} passed, {total_fail} failed, "
          f"{ncrash} crashed tests ({wall:.0f}s wall, jobs={jobs})")
    if failures:
        print("failing files:", ", ".join(failures))
    if crashes:
        print("crashed files:", ", ".join(crashes))
    import json
    art = {"total_passed": total_pass, "total_failed": total_fail,
           "crashed_tests": ncrash, "wall_seconds": round(wall, 1),
           "jobs": jobs,
           "files": sorted(results, key=lambda r: -r["seconds"])}
    with open(os.path.join(ROOT, "SUITE_SUMMARY.json"), "w") as f:
        json.dump(art, f, indent=1)
    print("summary artifact: SUITE_SUMMARY.json")
    return 1 if (total_fail or crashes) else 0


if __name__ == "__main__":
    sys.exit(main())
