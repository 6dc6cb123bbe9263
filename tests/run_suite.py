"""One-command test-suite runner (the reliable spelling).

`pytest tests/ -q` with xdist (-n 2, pytest.ini) is fast when it works, but
this jaxlib's CPU JIT segfaults/aborts inside backend_compile after ~80
heavy compiles in one process, and the xdist master has repeatedly hung
>1 h on a zombie worker (r3 + r4 verdicts) — a crash during a test's
compile leaves the worker half-dead and `--max-worker-restart` does not
always reap it. This runner sidesteps the failure mode structurally:

  - one pytest subprocess PER TEST FILE (fresh compile budget each),
  - two files in flight (4 cores; same parallelism as -n 2),
  - a crashed/zombie file is killed by timeout, reported, retried once,
  - the persistent compile cache (conftest.py) makes retries cheap.

Usage:
    /opt/venv/bin/python tests/run_suite.py            # ~10 min, skips long_horizon
    /opt/venv/bin/python tests/run_suite.py --long     # full suite (~30 min)
    /opt/venv/bin/python tests/run_suite.py -j 1       # fully serial

Exit status 0 iff every file passed.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
# Per-file wall-clock cap (seconds). The slowest ordinary file is ~6 min on
# a cold cache; the long-horizon schedule test alone is ~18 min.
FILE_TIMEOUT = 1200
LONG_TIMEOUT = 2400


def run_file(path: Path, args, *, include_long: bool, cores: str | None = None):
    env = dict(os.environ)
    if not env.get("GST_TEST_TPU"):
        # FORCE the CPU backend (not setdefault): shells on this box export
        # JAX_PLATFORMS=axon + a live pool IP, and a suite that inherits
        # them dispatches every op through the single-chip TPU tunnel —
        # catastrophically slow and a direct violation of the one-JAX-
        # process-per-TPU rule when a quality run holds the chip.
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, "-m", "pytest", str(path), "-q", "-n0",
           "--no-header", "-p", "no:cacheprovider"]
    if cores:
        # Pin each worker to its own cores: two unpinned XLA:CPU processes
        # oversubscribe the box with busy-wait Eigen pools and interpret-
        # mode files balloon 10x (measured: test_blend_pallas 1 min solo,
        # >20 min with two free-running workers).
        cmd = ["taskset", "-c", cores] + cmd
    if not include_long:
        cmd += ["-k", "not long_horizon"]
    cmd += args
    timeout = LONG_TIMEOUT if include_long else FILE_TIMEOUT
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, env=env, cwd=HERE.parent, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        rc, out = proc.returncode, proc.stdout
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = (e.stdout or "") + f"\n[run_suite] TIMEOUT after {timeout}s (killed)"
    return rc, out, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--long", action="store_true",
                    help="include the ~18 min long_horizon schedule test")
    ap.add_argument("-j", type=int, default=2, help="files in flight (default 2)")
    ap.add_argument("pytest_args", nargs="*", help="extra args passed to pytest")
    opts = ap.parse_args()

    files = sorted(HERE.glob("test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    # Longest files first so the tail isn't one giant straggler.
    heavy = ["test_training.py", "test_strategy.py", "test_parallel.py",
             "test_colmap_api.py", "test_viewer_capture.py"]
    files.sort(key=lambda p: (heavy.index(p.name) if p.name in heavy else 99, p.name))

    lock = threading.Lock()
    queue = list(files)
    results = {}

    ncpu = os.cpu_count() or 4
    nw = max(1, opts.j)
    core_sets = []
    for i in range(nw):
        lo = i * ncpu // nw
        hi = max((i + 1) * ncpu // nw, lo + 1)
        core_sets.append(",".join(str(c) for c in range(lo, min(hi, ncpu))))

    def worker(wid):
        while True:
            with lock:
                if not queue:
                    return
                path = queue.pop(0)
            for attempt in (1, 2):
                rc, out, dt = run_file(path, opts.pytest_args,
                                       include_long=opts.long,
                                       cores=core_sets[wid] if nw > 1 else None)
                # rc 5 = "no tests collected" (e.g. everything deselected):
                # not a failure of the suite.
                ok = rc in (0, 5)
                tail = out.strip().splitlines()[-1] if out.strip() else ""
                with lock:
                    print(f"[{path.name:<28}] rc={rc:<3} {dt:6.1f}s  {tail}"
                          + ("" if ok or attempt == 2 else "  -> retrying"),
                          flush=True)
                if ok:
                    break
            with lock:
                results[path.name] = (rc, out)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(nw)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    failed = {k: v for k, v in results.items() if v[0] not in (0, 5)}
    print(f"\n[run_suite] {len(results) - len(failed)}/{len(results)} files "
          f"passed in {time.time() - t0:.0f}s", flush=True)
    for name, (rc, out) in failed.items():
        print(f"\n===== FAILED: {name} (rc={rc}) — last 40 lines =====")
        print("\n".join(out.strip().splitlines()[-40:]))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
