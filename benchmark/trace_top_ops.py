"""Summarize a JAX profiler trace: top device ops by total duration.

Parses the perfetto trace.json.gz the profiler writes (no tensorboard
needed). Usage: /opt/venv/bin/python benchmark/trace_top_ops.py TRACE_DIR [N]
"""
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def main():
    root = Path(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    files = sorted(root.rglob("*.trace.json.gz")) or sorted(root.rglob("trace.json.gz"))
    if not files:
        sys.exit(f"no trace.json.gz under {root}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Identify device tracks (TPU/device PIDs) via process_name metadata.
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if any(k in n.lower() for k in ("tpu", "device", "xla"))
                and "host" not in n.lower()}
    by_op = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        by_op[name] += e["dur"]
        count[name] += 1
        total += e["dur"]
    print(f"trace: {files[-1]}  (device total {total/1e3:.1f} ms across tracks)")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {dur/1e3:10.1f} ms  x{count[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
