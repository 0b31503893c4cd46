#!/usr/bin/env python
"""Summarize a jax.profiler trace: top XLA ops/fusions by device time.

The reference has no tracing at all (`main.py:361-362` wall-clock meters
are its only observability); this closes the loop on our side: capture
with `--profile DIR` on `main.py`/`test.py` (utils.profiling.profile_trace),
then attribute where the step time actually goes:

    python tools/trace_top_ops.py /tmp/jax-trace [--top 25] [--lane TensorCore]

Works on the perfetto-style `*.trace.json.gz` the profiler writes. Events
are grouped per (process, thread) lane; per-op totals are summed within
the chosen lanes (default: lanes whose process name contains "TPU" or
"TensorCore", falling back to all non-metadata lanes — CPU traces).
Op names are canonicalized (trailing `.123` instance suffixes dropped) so
repeated fusions aggregate.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]   # newest capture


def canon(name: str) -> str:
    name = re.sub(r"\.\d+$", "", name)
    return name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace file or profiler log dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--lane", default="",
                    help="substring filter on process/thread lane names "
                         "(e.g. TensorCore); empty = device lanes if "
                         "present, else all")
    args = ap.parse_args()

    path = find_trace(args.trace)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    procs, threads = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            procs[e.get("pid")] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            threads[(e.get("pid"), e.get("tid"))] = e["args"]["name"]

    def lane_name(e):
        pid, tid = e.get("pid"), e.get("tid")
        return (f"{procs.get(pid, pid)}/"
                f"{threads.get((pid, tid), tid)}")

    device_pids = {pid for pid, n in procs.items()
                   if any(k in str(n) for k in ("TPU", "TensorCore", "/device"))}

    per_op = collections.defaultdict(float)
    per_lane = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = lane_name(e)
        if args.lane:
            if args.lane not in lane:
                continue
        elif device_pids and e.get("pid") not in device_pids:
            continue
        us = float(e["dur"])
        per_op[canon(e.get("name", "?"))] += us
        per_lane[lane] += us
        total += us

    if not per_op:
        print("no matching complete events; lanes present:")
        for (pid, tid), n in sorted(threads.items()):
            print(f"  {procs.get(pid, pid)}/{n}")
        sys.exit(1)

    print(f"trace: {path}")
    print("lanes (total event time):")
    for lane, us in sorted(per_lane.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {us / 1e3:10.2f} ms  {lane}")
    print(f"\ntop {args.top} ops by summed duration "
          f"({total / 1e3:.2f} ms total):")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {us / 1e3:10.2f} ms {us / total * 100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
