"""Summarize a jax.profiler trace: top ops by total duration.

Parses the Chrome-trace JSON (`*.trace.json.gz`) that ``jax.profiler`` /
``--debug --profile`` writes next to the xplane protobuf — dependency-free
(the tensorboard_plugin_profile native converter is version-locked to its
TF build). Prints per-lane (process) totals and the top-N events by summed
duration — the "name the time sinks" step of profile-driven optimization
(BASELINE.md train-step attack).

Run: python scripts/analyze_trace.py [logdir_or_trace] [top_n]
     (default: debug/profiler_log, i.e. the newest window)
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def find_trace(path):
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise SystemExit(f"no .trace.json.gz under {path}")
    return hits[-1]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "debug/profiler_log"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    trace = find_trace(path)
    print(f"trace: {trace}")
    with gzip.open(trace, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    # group complete events per (pid, tid) and compute SELF time: an event's
    # duration minus its direct children's (events nest within a thread lane,
    # so summing raw durations would count inner frames many times over)
    by_thread = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        by_thread[(e.get("pid"), e.get("tid"))].append(e)

    lane_dur = defaultdict(float)
    op_dur = defaultdict(float)
    op_cnt = defaultdict(int)
    for (pid, tid), evs in by_thread.items():
        lane = pid_names.get(pid, str(pid))
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (end_ts, child_time_accum index into records)
        records = []  # [name, dur, child_time]
        for e in evs:
            ts, dur = e["ts"], e["dur"]
            while stack and ts >= stack[-1][0] - 1e-9:
                stack.pop()
            if stack:
                records[stack[-1][1]][2] += dur  # direct child of the top
            records.append([e["name"], dur, 0.0])
            stack.append((ts + dur, len(records) - 1))
        for name, dur, child in records:
            self_t = max(dur - child, 0.0)
            lane_dur[lane] += self_t
            key = (lane, name)
            op_dur[key] += self_t
            op_cnt[key] += 1

    print("\nlane totals (summed self times):")
    for lane, d in sorted(lane_dur.items(), key=lambda kv: -kv[1]):
        print(f"  {d/1e3:10.1f} ms  {lane}")

    # rank ops within the busiest non-python lane(s)
    def is_compute_lane(lane):
        low = lane.lower()
        return not any(s in low for s in ("python", "framework"))

    ranked = sorted(
        ((d, k) for k, d in op_dur.items() if is_compute_lane(k[0])),
        reverse=True,
    )
    total = sum(d for d, _ in ranked) or 1.0
    print(f"\ntop {top_n} events by total SELF time (compute lanes, "
          f"{total/1e3:.1f} ms summed):")
    for d, (lane, name) in ranked[:top_n]:
        print(
            f"  {d/1e3:9.2f} ms  {100*d/total:5.1f}%  x{op_cnt[(lane, name)]:<5d}"
            f" [{lane[:28]}] {name[:110]}"
        )


if __name__ == "__main__":
    main()
