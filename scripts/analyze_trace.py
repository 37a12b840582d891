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

import bisect
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


def self_times(evs):
    """Per-event SELF time for one thread lane: an event's duration minus its
    DIRECT children's (complete events nest within a lane, so summing raw
    durations would count inner frames many times over). Returns
    ``[(name, self_time), ...]``; grandchildren are charged to their own
    parent, not to the outermost frame."""
    evs = sorted(evs, key=lambda e: (e["ts"], -e["dur"]))
    stack = []  # (end_ts, index into records of the open frame)
    records = []  # [name, dur, child_time]
    for e in evs:
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][0] - 1e-9:
            stack.pop()
        if stack:
            records[stack[-1][1]][2] += dur  # direct child of the top
        records.append([e["name"], dur, 0.0])
        stack.append((ts + dur, len(records) - 1))
    return [(name, max(dur - child, 0.0)) for name, dur, child in records]


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
        for name, self_t in self_times(evs):
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

    summarize_device_ops(events, pid_names, tid_names)


# map a JAX tf_op path (source attribution XLA carries per op) to a model
# segment; BASELINE.md's per-step segment table comes from this
_SEGMENTS = (
    ("dpt_depth", "DPT depth net"),
    ("coord_encoder", "coord encoder"),
    ("impl_network.decode", "implicit decode"),
    ("impl_network.encode", "implicit encode"),
    ("intr_", "intr head"),
    ("loss", "losses"),
)


def segment(tf_op_path):
    """Map an op's ``tf_op`` source path to ``"<model segment> (fwd|bwd)"``.
    jax autodiff marks transposed (backward) computations with
    ``transpose(jvp(...))`` in the scope path."""
    d = "bwd" if "transpose(jvp" in tf_op_path else "fwd"
    for pat, lab in _SEGMENTS:
        if pat in tf_op_path:
            return f"{lab} ({d})"
    return f"other ({d})"


def summarize_device_ops(events, pid_names, tid_names):
    """Aggregate the device 'XLA Ops' lane by model segment (via each op's
    ``tf_op`` source path) and by HLO category; also print the Steps lane so
    device-busy time can be compared against per-step wall."""
    ops, steps, mods = [], [], []
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "/device:" not in pid_names.get(e.get("pid"), ""):
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        if lane == "XLA Ops":
            ops.append(e)
        elif lane == "Steps":
            steps.append(e)
        elif lane == "XLA Modules":
            mods.append(e)
    if not ops:
        return
    # the Steps lane carries one marker per host iteration; only the ones
    # with real device work (>1 ms) are train steps
    walls = sorted(s["dur"] / 1e3 for s in steps if s.get("dur", 0) > 1e3)
    if walls:
        med = walls[len(walls) // 2]
        print(f"\nSteps lane: {len(walls)} non-empty steps, "
              f"median wall {med:.1f} ms (min {walls[0]:.1f}, max {walls[-1]:.1f})")
    # per-step divisor: executions of the dominant XLA module (the train
    # step); the Steps lane double-counts (it also marks host-iteration spans)
    mod_dur = defaultdict(float)
    mod_cnt = defaultdict(int)
    mod_spans = defaultdict(list)
    for m in mods:
        base = m["name"].split("(")[0]
        mod_dur[base] += m["dur"]
        mod_cnt[base] += 1
        mod_spans[base].append((m["ts"], m["ts"] + m["dur"]))
    n_steps = 0
    spans = []
    if mod_dur:
        top = max(mod_dur, key=mod_dur.get)
        n_steps = mod_cnt[top]
        spans = sorted(mod_spans[top])
        print(f"dominant module: {top} x{n_steps} "
              f"({mod_dur[top]/n_steps/1e3:.1f} ms/execution)")

    # per-step segment/category sums count ONLY ops executing inside the
    # dominant module's spans: the capture window may also contain other
    # executables (transfers, the eval/metric-step variant) whose ops would
    # otherwise inflate the divided-by-n_steps numbers
    starts = [s for s, _ in spans]

    def in_dominant(ts):
        i = bisect.bisect_right(starts, ts) - 1
        return i >= 0 and ts < spans[i][1]

    seg_dur = defaultdict(float)
    cat_dur = defaultdict(float)
    tagged = 0.0
    total = 0.0
    in_mod = 0.0
    for o in ops:
        total += o["dur"]
        if spans and not in_dominant(o["ts"]):
            continue
        in_mod += o["dur"]
        args = o.get("args", {})
        cat_dur[args.get("hlo_category", "?")] += o["dur"]
        tf = args.get("tf_op", "")
        if tf:
            seg_dur[segment(tf)] += o["dur"]
            tagged += o["dur"]
    n = max(n_steps, 1)
    if spans:
        print(f"total device op time {total/1e3:.1f} ms, of which "
              f"{in_mod/1e3:.1f} ms inside the dominant module "
              f"({100*in_mod/max(total,1):.1f}%); other executables excluded "
              f"from the per-step numbers below")
    print(f"\ndevice XLA-op time by model segment (per step over {n} steps; "
          f"{(in_mod - tagged)/1e3:.1f} ms untagged):")
    for k, v in sorted(seg_dur.items(), key=lambda kv: -kv[1]):
        print(f"  {v/n/1e3:8.2f} ms/step  {100*v/max(tagged,1):5.1f}%  {k}")
    print("\ndevice XLA-op time by HLO category:")
    for k, v in sorted(cat_dur.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {v/n/1e3:8.2f} ms/step  {k}")


if __name__ == "__main__":
    main()
