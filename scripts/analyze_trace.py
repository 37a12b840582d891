"""Summarize a jax.profiler trace: top self-time ops on the device.

Feeds the xplane protobuf produced by ``--debug --profile`` (or any
``jax.profiler.trace``) through tensorboard_plugin_profile's converters and
prints the top-N ops by self time — the "name the time sinks" step of
profile-driven optimization (BASELINE.md train-step attack).

Run: python scripts/analyze_trace.py [logdir] [top_n]
     (default logdir: debug/profiler_log)
"""

import glob
import json
import os
import sys


def find_xplane(logdir):
    hits = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    return hits[-1]


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "debug/profiler_log"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xplane = find_xplane(logdir)
    print(f"trace: {xplane}")

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    params = {"tqx": "out:json;"}
    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats^", params)
    table = json.loads(data)
    rows = table.get("table", table).get("rows", [])
    cols = [c["label"] for c in table.get("table", table).get("cols", [])]
    print(f"columns: {cols}")

    def col(row, name):
        for i, c in enumerate(cols):
            if name.lower() in c.lower():
                return row["c"][i]["v"]
        return None

    # rows come host+device mixed; keep device ops, rank by total self time
    dev = []
    for r in rows:
        host = col(r, "host/device") or col(r, "device")
        typ = col(r, "type")
        name = col(r, "operation") or col(r, "op name") or col(r, "name")
        self_t = col(r, "total self-time") or col(r, "self-time")
        occ = col(r, "occurrences")
        if self_t is None:
            continue
        if isinstance(host, str) and host.lower().startswith("host"):
            continue
        dev.append((float(self_t), name, typ, occ))
    dev.sort(reverse=True)
    total = sum(t for t, *_ in dev) or 1.0
    print(f"\ntop {top_n} device ops by self time "
          f"(total device self time {total/1e6:.1f} ms):")
    for t, name, typ, occ in dev[:top_n]:
        print(f"  {t/1e3:9.1f} us  {100*t/total:5.1f}%  x{occ}  [{typ}] {name}")


if __name__ == "__main__":
    main()
