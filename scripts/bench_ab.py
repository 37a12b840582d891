"""Same-process A/B of bench.py's reconstruction: fused vs XLA decoder.

Cross-run chip variance on the tunneled backend swamps a 10% effect, so the
two variants are compiled once each and timed interleaved in one process.
Run: python scripts/bench_ab.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

import bench


VARIANTS = {
    # name -> bench.build kwargs ("fused" tracks the shipped default layout,
    # grouped since the round-4 A/B; the -blockdiag/-grouped names pin one)
    "xla": dict(use_fused=False),
    "fused": dict(use_fused=True),
    "fused-blockdiag": dict(use_fused=True, attn_mode="blockdiag", tile=512),
    "fused-grouped": dict(use_fused=True, attn_mode="grouped", tile=512),
}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else ["xla", "fused"]
    key = jax.random.PRNGKey(0)
    variants = {}
    for name in names:
        recon, variables, batch = bench.build(**VARIANTS[name])
        t0 = time.perf_counter()
        world, *_ = recon(variables, batch, key)
        np.asarray(world)
        print(f"{name}: compile+warmup {time.perf_counter() - t0:.1f} s", flush=True)
        variants[name] = (recon, variables, batch)

    times = {n: [] for n in variants}
    for i in range(reps):
        for name, (recon, variables, batch) in variants.items():
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            world, *_ = recon(variables, batch, k)
            np.asarray(world)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = np.asarray(ts)
        print(
            f"{name}: median {np.median(ts) * 1e3:.1f} ms  "
            f"min {ts.min() * 1e3:.1f}  max {ts.max() * 1e3:.1f}",
            flush=True,
        )
    if "fused" in times and "xla" in times:
        print(f"fused/xla: {np.median(times['fused']) / np.median(times['xla']):.3f}")


if __name__ == "__main__":
    main()
