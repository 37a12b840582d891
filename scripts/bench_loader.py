"""Data-loader throughput: can the host pipeline keep the chip fed?

The train step consumes ~265 img/s/chip at batch 28 (BASELINE.md); the
reference leans on torch DataLoader ``num_workers=6`` subprocesses
(/root/reference/data/base.py:11-26). Our loader is a thread pool over
GIL-releasing decoders (zeroshape_tpu/data/base.py) with the C++ zsdl
library doing PNG/npy decode outside the GIL (native/zsdl.cpp). This
measures, against real on-disk files at the production resolution:

  1. full-sample rate: SyntheticDataset.__getitem__ through the threaded
     DataLoader (image + mask + depth + camera + pointcloud + SDF subsample),
  2. decode-only rate: the zsdl PNG path vs the PIL fallback,
  3. a starvation check: batch inter-arrival gaps while a consumer holds
     each batch for the measured train-step time.

Run: python scripts/bench_loader.py [data_root] (default /tmp/overfit_data,
generate with scripts/overfit_e2e.py gen). Env: LOADER_WORKERS (default 6,
the production shape.yaml value), STEP_MS (simulated consumer hold, default
105.7 -> batch-28 step).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from zeroshape_tpu.config import Config


def _opt(root, workers):
    return Config(
        {
            "H": 224, "W": 224, "image_size": [224, 224], "seed": 0,
            "batch_size": 28,
            "data": {
                "root": root, "bgcolor": 1, "num_workers": workers,
                "dataset_train": "synthetic", "dataset_test": "synthetic",
                "synthetic": {"subset": "analytic", "percentage": 1},
            },
            "training": {"n_sdf_points": 4096},
        }
    )


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/overfit_data"
    workers = int(os.environ.get("LOADER_WORKERS", "6"))
    step_ms = float(os.environ.get("STEP_MS", "105.7"))
    if not os.path.isdir(os.path.join(root, "train_data")):
        raise SystemExit(f"no dataset at {root}; run scripts/overfit_e2e.py gen")

    from zeroshape_tpu.data import native
    from zeroshape_tpu.data.synthetic import Dataset

    opt = _opt(root, workers)
    ds = Dataset(opt, split="train")
    n = len(ds)
    print(f"dataset: {n} samples, workers={workers}, native zsdl: "
          f"{native.available()}", flush=True)

    # 1. full-sample loader rate over >=2 epochs (first epoch warms page cache)
    loader = ds.setup_loader(opt, shuffle=True, drop_last=True)
    for ep in range(3):
        loader.set_epoch(ep)
        t0 = time.perf_counter()
        cnt = 0
        for batch in loader:
            cnt += batch["rgb_input_map"].shape[0]
        dt = time.perf_counter() - t0
        print(f"epoch {ep}: {cnt} samples in {dt:.2f} s = {cnt/dt:.1f} img/s",
              flush=True)
    full_rate = cnt / dt

    # 2. decode-only: PNG -> float32 rgb via zsdl vs PIL
    sub, cat, obj, sid = ds.list[0]
    reps = min(n, 64)
    t0 = time.perf_counter()
    for i in range(reps):
        ds.get_image(*ds.list[i % n])
    dt_native = time.perf_counter() - t0
    print(f"image decode ({'zsdl' if native.available() else 'PIL'}): "
          f"{reps/dt_native:.1f} img/s", flush=True)

    # 3. starvation check: consumer holds each batch for one train-step time;
    # any gap beyond the hold is loader-induced stall
    loader.set_epoch(3)
    gaps = []
    t_prev = time.perf_counter()
    for batch in loader:
        t_arrive = time.perf_counter()
        gaps.append(t_arrive - t_prev)
        time.sleep(step_ms / 1e3)  # the chip "step"
        t_prev = time.perf_counter()
    gaps = np.asarray(gaps[1:])  # first includes epoch startup
    B = opt.batch_size
    if gaps.size:
        print(
            f"starvation check @ {step_ms:.1f} ms/step hold: median gap "
            f"{np.median(gaps)*1e3:.1f} ms, p95 {np.percentile(gaps, 95)*1e3:.1f} ms "
            f"(0 ms = batch was already prefetched)", flush=True,
        )
    else:
        print("starvation check: <2 batches/epoch, gap stats skipped", flush=True)
    step_rate = B / (step_ms / 1e3)
    print(
        f"SUMMARY: loader {full_rate:.1f} img/s vs train-step consumption "
        f"{step_rate:.1f} img/s -> {'keeps the chip fed' if full_rate >= step_rate else 'LOADER-BOUND'}",
        flush=True,
    )


if __name__ == "__main__":
    main()
