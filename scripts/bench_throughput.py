"""Batched-reconstruction throughput on one chip (images/s at batch B).

The reference demo/eval path is strictly batch-1 per GPU
(/root/reference/demo.py:143-153, options/shape.yaml eval.batch_size=1); on
TPU the same jitted reconstruction runs batched — the DPT forward amortizes
its latency-bound B=1 convs and the fused Pallas decoder vmaps over
per-sample latent caches (`fused_decode_batched`). This measures the
production engine path (`Runner._recon_fn(B)`) end to end: depth + intr
forward, hier occupancy decode at vox 128, 10k surface samples per image.

Run: python scripts/bench_throughput.py [B ...]   (default: 1 8)
Env: BENCH_REPS (default 7), BENCH_CKPT / BENCH_DATA as in bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

import bench
from zeroshape_tpu import config
from zeroshape_tpu.models import resolve_compute_dtype
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.parallel.mesh import make_mesh
from zeroshape_tpu.runtime.shape_engine import Runner


def _opt():
    opt_cmd = config.parse_arguments(
        ["--yaml=options/shape.yaml", "--task=shape", "--eval.vox_res=128"]
    )
    return config.set_options(opt_cmd, safe_check=False, verbose=False)


def _variables(opt, model, batch):
    # dummy supervision keys so the implicit decoder's params initialize
    # (ShapeGraph only traces impl_network under with_supervision)
    init_batch = dict(batch)
    init_batch.update(
        depth_input_map=jnp.zeros((1, opt.H, opt.W, 1)),
        intr=jnp.tile(jnp.eye(3)[None], (1, 1, 1)),
        pose_gt=jnp.zeros((1, 3, 4)),
        gt_sample_points=jnp.zeros((1, 8, 3)),
        gt_sample_sdf=jnp.zeros((1, 8)),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch,
        train=False,
    )
    ckpt = bench._find_ckpt()
    if ckpt:
        from zeroshape_tpu.runtime import checkpoint as ckpt_util

        payload = ckpt_util.restore_checkpoint(ckpt)
        variables = {
            "params": ckpt_util.merge_params(variables["params"], payload["params"]),
            "batch_stats": ckpt_util.merge_params(
                variables["batch_stats"], payload["batch_stats"]
            ),
        }
        print(f"throughput: trained weights from {ckpt}", file=sys.stderr)
    # merged trees are host numpy; one transfer here or every rep re-uploads
    return jax.device_put(variables)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 8]
    reps = int(os.environ.get("BENCH_REPS", "7"))
    opt = _opt()
    dtype = resolve_compute_dtype(opt)
    model = ShapeGraph.from_opt(opt, dtype=dtype)

    one = bench._real_sample(opt.H)
    if one is None:
        rng = np.random.default_rng(0)
        one = {
            "rgb_input_map": jnp.asarray(
                rng.uniform(0, 1, (1, opt.H, opt.W, 3)), jnp.float32
            ),
            "mask_input_map": jnp.asarray(
                (rng.uniform(size=(1, opt.H, opt.W, 1)) > 0.3).astype(np.float32)
            ),
        }
    variables = _variables(opt, model, one)

    runner = Runner.for_inference(opt, model)

    mesh = make_mesh(1)
    key = jax.random.PRNGKey(0)
    results = {}
    for B in sizes:
        batch = {k: jnp.tile(v, (B,) + (1,) * (v.ndim - 1)) for k, v in one.items()}
        recon = runner._recon_fn(B, mesh=mesh, training=True)
        t0 = time.perf_counter()
        out, level, world = recon(variables, batch, key)
        np.asarray(world)
        print(f"B={B}: compile+warmup {time.perf_counter() - t0:.1f} s", file=sys.stderr)
        times = []
        for i in range(reps):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            out, level, world = recon(variables, batch, k)
            np.asarray(world)  # host transfer = reliable sync on axon
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        results[B] = med
        print(
            f"B={B}: median {med*1e3:.1f} ms/batch = {med/B*1e3:.1f} ms/image "
            f"= {B/med:.1f} img/s  (min {min(times)*1e3:.1f}, max {max(times)*1e3:.1f})",
            flush=True,
        )
    if 1 in results and len(results) > 1:
        for B, med in results.items():
            if B != 1:
                print(
                    f"B={B} vs B=1: {results[1]/(med/B):.2f}x throughput",
                    flush=True,
                )


if __name__ == "__main__":
    main()
