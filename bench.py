"""Headline benchmark: seconds per 128^3 single-image shape reconstruction.

Measures the full inference pipeline on one TPU chip — DPT depth +
intrinsics, visible-surface encoding, dense occupancy decode over the
(128+1)^3 query grid against cached latents, and area-uniform sampling of
10k surface points from the implicit isosurface — all inside one jitted
program (no host round-trips; the reference bounces the grid through the
CPU for PyMCubes, utils/eval_3D.py:114-117).

North-star (BASELINE.md): < 1 s/image at vox_res=128 on a v5e chip.
Prints one JSON line; vs_baseline is the speedup over that 1 s target.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _full_opt

BASELINE_SECONDS = 1.0  # north-star target from BASELINE.json
VOX_RES = 128
NUM_POINTS = 10000


def build():
    from zeroshape_tpu.metrics import eval3d
    from zeroshape_tpu.models.graph_shape import ShapeGraph
    from zeroshape_tpu.ops.marching_cubes import sample_surface_points

    opt = _full_opt()
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ShapeGraph.from_opt(opt, dtype=dtype)
    batch = _batch(B=1, H=opt.H, n_pts=16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    infer_batch = {k: batch[k] for k in ("rgb_input_map", "mask_input_map")}

    S = VOX_RES + 1
    lo, hi = -1.5, 1.5

    @jax.jit
    def reconstruct(variables, batch, key):
        out = model.apply(
            variables, batch, train=False, with_supervision=False, mutable=False
        )

        def decode_fn(pts):
            def run(mdl, latent, p):
                caches = mdl.impl_network.encode(latent)
                occ, _ = mdl.impl_network.decode(caches, p)
                return occ

            return model.apply(variables, out["latent_depth"], pts, method=run)

        # coarse-to-fine decode: exact same surface as the dense 129^3 pass
        # (tests/test_hierarchical_decode.py), ~4x less decoder work;
        # capacity matches options/shape.yaml eval.hier_capacity
        level = eval3d.occupancy_grid_hierarchical(
            decode_fn, VOX_RES, (lo, hi), batch_size=1, capacity=4096
        )[0]
        pts = sample_surface_points(level, key, NUM_POINTS)
        world = pts / S * (hi - lo) + lo
        return world, out["depth_pred"], out["intr_pred"]

    return reconstruct, variables, infer_batch


def main():
    reconstruct, variables, batch = build()
    key = jax.random.PRNGKey(0)
    # compile + warmup; a host transfer (not just block_until_ready) is the
    # sync point so experimental PJRT backends can't report async dispatch
    world, depth, intr = reconstruct(variables, batch, key)
    _ = np.asarray(world)

    times = []
    for i in range(5):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        world, depth, intr = reconstruct(variables, batch, k)
        _ = np.asarray(world)
        times.append(time.perf_counter() - t0)
    latency = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "shape_recon_latency_vox128",
                "value": round(latency, 4),
                "unit": "s/image",
                "vs_baseline": round(BASELINE_SECONDS / latency, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
