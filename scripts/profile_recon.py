"""Differential stage breakdown of single-image reconstruction on the chip.

Each variant is one jit of a cumulative prefix of the pipeline returning a
few scalars only (the tunneled backend makes large-output transfers dominate
any naive per-stage timing), so stage cost = difference of adjacent variants;
every variant pays the same ~30-40 ms dispatch+transfer floor, which cancels.
Run: python scripts/profile_recon.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _full_opt
from zeroshape_tpu.metrics import eval3d
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.ops import implicit_kernel
from zeroshape_tpu.ops.marching_cubes import sample_surface_points_cells

VOX = 128
CAP = 4096
NUM_POINTS = 10000
SHARPEN = 25.0  # see bench.py: emulate a saturated trained field


def sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def timeit(fn, args, reps, name):
    sync(fn(*args))  # compile+warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{name:44s} {med*1e3:8.1f} ms  (min {min(ts)*1e3:.1f})", flush=True)
    return med


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    opt = _full_opt()
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = ShapeGraph.from_opt(opt, dtype=dtype)
    batch = _batch(B=1, H=opt.H, n_pts=16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    infer = {k: batch[k] for k in ("rgb_input_map", "mask_input_map")}
    key = jax.random.PRNGKey(0)

    def stage_forward(variables, batch, key):
        out = model.apply(
            variables, batch, train=False, with_supervision=False, mutable=False
        )
        return jnp.sum(out["latent_depth"]), jnp.sum(out["depth_pred"])

    def make_decode(variables, out):
        caches = model.apply(
            variables, out["latent_depth"],
            method=lambda mdl, l: mdl.impl_network.encode(l),
        )
        packed = implicit_kernel.pack_decoder_params(
            variables["params"]["impl_network"]
        )

        def decode_fn(pts):
            occ = implicit_kernel.fused_decode(
                pts[0], caches, packed, latent_len=caches[0][0].shape[2]
            )
            return SHARPEN * occ[None]

        return decode_fn, caches

    def stage_encode(variables, batch, key):
        out = model.apply(
            variables, batch, train=False, with_supervision=False, mutable=False
        )
        _, caches = make_decode(variables, out)
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), caches, 0.0
        ), jnp.sum(out["depth_pred"])

    def stage_coarse(variables, batch, key):
        out = model.apply(
            variables, batch, train=False, with_supervision=False, mutable=False
        )
        decode_fn, _ = make_decode(variables, out)
        pts = eval3d.get_dense_3D_grid(VOX // 4, (-1.5, 1.5)).reshape(1, -1, 3)
        return jnp.sum(decode_fn(pts)), jnp.sum(out["depth_pred"])

    def stage_hier(variables, batch, key):
        out = model.apply(
            variables, batch, train=False, with_supervision=False, mutable=False
        )
        decode_fn, _ = make_decode(variables, out)
        level, n_active, ids, valid = eval3d.occupancy_grid_hierarchical(
            decode_fn, VOX, (-1.5, 1.5), batch_size=1, capacity=CAP,
            return_stats=True, return_cells=True,
        )
        return jnp.sum(level), n_active[0]

    def stage_full(variables, batch, key):
        out = model.apply(
            variables, batch, train=False, with_supervision=False, mutable=False
        )
        decode_fn, _ = make_decode(variables, out)
        level, n_active, ids, valid = eval3d.occupancy_grid_hierarchical(
            decode_fn, VOX, (-1.5, 1.5), batch_size=1, capacity=CAP,
            return_stats=True, return_cells=True,
        )
        pts_w = sample_surface_points_cells(
            level[0], ids[0], valid[0], key, num_points=NUM_POINTS
        )
        return jnp.sum(pts_w), n_active[0]

    floor = timeit(jax.jit(lambda x: x + 1.0), (jnp.zeros(8),), reps, "dispatch+transfer floor")
    stages = [
        ("forward", stage_forward),
        ("forward+encode", stage_encode),
        ("forward+encode+coarse", stage_coarse),
        ("forward+encode+hier", stage_hier),
        ("full (+sampling)", stage_full),
    ]
    meds = {}
    for name, fn in stages:
        meds[name] = timeit(jax.jit(fn), (variables, infer, key), reps, name)

    print("\ndeltas (stage cost = difference of adjacent cumulative variants):")
    prev_name, prev = "floor", floor
    for name, _ in stages:
        print(f"  {name:42s} +{(meds[name]-prev)*1e3:7.1f} ms over {prev_name}")
        prev_name, prev = name, meds[name]


if __name__ == "__main__":
    main()
