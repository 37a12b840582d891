"""Component timing of the reconstruction pipeline on the real chip.

Times, separately jitted: (1) image -> latents forward (DPT + intr +
unproject + coord encode), (2) latent encode, (3) 129^3 grid decode,
(4) surface sampling from the level grid. Run: python scripts/time_components.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _full_opt

VOX = 128
S = VOX + 1


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
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

    @jax.jit
    def forward(variables, batch):
        out = model.apply(variables, batch, train=False, with_supervision=False, mutable=False)
        return out["latent_depth"], out["depth_pred"], out["intr_pred"]

    t = timeit(forward, variables, infer_batch)
    print(f"image->latents forward: {t * 1e3:.1f} ms")
    latent = forward(variables, infer_batch)[0]

    @jax.jit
    def encode(variables, latent):
        return model.apply(variables, latent, method=lambda m, l: m.impl_network.encode(l))

    t = timeit(encode, variables, latent)
    print(f"latent encode: {t * 1e3:.1f} ms")
    caches = encode(variables, latent)

    @jax.jit
    def decode_grid(variables, caches):
        def decode_fn(pts):
            return model.apply(
                variables, caches, pts,
                method=lambda m, c, p: m.impl_network.decode(c, p)[0],
            )

        grid_pts = eval3d.get_dense_3D_grid(VOX)
        occ = eval3d.occupancy_grid(decode_fn, grid_pts, batch_size=1, tile_points=S * S)
        return occ.reshape(S, S, S)

    t = timeit(decode_grid, variables, caches)
    print(f"grid decode 129^3: {t * 1e3:.1f} ms")
    level = decode_grid(variables, caches)

    @jax.jit
    def sample(level, key):
        return sample_surface_points(level, key, 10000)

    t = timeit(sample, level, jax.random.PRNGKey(0))
    print(f"surface sampling 10k: {t * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
