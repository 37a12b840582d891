"""Tile-size sweep for the XLA occupancy-grid decode on the real chip.

The default tile is one 129^2 z-slice (16641 points). Bigger tiles amortize
per-iteration overhead of the lax.map loop and give XLA larger matmuls;
smaller tiles pipeline better. Run: python scripts/time_decode_xla.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from zeroshape_tpu.metrics import eval3d
from zeroshape_tpu.models.implicit import Implicit

VOX = 128
S = VOX + 1


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=5):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    m = Implicit(dtype=dtype)
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(1, 197, 256)), jnp.float32)
    pts_init = jnp.asarray(rng.normal(size=(1, 64, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), latent, None, pts_init)

    caches = jax.jit(lambda v, l: m.apply(v, l, method=lambda md, x: md.encode(x)))(
        vars_, latent
    )
    grid = eval3d.get_dense_3D_grid(VOX)

    for tile in (S * S // 4, S * S // 2, S * S, 2 * S * S, 4 * S * S, 8 * S * S, 16 * S * S):

        @jax.jit
        def xla_decode(vars_, caches, grid, tile=tile):
            def decode_fn(pts):
                return m.apply(
                    vars_, caches, pts,
                    method=lambda md, c, p: md.decode(c, p)[0],
                )

            return eval3d.occupancy_grid(decode_fn, grid, batch_size=1, tile_points=tile)

        t = timeit(xla_decode, vars_, caches, grid)
        print(f"xla tile={tile}: {t * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
