"""Dense vs hierarchical occupancy decode timing on the real chip.

Run: python scripts/time_decode_hier.py
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

    def make_decode_fn(vars_, caches):
        def decode_fn(pts):
            return m.apply(
                vars_, caches, pts, method=lambda md, c, p: md.decode(c, p)[0]
            )

        return decode_fn

    @jax.jit
    def dense(vars_, caches, grid):
        occ = eval3d.occupancy_grid(
            make_decode_fn(vars_, caches), grid, batch_size=1, tile_points=S * S
        )
        return occ.reshape(1, S, S, S)

    t = timeit(dense, vars_, caches, grid)
    ld = dense(vars_, caches, grid)
    print(f"dense: {t * 1e3:.1f} ms", flush=True)

    for cap in (4096, 8192):
        f = jax.jit(
            lambda v, c, cap=cap: eval3d.occupancy_grid_hierarchical(
                make_decode_fn(v, c), VOX, batch_size=1, capacity=cap
            )
        )
        t = timeit(f, vars_, caches)
        lh = f(vars_, caches)
        agree = float(
            np.mean((np.asarray(ld) >= 0.5) == (np.asarray(lh) >= 0.5))
        )
        print(f"hier cap={cap}: {t * 1e3:.1f} ms  sign-agree={agree:.6f}", flush=True)


if __name__ == "__main__":
    main()
