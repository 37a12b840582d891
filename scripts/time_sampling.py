"""Bisect the surface-sampling cost on the real chip.

Times each stage of ops/marching_cubes.sample_surface_points in its own jit,
plus a trivial jit to measure the per-dispatch overhead of the backend.
Run: python scripts/time_sampling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from zeroshape_tpu.ops import marching_cubes as mc

S = 129


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
    rng = np.random.default_rng(0)
    # smooth-ish level set with a real isosurface
    g = np.linspace(-1.5, 1.5, S, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    level = jnp.asarray(1.0 / (1.0 + np.exp((np.sqrt(X**2 + Y**2 + Z**2) - 1.0) * 8)))
    key = jax.random.PRNGKey(0)

    t = timeit(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(f"dispatch overhead (trivial jit): {t * 1e3:.1f} ms")

    for slab in (4, 8, 16, 32):
        f = jax.jit(lambda lv, slab=slab: mc.triangle_areas(lv, slab=slab))
        t = timeit(f, level)
        print(f"triangle_areas slab={slab}: {t * 1e3:.1f} ms")

    areas = jax.jit(mc.triangle_areas)(level)

    t = timeit(jax.jit(jnp.cumsum), areas)
    print(f"cumsum over {areas.shape[0]}: {t * 1e3:.1f} ms")
    cdf = jnp.cumsum(areas)

    @jax.jit
    def pick(cdf, key):
        u = jax.random.uniform(key, (10000,)) * cdf[-1]
        slots = jnp.searchsorted(cdf, u, side="right")
        return jnp.minimum(slots, cdf.shape[0] - 1)

    t = timeit(pick, cdf, key)
    print(f"searchsorted 10k over {cdf.shape[0]}: {t * 1e3:.1f} ms")
    slots = pick(cdf, key)

    @jax.jit
    def reconstruct(level, slots, key):
        n = S - 1
        cube_ids = slots // mc.MAX_TRIS
        tri_ids = (slots % mc.MAX_TRIS).astype(jnp.int32)
        base = jnp.stack(
            [cube_ids // (n * n), (cube_ids // n) % n, cube_ids % n], axis=-1
        ).astype(jnp.int32)
        tri_verts, _ = mc._cube_triangles(level, base, 0.5)
        tri = jnp.take_along_axis(
            tri_verts, tri_ids[:, None, None, None].repeat(3, 2).repeat(3, 3), axis=1
        )[:, 0]
        return tri

    t = timeit(reconstruct, level, slots, key)
    print(f"triangle reconstruction 10k: {t * 1e3:.1f} ms")

    t = timeit(jax.jit(lambda lv, k: mc.sample_surface_points(lv, k, 10000)), level, key)
    print(f"full sample_surface_points: {t * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
