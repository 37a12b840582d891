"""Overhead breakdown of the hierarchical decode's non-decoder stages.

Times each auxiliary stage of occupancy_grid_hierarchical separately on the
real chip: coarse-cell selection (top_k), fine-point position gather,
trilinear vs nearest fill upsample, and the fine-value scatter.
Run: python scripts/time_hier_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from zeroshape_tpu.metrics.eval3d import _select_active_cells, _upsample_trilinear

VOX = 128
S = VOX + 1
FACTOR = 4
NC = VOX // FACTOR
SC = NC + 1
CAP = 8192
PC = (FACTOR + 1) ** 3


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=10):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    occ_c = jnp.asarray(rng.uniform(size=(SC, SC, SC)), jnp.float32)
    g = jnp.linspace(-1.5, 1.5, S)

    select = jax.jit(lambda o: _select_active_cells(o, 0.45, CAP))
    t = timeit(select, occ_c)
    print(f"select_active (top_k {NC**3}): {t * 1e3:.1f} ms", flush=True)
    ids, valid = select(occ_c)

    off = jnp.arange(FACTOR + 1, dtype=jnp.int32)
    OX, OY, OZ = jnp.meshgrid(off, off, off, indexing="ij")
    offs = jnp.stack([OX, OY, OZ], axis=-1).reshape(-1, 3)

    @jax.jit
    def fidx_and_gather(ids):
        cell = jnp.stack([ids // (NC * NC), (ids // NC) % NC, ids % NC], axis=-1)
        fidx = cell[:, None, :] * FACTOR + offs[None]
        return g[fidx]

    t = timeit(fidx_and_gather, ids)
    print(f"point gather g[fidx] ({CAP * PC}): {t * 1e3:.1f} ms", flush=True)

    @jax.jit
    def fidx_arith(ids):
        cell = jnp.stack([ids // (NC * NC), (ids // NC) % NC, ids % NC], axis=-1)
        fidx = cell[:, None, :] * FACTOR + offs[None]
        return -1.5 + fidx.astype(jnp.float32) * (3.0 / VOX)

    t = timeit(fidx_arith, ids)
    print(f"point arith lo+i*h: {t * 1e3:.1f} ms", flush=True)

    tri = jax.jit(lambda o: _upsample_trilinear(o, FACTOR))
    t = timeit(tri, occ_c)
    print(f"fill trilinear (einsum): {t * 1e3:.1f} ms", flush=True)

    @jax.jit
    def nearest(o):
        c = o[:NC, :NC, :NC]
        f = jnp.repeat(jnp.repeat(jnp.repeat(c, FACTOR, 0), FACTOR, 1), FACTOR, 2)
        f = jnp.pad(f, ((0, 1), (0, 1), (0, 1)), mode="edge")
        return f

    t = timeit(nearest, occ_c)
    print(f"fill nearest (repeat): {t * 1e3:.1f} ms", flush=True)

    fill = nearest(occ_c)
    vals = jnp.asarray(rng.uniform(size=(CAP * PC,)), jnp.float32)

    @jax.jit
    def scatter(fill, ids, valid, vals):
        cell = jnp.stack([ids // (NC * NC), (ids // NC) % NC, ids % NC], axis=-1)
        fidx = cell[:, None, :] * FACTOR + offs[None]
        flat = (fidx[..., 0] * S + fidx[..., 1]) * S + fidx[..., 2]
        flat = jnp.where(valid[:, None], flat, S * S * S)
        return fill.reshape(-1).at[flat.reshape(-1)].set(vals, mode="drop")

    t = timeit(scatter, fill, ids, valid, vals)
    print(f"scatter {CAP * PC} values: {t * 1e3:.1f} ms", flush=True)

    sig = jax.jit(lambda v: jax.nn.sigmoid(v))
    big = jnp.asarray(rng.normal(size=(CAP * PC,)), jnp.float32)
    t = timeit(sig, big)
    print(f"sigmoid {CAP * PC}: {t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
