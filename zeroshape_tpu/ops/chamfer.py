"""Chamfer nearest-neighbor distance: Pallas TPU kernel + XLA fallback.

TPU-native replacement for the reference's CUDA extension
(external/chamfer3D/chamfer3D.cu:12-134): for each point of cloud A, the
squared distance to (and index of) its nearest neighbor in cloud B, both
directions. The CUDA kernel tiles B through shared memory; here a whole
10k-point cloud is only ~120 KB, so the Pallas kernel parks all of B in VMEM
once and streams A tiles over the grid. Distances are formed MXU-style as
|a|^2 + |b|^2 - 2 a.b (one [TILE, M] matmul per tile) — everything stays
on-chip; HBM traffic is just the two point clouds.

Layout note: points are transposed to [B, 3, N] before the kernel so the
lane (last) dimension is the large, 128-aligned point axis.

The backward pass (chamfer3D.cu:155-194 uses atomicAdd scatter) is a
custom_vjp built from the saved argmin indices with segment-sum scatters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PAD_VAL = 1e4  # padded points sit far away; squared dist ~1e8 << fp32 max


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# XLA fallback (also the CPU-test path): row-tiled pairwise distances
# ---------------------------------------------------------------------------

def _nn_one_way_xla(x1, x2, tile=1024):
    """x1 [B, N, 3], x2 [B, M, 3] -> (min dist^2 [B, N], argmin [B, N])."""
    B, N, _ = x1.shape
    Np = _round_up(N, tile)
    x1p = jnp.pad(x1, ((0, 0), (0, Np - N), (0, 0)), constant_values=_PAD_VAL)
    n2 = jnp.sum(x2 * x2, axis=-1)  # [B, M]

    def tile_fn(x1_tile):
        # x1_tile [B, tile, 3]
        n1 = jnp.sum(x1_tile * x1_tile, axis=-1)  # [B, tile]
        cross = jnp.einsum("bnd,bmd->bnm", x1_tile, x2)  # [B, tile, M]
        d = n1[..., None] + n2[:, None, :] - 2.0 * cross
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    tiles = x1p.reshape(B, Np // tile, tile, 3).swapaxes(0, 1)  # [T, B, tile, 3]
    dists, idxs = jax.lax.map(tile_fn, tiles)
    dists = dists.swapaxes(0, 1).reshape(B, Np)[:, :N]
    idxs = idxs.swapaxes(0, 1).reshape(B, Np)[:, :N]
    return jnp.maximum(dists, 0.0), idxs


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _nn_kernel(x1_ref, x2_ref, dist_ref, idx_ref, *, tile):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    a = x1_ref[0]  # [3, TILE] (coordinate-major: lanes = points)
    b = x2_ref[0]  # [3, M]
    na = jnp.sum(a * a, axis=0)  # [TILE]
    nb = jnp.sum(b * b, axis=0)  # [M]
    cross = jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TILE, M]
    d = na[:, None] + nb[None, :] - 2.0 * cross
    # the output block is the full [1, 1, Np] row (TPU block-shape rules);
    # each grid step writes its tile slice
    dist_ref[0, 0, pl.ds(i * tile, tile)] = jnp.maximum(jnp.min(d, axis=1), 0.0)
    idx_ref[0, 0, pl.ds(i * tile, tile)] = jnp.argmin(d, axis=1).astype(jnp.int32)


def _nn_one_way_pallas(x1, x2, tile=None):
    """Same contract as :func:`_nn_one_way_xla`, as a Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = x1.shape
    M = x2.shape[1]
    Mp = _round_up(M, 128)
    if tile is None:
        # bound the [tile, Mp] fp32 distance block in VMEM however large the
        # resident cloud is (GT clouds are dataset-dependent; same policy as
        # _nn_min_pallas, budgeted so M=10k keeps the proven tile=256)
        tile = max(128, min(1024, (12 * 1024 * 1024 // (4 * Mp)) // 128 * 128))
    tile = min(tile, _round_up(N, 128))
    Np = _round_up(N, tile)
    x1p = jnp.pad(x1, ((0, 0), (0, Np - N), (0, 0)), constant_values=_PAD_VAL)
    x2p = jnp.pad(x2, ((0, 0), (0, Mp - M), (0, 0)), constant_values=_PAD_VAL)
    x1t = jnp.swapaxes(x1p, 1, 2)  # [B, 3, Np]
    x2t = jnp.swapaxes(x2p, 1, 2)  # [B, 3, Mp]

    # very large resident clouds need more than the 16 MiB default scoped
    # VMEM even at the minimum tile (v5e has 128 MiB)
    compiler_params = None
    if tile * Mp * 4 > 8 * 1024 * 1024:
        params_cls = getattr(pltpu, "CompilerParams", None) or getattr(
            pltpu, "TPUCompilerParams"
        )
        compiler_params = params_cls(vmem_limit_bytes=100 * 1024 * 1024)

    grid = (B, Np // tile)
    dist, idx = pl.pallas_call(
        partial(_nn_kernel, tile=tile),
        grid=grid,
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 3, Mp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Np), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Mp * 3 + 3 * B * Np * Mp,
            bytes_accessed=B * (Np + Mp) * 3 * 4 + B * Np * 8,
            transcendentals=0,
        ),
    )(x1t, x2t)
    dist = dist[:, 0]
    idx = idx[:, 0]
    return dist[:, :N], jnp.minimum(idx[:, :N], M - 1)


def _nn_min_kernel(x1_ref, x2_ref, dist_ref, *, tile):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    a = x1_ref[0]  # [3, TILE]
    b = x2_ref[0]  # [3, M]
    na = jnp.sum(a * a, axis=0)
    nb = jnp.sum(b * b, axis=0)
    cross = jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = na[:, None] + nb[None, :] - 2.0 * cross
    dist_ref[0, 0, pl.ds(i * tile, tile)] = jnp.maximum(jnp.min(d, axis=1), 0.0)


def _nn_min_pallas(x1, x2, tile=None, interpret=False):
    from jax.experimental import pallas as pl

    B, N, _ = x1.shape
    M = x2.shape[1]
    Mp = _round_up(M, 128)
    if tile is None:
        # keep the [tile, Mp] fp32 distance block ~<= 4 MB of VMEM however
        # large the B cloud is (prune[0] is user-configurable)
        tile = max(128, min(1024, (4 * 1024 * 1024 // (4 * Mp)) // 128 * 128))
    tile = min(tile, _round_up(N, 128))
    Np = _round_up(N, tile)
    x1t = jnp.swapaxes(
        jnp.pad(x1, ((0, 0), (0, Np - N), (0, 0)), constant_values=_PAD_VAL), 1, 2
    )
    x2t = jnp.swapaxes(
        jnp.pad(x2, ((0, 0), (0, Mp - M), (0, 0)), constant_values=_PAD_VAL), 1, 2
    )
    dist = pl.pallas_call(
        partial(_nn_min_kernel, tile=tile),
        grid=(B, Np // tile),
        in_specs=[
            pl.BlockSpec((1, 3, tile), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 3, Mp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Mp * 3 + B * Np * Mp,
            bytes_accessed=B * (Np + Mp) * 3 * 4 + B * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x1t, x2t)
    return dist[:, 0, :N]


def _nn_min_xla(x1, x2, tile=256):
    B, N, _ = x1.shape
    Np = _round_up(N, tile)
    x1p = jnp.pad(x1, ((0, 0), (0, Np - N), (0, 0)), constant_values=_PAD_VAL)
    n2 = jnp.sum(x2 * x2, axis=-1)
    x2b = x2.astype(jnp.bfloat16)

    def tile_fn(x1_tile):
        n1 = jnp.sum(x1_tile * x1_tile, axis=-1)
        cross = jnp.einsum(
            "bnd,bmd->bnm",
            x1_tile.astype(jnp.bfloat16),
            x2b,
            preferred_element_type=jnp.float32,
        )
        d = n1[..., None] + n2[:, None, :] - 2.0 * cross
        return jnp.min(d, axis=-1)

    tiles = x1p.reshape(B, Np // tile, tile, 3).swapaxes(0, 1)
    dists = jax.lax.map(tile_fn, tiles)
    return jnp.maximum(dists.swapaxes(0, 1).reshape(B, Np)[:, :N], 0.0)


def nn_min_squared_fast(x1, x2, use_pallas=None, interpret=False):
    """Ranking-grade one-way min squared NN distances [B, N].

    bf16 cross-term matmul (fp32 accumulation), no argmin and no
    exact-distance refinement: absolute error ~1e-3 from input rounding.
    Built for scoring candidates that are later rescored exactly — the
    brute-force coarse stage (eval_3D.py:148-152 scores every rotation with
    the full CUDA chamfer; here only the top-K survivors get the exact
    kernel, so the coarse pass can trade exactness for MXU rate).
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas or interpret:
        return _nn_min_pallas(x1, x2, interpret=interpret)
    return _nn_min_xla(x1, x2)


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _nn_one_way(x1, x2, use_pallas=None):
    if use_pallas is None:
        use_pallas = _on_tpu()
    _, idx = _nn_one_way_pallas(x1, x2) if use_pallas else _nn_one_way_xla(x1, x2)
    # the |a|^2+|b|^2-2ab form finds the argmin fast on the MXU but carries
    # ~1e-7 fp32 cancellation; recompute the winner's distance exactly
    nn = jnp.take_along_axis(x2, idx[..., None], axis=1)
    dist = jnp.sum((x1 - nn) ** 2, axis=-1)
    return dist, idx


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def chamfer_squared(x1, x2, use_pallas=None):
    """Bidirectional NN squared distances.

    Args:
      x1 [B, N, 3], x2 [B, M, 3] float32.
    Returns:
      (d1 [B, N], d2 [B, M], idx1 [B, N], idx2 [B, M]).
    """
    d1, i1 = _nn_one_way(x1, x2, use_pallas)
    d2, i2 = _nn_one_way(x2, x1, use_pallas)
    return d1, d2, i1, i2


def _chamfer_fwd(x1, x2, use_pallas):
    out = chamfer_squared(x1, x2, use_pallas)
    d1, d2, i1, i2 = out
    return out, (x1, x2, i1, i2)


def _chamfer_bwd(use_pallas, res, grads):
    x1, x2, i1, i2 = res
    g1, g2, _, _ = grads
    B, N, _ = x1.shape
    M = x2.shape[1]
    # d1_i = |x1_i - x2_{i1_i}|^2 -> dx1_i += 2 g1_i (x1_i - x2_{i1_i})
    nn12 = jnp.take_along_axis(x2, i1[..., None], axis=1)  # [B, N, 3]
    nn21 = jnp.take_along_axis(x1, i2[..., None], axis=1)  # [B, M, 3]
    diff1 = 2.0 * g1[..., None] * (x1 - nn12)
    diff2 = 2.0 * g2[..., None] * (x2 - nn21)
    dx1 = diff1
    dx2 = diff2
    # scatter-add the reverse contributions (the CUDA atomicAdd path)
    dx2 = dx2 + jax.vmap(lambda idx, upd: jnp.zeros((M, 3)).at[idx].add(-upd))(i1, diff1)
    dx1 = dx1 + jax.vmap(lambda idx, upd: jnp.zeros((N, 3)).at[idx].add(-upd))(i2, diff2)
    return dx1, dx2


chamfer_squared.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_distance(x1, x2, use_pallas=None):
    """Reference utils/eval_3D.py:265-269: sqrt of squared NN distances."""
    d1, d2, i1, i2 = chamfer_squared(x1, x2, use_pallas)
    return jnp.sqrt(d1), jnp.sqrt(d2), i1, i2
