"""Hierarchical coarse-to-fine occupancy decode vs the dense path.

The contract (metrics/eval3d.occupancy_grid_hierarchical): the level grid it
returns must yield the *same surface* as the exhaustive dense decode — exact
values in every crossing cube and the correct side of 0.5 everywhere else —
so marching-cubes surface samples are identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu.metrics import eval3d
from zeroshape_tpu.ops.marching_cubes import sample_surface_points

VOX = 32
S = VOX + 1


def dense_level(decode_fn, batch_size=1):
    pts = eval3d.get_dense_3D_grid(VOX)
    occ = eval3d.occupancy_grid(decode_fn, pts, batch_size, tile_points=S * S)
    return occ.reshape(batch_size, S, S, S)


def crossing_cubes(level):
    """Mask [S-1]^3 of cubes whose corners straddle the 0.5 isovalue."""
    n = level.shape[0] - 1
    corners = [
        level[dx : dx + n, dy : dy + n, dz : dz + n]
        for dx in (0, 1)
        for dy in (0, 1)
        for dz in (0, 1)
    ]
    cmin = np.minimum.reduce(corners)
    cmax = np.maximum.reduce(corners)
    return (cmin < 0.5) & (cmax >= 0.5)


def check_equivalent(level_d, level_h):
    level_d, level_h = np.asarray(level_d), np.asarray(level_h)
    # same side of the isovalue everywhere
    np.testing.assert_array_equal(level_d >= 0.5, level_h >= 0.5)
    # identical crossing-cube pattern, exact values at crossing-cube corners
    cross = crossing_cubes(level_d)
    np.testing.assert_array_equal(cross, crossing_cubes(level_h))
    n = level_d.shape[0] - 1
    touched = np.zeros_like(level_d, dtype=bool)
    idx = np.argwhere(cross)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                touched[idx[:, 0] + dx, idx[:, 1] + dy, idx[:, 2] + dz] = True
    np.testing.assert_allclose(level_h[touched], level_d[touched], rtol=0, atol=1e-6)


def test_sphere_field_exact():
    def decode_fn(pts):  # logit of a sphere occupancy, radius 0.9
        return 25.0 * (0.9 - jnp.linalg.norm(pts, axis=-1))

    ld = dense_level(decode_fn)[0]
    lh = eval3d.occupancy_grid_hierarchical(
        decode_fn, VOX, batch_size=1, tile_points=S * S
    )[0]
    check_equivalent(ld, lh)
    # identical surface samples, bit for bit (same key, same level values)
    k = jax.random.PRNGKey(3)
    pd = sample_surface_points(ld, k, 512)
    ph = sample_surface_points(lh, k, 512)
    np.testing.assert_allclose(np.asarray(pd), np.asarray(ph), atol=1e-6)


def test_blobs_field_exact():
    """Multi-blob field incl. a small feature; exercises margin selection."""
    centers = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.8, 0.6, -0.4], [-0.7, -0.9, 0.8]], jnp.float32
    )
    radii = jnp.asarray([0.55, 0.3, 0.18], jnp.float32)

    def decode_fn(pts):
        d = jnp.linalg.norm(pts[..., None, :] - centers, axis=-1) - radii
        return -12.0 * jnp.min(d, axis=-1)

    ld = dense_level(decode_fn)[0]
    lh = eval3d.occupancy_grid_hierarchical(
        decode_fn, VOX, batch_size=1, tile_points=S * S
    )[0]
    check_equivalent(ld, lh)


def test_random_network_exact_and_batched():
    """A real (untrained) implicit decoder, batch of 2 distinct latents."""
    from zeroshape_tpu.models.implicit import Implicit

    m = Implicit(
        num_patches=16,
        latent_dim=32,
        n_channels=64,
        n_blocks_attn=2,
        n_layers_mlp=4,
        num_heads=4,
        skip_in=(2,),
    )
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(2, 17, 32)), jnp.float32)
    pts0 = jnp.asarray(rng.normal(size=(2, 8, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), latent, None, pts0)
    caches = m.apply(vars_, latent, method=lambda md, l: md.encode(l))

    def decode_fn(pts):
        return m.apply(vars_, caches, pts, method=lambda md, c, p: md.decode(c, p)[0])

    ld = dense_level(decode_fn, batch_size=2)
    lh = eval3d.occupancy_grid_hierarchical(
        decode_fn, VOX, batch_size=2, tile_points=S * S
    )
    for b in range(2):
        check_equivalent(ld[b], lh[b])


def test_capacity_overflow_safe_shapes():
    """Tiny capacity still returns the right shape (values degrade gracefully)."""

    def decode_fn(pts):
        return 25.0 * (0.9 - jnp.linalg.norm(pts, axis=-1))

    lh = eval3d.occupancy_grid_hierarchical(
        decode_fn, VOX, batch_size=1, capacity=8, tile_points=S * S
    )
    assert lh.shape == (1, S, S, S)
    assert np.isfinite(np.asarray(lh)).all()


def test_return_stats_counts_active_cells():
    def decode_fn(pts):
        return 25.0 * (0.9 - jnp.linalg.norm(pts, axis=-1))

    level, n_active = eval3d.occupancy_grid_hierarchical(
        decode_fn, VOX, batch_size=1, tile_points=S * S, return_stats=True
    )
    assert level.shape == (1, S, S, S)
    n = int(np.asarray(n_active)[0])
    # the sphere surface must mark some cells but not all of them
    assert 0 < n < (VOX // 4) ** 3


def test_n_active_is_preclamp_demand():
    """n_active reports the margin test's RAW demand, independent of the
    capacity clamp — the property scripts/measure_hier.py (the round-5
    capacity calibration) relies on to measure demand at default capacity."""

    def decode_fn(pts):
        return 25.0 * (0.9 - jnp.linalg.norm(pts, axis=-1))

    counts = []
    for cap in (2, (VOX // 4) ** 3):
        _, n_active = eval3d.occupancy_grid_hierarchical(
            decode_fn, VOX, batch_size=1, capacity=cap,
            tile_points=S * S, return_stats=True,
        )
        counts.append(int(np.asarray(n_active)[0]))
    assert counts[0] == counts[1] > 2  # same demand even when clamped to 2


def test_engine_warns_on_capacity_overflow(capsys):
    """Runner._check_hier_overflow prints a warning when cells were dropped."""
    from zeroshape_tpu.config import Config
    from zeroshape_tpu.runtime.shape_engine import Runner

    r = Runner.__new__(Runner)  # no full engine setup needed
    r.opt = Config(
        {"eval": {"vox_res": 32, "hier_capacity": 4}}
    )
    r._check_hier_overflow({"hier_n_active": np.asarray([100])})
    assert getattr(r, "_hier_warned", False)
    out = capsys.readouterr().out
    assert "hier_capacity" in out
    # second call is silent
    r._check_hier_overflow({"hier_n_active": np.asarray([100])})


def test_cells_sampler_matches_dense_area_and_surface():
    """sample_surface_points_cells: identical total triangle area to the
    dense pass, and every sampled point lies inside a crossing cube."""
    from zeroshape_tpu.ops.marching_cubes import (
        sample_surface_points_cells,
        triangle_areas,
    )

    def decode_fn(pts):
        return 25.0 * (0.9 - jnp.linalg.norm(pts, axis=-1))

    level, n_active, ids, valid = eval3d.occupancy_grid_hierarchical(
        decode_fn, VOX, batch_size=1, tile_points=S * S,
        return_stats=True, return_cells=True,
    )
    level = level[0]

    # total area parity with the dense pass
    dense_total = float(jnp.sum(triangle_areas(level)))
    from zeroshape_tpu.ops.marching_cubes import _corner_areas, CORNERS  # noqa

    pts = sample_surface_points_cells(
        level, ids[0], valid[0], jax.random.PRNGKey(5), 512
    )
    pts = np.asarray(pts)
    assert np.isfinite(pts).all() and (np.abs(pts).sum() > 0)

    # each sampled point's containing cube must straddle the isovalue
    cross = crossing_cubes(np.asarray(level))
    cube = np.clip(np.floor(pts - 1e-5).astype(int), 0, VOX - 1)
    # points on cube faces may belong to either neighbor; accept if any
    # adjacent cube (within 1 in each axis, containing the point) crosses
    ok = np.zeros(len(pts), bool)
    for dx in (0, -1):
        for dy in (0, -1):
            for dz in (0, -1):
                c = np.clip(cube + [dx, dy, dz], 0, VOX - 1)
                inside = (
                    (pts >= c).all(1) & (pts <= c + 1).all(1)
                )
                ok |= inside & cross[c[:, 0], c[:, 1], c[:, 2]]
    assert ok.all(), (~ok).sum()

    # cells-restricted area total == dense total
    from zeroshape_tpu.ops import marching_cubes as mc

    K = ids.shape[1]
    cell = np.stack(
        [np.asarray(ids[0]) // (8 * 8), (np.asarray(ids[0]) // 8) % 8,
         np.asarray(ids[0]) % 8], -1
    )
    blocks = np.zeros((K, 5, 5, 5), np.float32)
    lvl = np.asarray(level)
    for k in range(K):
        b = cell[k] * 4
        blocks[k] = lvl[b[0]:b[0]+5, b[1]:b[1]+5, b[2]:b[2]+5]
    vals = [
        jnp.asarray(blocks[:, dx:dx+4, dy:dy+4, dz:dz+4])
        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
    ]
    # reorder to CORNERS order
    corner_order = [(int(c[0]), int(c[1]), int(c[2])) for c in mc.CORNERS]
    idx_of = {(dx, dy, dz): i for i, (dx, dy, dz) in enumerate(
        [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    )}
    vals = [vals[idx_of[c]] for c in corner_order]
    areas = mc._corner_areas(vals, 0.5) * np.asarray(valid[0])[:, None, None, None, None]
    np.testing.assert_allclose(float(jnp.sum(areas)), dense_total, rtol=1e-5)


def test_cells_sampler_empty_surface():
    from zeroshape_tpu.ops.marching_cubes import sample_surface_points_cells

    level = jnp.full((S, S, S), 0.9)  # no crossing anywhere
    ids = jnp.arange(8, dtype=jnp.int32)
    valid = jnp.ones((8,), bool)
    pts = sample_surface_points_cells(level, ids, valid, jax.random.PRNGKey(0), 64)
    np.testing.assert_array_equal(np.asarray(pts), 0.0)


def test_jit_compiles():
    def decode_fn(pts):
        return 25.0 * (0.9 - jnp.linalg.norm(pts, axis=-1))

    f = jax.jit(
        lambda: eval3d.occupancy_grid_hierarchical(
            decode_fn, VOX, batch_size=1, tile_points=S * S
        )
    )
    out = f()
    assert out.shape == (1, S, S, S)
