"""Marching cubes on TPU: fixed-shape XLA pipeline, no host round-trip.

The reference extracts meshes on the CPU (PyMCubes) and samples them with
trimesh (utils/eval_3D.py:233-263), bouncing the 128^3 level grid
device->host->device. Marching cubes has data-dependent output size, which is
hostile to XLA; we sidestep it with two observations:

  * The evaluation protocol never needs the mesh — it needs ``num_points``
    area-uniform samples of the isosurface. Sampling can be done with fixed
    shapes: compute every potential triangle's *area* (zero for inactive
    table slots), build a cumulative distribution, draw ``num_points``
    uniforms, invert the CDF with a searchsorted, and only then reconstruct
    the few chosen triangles. All O(S^3) work is dense, regular VPU math.
  * Mesh export (demo/vis) is host-bound file IO anyway, so compaction of the
    dense triangle buffer happens in numpy on the way to disk.

Vertex convention matches PyMCubes: vertices live in grid-index coordinates
[0, S-1]; callers rescale with ``verts / S * (max - min) + min`` exactly like
the reference (eval_3D.py:253-255).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from zeroshape_tpu.ops.mc_tables import CORNERS, EDGES, MAX_TRIS, TRI_TABLE

# corner offsets as int, shape [8, 3]
_CORNER_OFF = CORNERS.astype(np.int32)


def _gather_corners(level, base_idx):
    """Gather the 8 corner values for cubes at integer coords base_idx [M, 3]."""
    S = level.shape[0]
    flat = level.reshape(-1)
    idx = (
        (base_idx[:, None, 0] + _CORNER_OFF[None, :, 0]) * S * S
        + (base_idx[:, None, 1] + _CORNER_OFF[None, :, 1]) * S
        + (base_idx[:, None, 2] + _CORNER_OFF[None, :, 2])
    )  # [M, 8]
    return flat[idx]


def _case_index(corner_vals, isoval):
    """Case id in [0, 256): bit i set iff corner i is inside (>= isoval)."""
    bits = (corner_vals >= isoval).astype(jnp.int32)
    weights = jnp.asarray([1 << i for i in range(8)], jnp.int32)
    return jnp.sum(bits * weights, axis=-1)


def _edge_vertices(corner_vals, base_idx, isoval):
    """Isosurface vertex on each of the 12 edges (valid only where crossed).

    Returns [M, 12, 3] positions in grid-index coordinates.
    """
    va = corner_vals[:, EDGES[:, 0]]  # [M, 12]
    vb = corner_vals[:, EDGES[:, 1]]
    denom = vb - va
    t = jnp.where(jnp.abs(denom) > 1e-12, (isoval - va) / denom, 0.5)
    t = jnp.clip(t, 0.0, 1.0)
    pa = base_idx[:, None, :].astype(jnp.float32) + CORNERS[EDGES[:, 0]][None]
    pb = base_idx[:, None, :].astype(jnp.float32) + CORNERS[EDGES[:, 1]][None]
    return pa + t[..., None] * (pb - pa)


def _cube_triangles(level, base_idx, isoval):
    """All candidate triangles for cubes base_idx: ([M, T, 3, 3] verts, [M, T] valid)."""
    corner_vals = _gather_corners(level, base_idx)  # [M, 8]
    case = _case_index(corner_vals, isoval)  # [M]
    everts = _edge_vertices(corner_vals, base_idx, isoval)  # [M, 12, 3]
    tri_edges = jnp.asarray(TRI_TABLE)[case]  # [M, T, 3]
    valid = tri_edges[..., 0] >= 0  # [M, T]
    safe_edges = jnp.maximum(tri_edges, 0)
    tri_verts = jnp.take_along_axis(
        everts[:, None, :, :].repeat(MAX_TRIS, axis=1),
        safe_edges[..., None].repeat(3, axis=-1),
        axis=2,
    )  # [M, T, 3, 3]
    return tri_verts, valid


def _tri_area(tri_verts):
    e1 = tri_verts[..., 1, :] - tri_verts[..., 0, :]
    e2 = tri_verts[..., 2, :] - tri_verts[..., 0, :]
    return 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)


def _all_cube_indices(S):
    n = S - 1
    r = jnp.arange(n, dtype=jnp.int32)
    I, J, K = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([I.reshape(-1), J.reshape(-1), K.reshape(-1)], axis=-1)


def _corner_areas(vals, isoval):
    """Per-triangle areas from 8 corner-value arrays of any common shape.

    ``vals[i]`` holds the level value at corner i (CORNERS order) of each
    cube; all 8 arrays share a shape ``[...]``. Edge interpolation parameters
    are elementwise, and triangle geometry is selected from the 12 edge-local
    vertices with where-chains driven by tiny 256-entry table lookups —
    everything fuses into VPU work with no data-dependent gathers from the
    level grid. Returns areas ``[..., MAX_TRIS]`` (0 for inactive slots).
    """
    case = sum(
        (vals[i] >= isoval).astype(jnp.int32) * (1 << i) for i in range(8)
    )

    # local edge-vertex coordinates (relative to the cube origin — areas are
    # translation invariant, so absolute positions never materialize)
    everts = []  # 12 x (3 coordinate arrays or python floats)
    for e in range(12):
        a, b = int(EDGES[e, 0]), int(EDGES[e, 1])
        va, vb = vals[a], vals[b]
        denom = vb - va
        t = jnp.where(jnp.abs(denom) > 1e-12, (isoval - va) / jnp.where(denom == 0, 1.0, denom), 0.5)
        t = jnp.clip(t, 0.0, 1.0)
        coords = []
        for ci in range(3):
            ca, cb = float(CORNERS[a][ci]), float(CORNERS[b][ci])
            coords.append(ca + t * (cb - ca) if ca != cb else ca)
        everts.append(coords)

    # one nibble-packed lookup per word instead of 15 per-slot gathers:
    # gathers are the expensive primitive on TPU, the unpack is free VPU work
    from zeroshape_tpu.ops.mc_tables import NIBBLE_SENTINEL, PACKED_TRI_HI, PACKED_TRI_LO

    lo = jnp.take(jnp.asarray(PACKED_TRI_LO), case).astype(jnp.uint32)
    hi = jnp.take(jnp.asarray(PACKED_TRI_HI), case).astype(jnp.uint32)

    def unpack(slot, k):
        pos = slot * 3 + k
        word = lo if pos < 8 else hi
        nib = jax.lax.shift_right_logical(word, jnp.uint32(4 * (pos % 8))) & jnp.uint32(0xF)
        nib = nib.astype(jnp.int32)
        return jnp.where(nib == NIBBLE_SENTINEL, -1, nib)

    zeros = jnp.zeros_like(case, dtype=jnp.float32)

    def select_coord(eid, ci):
        out = zeros
        for e in range(12):
            ve = everts[e][ci]
            ve = ve if isinstance(ve, jnp.ndarray) else jnp.full_like(zeros, ve)
            out = jnp.where(eid == e, ve, out)
        return out

    slot_areas = []
    for slot in range(MAX_TRIS):
        eids = [unpack(slot, k) for k in range(3)]
        v = [
            [select_coord(eids[k], ci) for ci in range(3)] for k in range(3)
        ]  # [vert][coord]
        e1 = [v[1][c] - v[0][c] for c in range(3)]
        e2 = [v[2][c] - v[0][c] for c in range(3)]
        cx = e1[1] * e2[2] - e1[2] * e2[1]
        cy = e1[2] * e2[0] - e1[0] * e2[2]
        cz = e1[0] * e2[1] - e1[1] * e2[0]
        area = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)
        slot_areas.append(jnp.where(eids[0] >= 0, area, 0.0))
    return jnp.stack(slot_areas, axis=-1)  # [..., T]


def _dense_slab_areas(slab_vals, isoval):
    """Areas for a z-slab of cubes via shifted-slice corner views.

    Args:
      slab_vals: [m+1, S, S] level values (z-slab including the far plane).
    Returns:
      areas [m, S-1, S-1, MAX_TRIS] (0 for inactive table slots).
    """
    S = slab_vals.shape[1]
    n = S - 1
    m = slab_vals.shape[0] - 1

    def view(corner):
        dx, dy, dz = (int(v) for v in corner)
        return slab_vals[dx : dx + m, dy : dy + n, dz : dz + n]

    return _corner_areas([view(CORNERS[i]) for i in range(8)], isoval)


def triangle_areas(level, isoval=0.5, slab=8):
    """Areas of all candidate triangles, [n_cubes * MAX_TRIS] (0 = inactive).

    Processes the grid in z-slabs via lax.map to bound peak memory; each slab
    is dense shifted-slice math (see :func:`_dense_slab_areas`).
    """
    S = level.shape[0]
    n = S - 1
    # largest slab <= requested that divides n, so any vox_res works
    slab = max(d for d in range(1, min(slab, n) + 1) if n % d == 0)

    def slab_fn(i0):
        slab_vals = jax.lax.dynamic_slice(level, (i0, 0, 0), (slab + 1, S, S))
        return _dense_slab_areas(slab_vals, isoval)  # [slab, n, n, T]

    starts = jnp.arange(0, n, slab, dtype=jnp.int32)
    areas = jax.lax.map(slab_fn, starts)  # [n/slab, slab, n, n, T]
    return areas.reshape(-1)


def sample_surface_points(level, key, num_points=10000, isoval=0.5, slab=8):
    """Area-uniform points on the isosurface of ``level`` [S, S, S].

    Fully on-device, fixed output shape [num_points, 3] in grid-index
    coordinates. Empty surfaces return zeros (matching the reference's
    empty-mesh fallback, eval_3D.py:261-263).

    This fuses the reference's mcubes -> trimesh.sample pipeline into one
    XLA program: per-triangle areas -> CDF -> inverse-transform sampling ->
    on-the-fly reconstruction of only the ~num_points chosen triangles.
    """
    S = level.shape[0]
    n = S - 1
    areas = triangle_areas(level, isoval, slab)  # [n^3 * T]
    cdf = jnp.cumsum(areas)
    total = cdf[-1]

    k1, k2 = jax.random.split(key)
    slots = _draw_slots(cdf, k1, num_points)

    cube_ids = slots // MAX_TRIS
    tri_ids = (slots % MAX_TRIS).astype(jnp.int32)
    base = jnp.stack(
        [
            cube_ids // (n * n),
            (cube_ids // n) % n,
            cube_ids % n,
        ],
        axis=-1,
    ).astype(jnp.int32)
    pts = _sample_from_tris(level, base, tri_ids, k2, isoval)
    return jnp.where(total > 0, pts, jnp.zeros_like(pts))


def _draw_slots(cdf, key, num_points):
    """Inverse-CDF slot draw, u kept STRICTLY below the total.

    At u == total (a ~1-in-2^24 fp32 rounding event) searchsorted returns
    the slot count and a plain clamp would land on the trailing slot — which
    is almost always an inactive (-1) one, emitting a garbage off-surface
    point. Scaling by (1 - 2^-22) keeps u below total by more than one ulp,
    and side='right' then always lands on a positive-area slot (zero-area
    slots are cdf plateaus, which side='right' skips).
    """
    total = cdf[-1]
    u = jax.random.uniform(key, (num_points,)) * (total * (1.0 - 2.0 ** -22))
    return jnp.minimum(jnp.searchsorted(cdf, u, side="right"), cdf.shape[0] - 1)


def _sample_from_tris(level, base_idx, tri_ids, key, isoval):
    """Reconstruct the chosen triangles and draw one uniform point on each
    (sqrt-trick barycentric sampling); shared by both samplers."""
    tri_verts, _ = _cube_triangles(level, base_idx, isoval)  # [P, T, 3, 3]
    tri = jnp.take_along_axis(
        tri_verts, tri_ids[:, None, None, None].repeat(3, 2).repeat(3, 3), axis=1
    )[:, 0]  # [P, 3, 3]
    r = jax.random.uniform(key, (tri_ids.shape[0], 2))
    su = jnp.sqrt(r[:, :1])
    b0 = 1.0 - su
    b1 = su * (1.0 - r[:, 1:])
    b2 = su * r[:, 1:]
    return b0 * tri[:, 0] + b1 * tri[:, 1] + b2 * tri[:, 2]


def sample_surface_points_cells(
    level, cell_ids, cell_valid, key, num_points=10000, isoval=0.5, factor=4
):
    """Area-uniform isosurface samples, restricted to the given coarse cells.

    Companion to metrics/eval3d.occupancy_grid_hierarchical: the coarse-to-
    fine decode already knows which ``factor``-sized cells can contain the
    surface, so the per-triangle area pass only needs those cells' cubes —
    ~8x less VPU work than the dense pass at a typical active fraction. When
    the coarse margin test identifies every crossing (exact on every tested
    field), the triangle set and its areas are identical to
    :func:`sample_surface_points`; only the CDF ordering differs (cell-major
    instead of row-major), so the same key draws a different — but
    identically distributed — point set. Caveat: if the margin heuristic
    ever missed a crossing, exact fine values scattered onto planes shared
    with refined neighbors could create straddling cubes inside non-active
    cells, which this sampler would skip while the dense sampler finds them
    — one reason final metric runs default to the dense decode + dense
    sampler (eval.hier_final).

    Args:
      level: [S, S, S] sigmoid occupancies, S = nc * factor + 1.
      cell_ids: [K] flat coarse-cell ids (x-major over an nc^3 cell grid).
      cell_valid: [K] bool; padding entries contribute zero area.
    Returns:
      [num_points, 3] points in grid-index coordinates (zeros if no surface).
    """
    S = level.shape[0]
    n = S - 1
    assert n % factor == 0, (S, factor)
    nc = n // factor
    K = cell_ids.shape[0]
    f1 = factor + 1

    cell = jnp.stack(
        [cell_ids // (nc * nc), (cell_ids // nc) % nc, cell_ids % nc], axis=-1
    ).astype(jnp.int32)  # [K, 3]
    base = cell * factor
    r = jnp.arange(f1, dtype=jnp.int32)
    bx = base[:, 0, None] + r[None]  # [K, f1]
    by = base[:, 1, None] + r[None]
    bz = base[:, 2, None] + r[None]
    blocks = level[
        bx[:, :, None, None], by[:, None, :, None], bz[:, None, None, :]
    ]  # [K, f1, f1, f1]

    def view(corner):
        dx, dy, dz = (int(v) for v in corner)
        return blocks[:, dx : dx + factor, dy : dy + factor, dz : dz + factor]

    areas = _corner_areas([view(CORNERS[i]) for i in range(8)], isoval)
    areas = areas * cell_valid[:, None, None, None, None]
    flat = areas.reshape(-1)  # [K * factor^3 * T]
    cdf = jnp.cumsum(flat)
    total = cdf[-1]

    k1, k2 = jax.random.split(key)
    slots = _draw_slots(cdf, k1, num_points)

    tri_ids = (slots % MAX_TRIS).astype(jnp.int32)
    cube_local = slots // MAX_TRIS  # [P] index into [K, f, f, f]
    k_idx = cube_local // factor**3
    rem = cube_local % factor**3
    local = jnp.stack(
        [rem // (factor * factor), (rem // factor) % factor, rem % factor], axis=-1
    ).astype(jnp.int32)
    base_idx = base[k_idx] + local  # [P, 3] global cube coords
    pts = _sample_from_tris(level, base_idx, tri_ids, k2, isoval)
    return jnp.where(total > 0, pts, jnp.zeros_like(pts))


def marching_cubes_mesh(level, isoval=0.5):
    """Host-side mesh extraction: returns (vertices [V, 3], faces [F, 3]).

    Triangles reference vertices by *canonical global grid edge* — the pair
    (lowest grid endpoint, axis) identifies each isosurface vertex exactly, so
    welding is integer-exact and the mesh is watertight by construction.
    Used for mesh export (demo/vis), not the eval hot path.
    """
    level = np.asarray(level)
    S = level.shape[0]
    n = S - 1
    base = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij"), -1
    ).reshape(-1, 3)

    corner_vals = np.take(
        level.reshape(-1),
        (base[:, None, 0] + _CORNER_OFF[None, :, 0]) * S * S
        + (base[:, None, 1] + _CORNER_OFF[None, :, 1]) * S
        + (base[:, None, 2] + _CORNER_OFF[None, :, 2]),
    )  # [M, 8]
    case = ((corner_vals >= isoval) << np.arange(8)).sum(axis=1)
    tri_edges = TRI_TABLE[case]  # [M, T, 3] cube-local edge ids
    valid = tri_edges[..., 0] >= 0
    if not valid.any():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # canonical global edge id for each (cube, local edge): lower endpoint + axis
    ca = CORNERS[EDGES[:, 0]].astype(np.int64)  # [12, 3]
    cb = CORNERS[EDGES[:, 1]].astype(np.int64)
    lo_corner = np.minimum(ca, cb)  # [12, 3]
    axis = np.argmax(np.abs(ca - cb), axis=1)  # [12]
    cube_idx, tri_idx = np.nonzero(valid)
    e_local = tri_edges[cube_idx, tri_idx]  # [F, 3]
    b = base[cube_idx].astype(np.int64)  # [F, 3]
    lo = b[:, None, :] + lo_corner[e_local]  # [F, 3, 3] grid point
    ax = axis[e_local]  # [F, 3]
    gid = ((lo[..., 0] * S + lo[..., 1]) * S + lo[..., 2]) * 3 + ax  # [F, 3]

    uniq, inv = np.unique(gid.reshape(-1), return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)

    # vertex positions: interpolate along each unique global edge
    axis_u = (uniq % 3).astype(np.int64)
    p = uniq // 3
    lo_pt = np.stack([p // (S * S), (p // S) % S, p % S], axis=-1)  # [V, 3]
    hi_pt = lo_pt.copy()
    hi_pt[np.arange(len(uniq)), axis_u] += 1
    va = level[lo_pt[:, 0], lo_pt[:, 1], lo_pt[:, 2]]
    vb = level[hi_pt[:, 0], hi_pt[:, 1], hi_pt[:, 2]]
    denom = vb - va
    t = np.where(np.abs(denom) > 1e-12, (isoval - va) / np.where(denom == 0, 1, denom), 0.5)
    t = np.clip(t, 0.0, 1.0)
    verts = lo_pt.astype(np.float64) + t[:, None] * (hi_pt - lo_pt)
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[good]
