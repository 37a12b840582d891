"""3D shape evaluation: dense occupancy decode, Chamfer, F-score, alignment.

TPU-native counterpart of the reference ``utils/eval_3D.py``. The pipeline
stays on device from occupancy decode through Chamfer scoring:

  * :func:`occupancy_grid` — decodes the (N+1)^3 query grid through the
    implicit network's cached latents in fixed-size point tiles under
    ``lax.map``. The reference re-runs the full joint attention (latent
    self-attention included) for every z-slice (eval_3D.py:34-45); here the
    latents are encoded once (see models/implicit.py) and only the point
    cross-attention + MLP run per tile.
  * :func:`brute_force_search` — best-of-6912-rotations alignment
    (eval_3D.py:140-170) as a batched scan; only the winning rotation's cloud
    is materialized.
  * :func:`icp` — SVD-based iterative closest point (eval_3D.py:271-284).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from zeroshape_tpu.camera import get_rotation_sphere
from zeroshape_tpu.ops.chamfer import chamfer_distance, nn_min_squared_fast

DEFAULT_F_THRESHOLDS = (0.005, 0.01, 0.02, 0.05, 0.1, 0.2)


def get_dense_3D_grid(vox_res, rng=(-1.5, 1.5)):
    """[(N+1)^3, 3] grid points (reference eval_3D.py:10-20 uses N+1 samples)."""
    lo, hi = rng
    g = jnp.linspace(lo, hi, vox_res + 1)
    X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
    return jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)


def _map_point_tiles(fn, points, tile_points):
    """Pad a flat [P, 3] point set to whole tiles and lax.map ``fn`` over
    them; tile size is clamped to P so padding never exceeds one tile (a
    729-point coarse lattice must not cost a 16641-point decode).
    Returns (stacked fn outputs with a leading tile axis, P)."""
    P = points.shape[0]
    tp = max(1, min(tile_points, P))
    n_tiles = -(-P // tp)
    pts = jnp.pad(points, ((0, n_tiles * tp - P), (0, 0)))
    return jax.lax.map(fn, pts.reshape(n_tiles, tp, 3)), P


def _untile(x, batch_size, P):
    """[n_tiles, B, T, ...] -> [B, P, ...] (inverse of _map_point_tiles)."""
    trailing = x.shape[3:]
    x = jnp.moveaxis(x, 1, 0).reshape((batch_size, -1) + trailing)
    return x[:, :P]


def occupancy_grid(decode_fn, points, batch_size, tile_points=16641):
    """Decode occupancy logits for a flat point set in tiles.

    Args:
      decode_fn: points [B, T, 3] -> logits [B, T] (closure over latent caches).
      points: [P, 3] flat query grid (shared across the batch).
      batch_size: B of the latent caches.
      tile_points: queries per tile (default = one 129^2 slice).
    Returns:
      sigmoid occupancies [B, P].
    """

    def tile_fn(tile):
        batch_pts = jnp.broadcast_to(tile[None], (batch_size,) + tile.shape)
        return decode_fn(batch_pts)  # [B, T]

    occ, P = _map_point_tiles(tile_fn, points, tile_points)
    return jax.nn.sigmoid(_untile(occ, batch_size, P))


def _upsample_nearest(level_c, factor):
    """[Sc, Sc, Sc] -> [(Sc-1)*factor+1]^3 nearest-lower-corner upsample.

    Pure repeats — no matmuls, no gathers. Sign-correctness of the fill only
    requires that every filled value be *some* corner of an all-same-side
    cell, which nearest satisfies (a fine point maps to the lower corner of
    the coarse cell that owns it; boundary planes map to a corner shared by
    both adjacent cells; the far boundary planes copy the owning cell's near
    corner via the edge pad — still a corner of that cell).
    """
    n = level_c.shape[0] - 1
    c = level_c[:n, :n, :n]
    f = jnp.repeat(jnp.repeat(jnp.repeat(c, factor, 0), factor, 1), factor, 2)
    return jnp.pad(f, ((0, 1), (0, 1), (0, 1)), mode="edge")


def resolve_hier_capacity(vox_res, capacity=None, factor=4):
    """The refined-cell budget occupancy_grid_hierarchical actually uses.

    None -> 1/8 of the coarse cells (4096 at vox 128), clamped to the cell
    count. Calibrated round 5 on trained fields: the margin test's raw
    demand across 2x74 held-out-object reconstructions peaked at 2533 cells
    (p95 2209), and the Run-A overfit field also fit in 4096
    (BASELINE.md hier A/B) - so 1/8 keeps >1.6x headroom over every field
    measured while halving the fine-pass work of the old 1/4 default, and
    the headline bench capacity now IS the engine default. Overflow is
    still warned (validation) or raised (metric runs) downstream. Shared
    with callers that report overflow so the warning threshold matches the
    decode.
    """
    nc = vox_res // factor
    if capacity is None:
        capacity = max(256, nc**3 // 8)
    return max(1, min(capacity, nc**3))


def hier_decode_saves_work(vox_res, capacity=None, factor=4, tile_points=16641):
    """Whether the coarse-to-fine decode issues fewer DECODED queries than
    dense, counting the tile padding each path actually pays: the hier decode
    tiles both its passes to ``tile_points`` (clamped to the point count, so
    padding is bounded by one tile), while the engine's dense path tiles to
    one (vox_res+1)^2 slice, which divides (vox_res+1)^3 exactly. At small
    vox_res or large capacity hier can exceed the dense count, in which case
    callers should keep the dense path.
    """

    def tiled(P):
        tp = max(1, min(tile_points, P))
        return -(-P // tp) * tp

    cap = resolve_hier_capacity(vox_res, capacity, factor)
    nc = vox_res // factor
    hier_queries = tiled(cap * (factor + 1) ** 3) + tiled((nc + 1) ** 3)
    return hier_queries < (vox_res + 1) ** 3


def _select_active_cells(occ_c, margin, capacity):
    """Pick the coarse cells that may contain the isosurface.

    A cell is active when its 8 corner occupancies are not all confidently on
    one side of 0.5: it either straddles 0.5 (a crossing is certain) or some
    corner lies inside the ``margin`` band (a sub-cell crossing is possible).
    If the active set overflows ``capacity``, straddling cells always outrank
    band-only cells (a dropped straddler would put a wrong-side fill where a
    crossing is certain), and within each class the cell whose closest corner
    is nearest 0.5 wins.

    Returns (flat cell ids [capacity], valid mask [capacity], n_active []).
    """
    Sc = occ_c.shape[0]
    n = Sc - 1
    corners = [
        occ_c[dx : dx + n, dy : dy + n, dz : dz + n]
        for dx in (0, 1)
        for dy in (0, 1)
        for dz in (0, 1)
    ]
    cmin = corners[0]
    cmax = corners[0]
    amin = jnp.abs(corners[0] - 0.5)
    for c in corners[1:]:
        cmin = jnp.minimum(cmin, c)
        cmax = jnp.maximum(cmax, c)
        amin = jnp.minimum(amin, jnp.abs(c - 0.5))
    active = (cmin < 0.5 + margin) & (cmax > 0.5 - margin)
    straddle = (cmin < 0.5) & (cmax >= 0.5)
    score = jnp.where(
        active, jnp.where(straddle, 1.0, 0.0) - amin, -jnp.inf
    ).reshape(-1)
    top, ids = jax.lax.top_k(score, capacity)
    return ids, top > -jnp.inf, jnp.sum(active.astype(jnp.int32))


def occupancy_grid_hierarchical(
    decode_fn,
    vox_res,
    rng=(-1.5, 1.5),
    batch_size=1,
    factor=4,
    capacity=None,
    margin=0.45,
    tile_points=16641,
    return_stats=False,
    return_cells=False,
):
    """Coarse-to-fine dense occupancy decode: [B, S, S, S] sigmoid, S=vox_res+1.

    The dense (N+1)^3 decode spends >95% of its queries on points far from
    the surface whose exact occupancy never matters: marching cubes and
    surface sampling only read (a) the *sign* pattern away from the surface
    and (b) exact values in crossing cubes. So: decode a stride-``factor``
    coarse lattice, mark the coarse cells whose corners are not all
    confidently on one side of 0.5 (``margin`` band, default 0.45 = refine
    unless all corners are <0.05 or >0.95), decode the fine lattice exactly
    only inside those cells, and fill the rest with the owning cell's nearest
    coarse corner — a corner of an all-same-side cell, hence sign-correct
    wherever the margin test passes. With the default margin
    this reproduces the dense decode's surface samples exactly on every
    tested field while doing ~4x less decoder work (same spirit as the
    coarse-to-fine brute-force alignment; pass capacity=None sized
    generously, or use :func:`occupancy_grid` for the exhaustive path).

    Args:
      decode_fn: points [B, T, 3] -> logits [B, T].
      capacity: static max refined cells per sample (default: 1/4 of cells).
      return_stats: also return n_active [B] — the number of cells the margin
        test marked; n_active > capacity means some were dropped and the
        caller should warn / raise the capacity.
      return_cells: also return (cell_ids [B, K], valid [B, K]) for the
        active-cells surface sampler (ops/marching_cubes.
        sample_surface_points_cells).
    """
    assert vox_res % factor == 0, (vox_res, factor)
    S = vox_res + 1
    lo, hi = rng
    nc = vox_res // factor  # coarse cells per axis
    Sc = nc + 1
    capacity = resolve_hier_capacity(vox_res, capacity, factor)

    g = jnp.linspace(lo, hi, S)
    gc = g[::factor]
    Xc, Yc, Zc = jnp.meshgrid(gc, gc, gc, indexing="ij")
    coarse_pts = jnp.stack([Xc, Yc, Zc], axis=-1).reshape(-1, 3)
    occ_c = occupancy_grid(decode_fn, coarse_pts, batch_size, tile_points)
    occ_c = occ_c.reshape(batch_size, Sc, Sc, Sc)

    ids, valid, n_active = jax.vmap(
        lambda o: _select_active_cells(o, margin, capacity)
    )(occ_c)

    # fine lattice points of each selected cell: (factor+1)^3 per cell (the
    # +1 shares the neighbor's boundary plane; duplicates write equal values)
    off = jnp.arange(factor + 1, dtype=jnp.int32)
    OX, OY, OZ = jnp.meshgrid(off, off, off, indexing="ij")
    offs = jnp.stack([OX, OY, OZ], axis=-1).reshape(-1, 3)  # [(f+1)^3, 3]
    cell = jnp.stack([ids // (nc * nc), (ids // nc) % nc, ids % nc], axis=-1)
    fidx = cell[:, :, None, :] * factor + offs[None, None]  # [B, K, P, 3]
    # positions via per-axis [B, K, f+1] gathers broadcast over the cell
    # block — 50x fewer gathered elements than g[fidx] on the full point set
    f1 = factor + 1
    ax = g[cell[..., 0, None] * factor + off[None, None]]  # [B, K, f+1]
    ay = g[cell[..., 1, None] * factor + off[None, None]]
    az = g[cell[..., 2, None] * factor + off[None, None]]
    B, K = ax.shape[:2]
    pts = jnp.stack(
        [
            jnp.broadcast_to(ax[:, :, :, None, None], (B, K, f1, f1, f1)),
            jnp.broadcast_to(ay[:, :, None, :, None], (B, K, f1, f1, f1)),
            jnp.broadcast_to(az[:, :, None, None, :], (B, K, f1, f1, f1)),
        ],
        axis=-1,
    )
    Pc = f1**3
    pts = pts.reshape(B, K * Pc, 3)

    # tile the per-sample point sets through decode_fn (clamped like
    # occupancy_grid so padding never exceeds one tile)
    P = K * Pc
    tp = max(1, min(tile_points, P))
    n_tiles = -(-P // tp)
    pad = n_tiles * tp - P
    pts = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)))
    tiles = jnp.moveaxis(pts.reshape(B, n_tiles, tp, 3), 1, 0)
    occ_f = jax.lax.map(decode_fn, tiles)  # [n_tiles, B, T]
    occ_f = jax.nn.sigmoid(jnp.moveaxis(occ_f, 1, 0).reshape(B, -1)[:, :P])

    fill = jax.vmap(lambda o: _upsample_nearest(o, factor))(occ_c)

    flat = (fidx[..., 0] * S + fidx[..., 1]) * S + fidx[..., 2]  # [B, K, P]
    flat = jnp.where(valid[:, :, None], flat, S * S * S)  # OOB -> dropped

    def scatter(fill_b, flat_b, occ_b):
        return fill_b.reshape(-1).at[flat_b.reshape(-1)].set(occ_b, mode="drop")

    level = jax.vmap(scatter)(fill, flat, occ_f.reshape(B, -1))
    level = level.reshape(B, S, S, S)
    out = (level,)
    if return_stats:
        out = out + (n_active,)
    if return_cells:
        out = out + (ids, valid)
    return out if len(out) > 1 else level


def occupancy_grid_with_attn(decode_fn, points, batch_size, vox_res, tile_points=16641):
    """Grid decode that also returns z-averaged attention maps.

    Args:
      decode_fn: points [B, T, 3] -> (logits [B, T], attn [B, T, L]).
      points: [(N+1)^3, 3] grid (x-major, as from get_dense_3D_grid).
    Returns:
      (occ [B, (N+1)^3] sigmoid, attn_xy [B, N+1, N+1, L]) — attention
      averaged over the z axis (reference eval_3D.py:50-52).
    """
    S = vox_res + 1

    def tile_fn(tile):
        batch_pts = jnp.broadcast_to(tile[None], (batch_size,) + tile.shape)
        occ, attn = decode_fn(batch_pts)
        return occ, attn

    (occ, attn), P = _map_point_tiles(tile_fn, points, tile_points)
    occ = _untile(occ, batch_size, P)
    attn = _untile(attn, batch_size, P)
    L = attn.shape[-1]
    attn = attn.reshape(batch_size, S, S, S, L).mean(axis=3)  # avg over z
    return jax.nn.sigmoid(occ), attn


def attention_frames(attn_xy, image, vox_res, feat_res, n_global=1):
    """Serpentine sweep of attention overlays (reference eval_3D.py:60-80).

    Args:
      attn_xy: [S, S, n_global + feat_res^2] z-averaged attention of one sample.
      image: [H, W, 3] float RGB in [0, 1].
    Returns:
      list of [H, W, 3] float frames.
    """
    import numpy as np_

    from zeroshape_tpu.ops.image import resize_bilinear
    from zeroshape_tpu.vis import show_att_on_image

    H, W = image.shape[:2]
    N = vox_res
    attn_xy = np_.asarray(attn_xy)
    attn_global = attn_xy[..., :n_global].sum(-1, keepdims=True)  # [S, S, 1]
    attn_local = attn_xy[..., n_global:].reshape(
        attn_xy.shape[0], attn_xy.shape[1], feat_res, feat_res
    )
    attn_vis = attn_global[..., None] + attn_local  # [S, S, fr, fr]
    frames = []
    for row in range(0, N, 8):
        col_range = (
            range(0, N // 8 * 8 + 1, 8) if row % 16 == 0 else range(N // 8 * 8, -1, -8)
        )
        for col in col_range:
            cur = attn_vis[col, row]  # x is col
            cur = np_.asarray(
                resize_bilinear(
                    jnp.asarray(cur, jnp.float32)[None, :, :, None], (H, W),
                    align_corners=False,
                )
            )[0, :, :, 0]
            cur = cur / max(cur.max(), 1e-12)
            frames.append(show_att_on_image(np_.asarray(image), cur))
    return frames


def normalize_pc(pc):
    """Center by mean; scale by max xy extent (reference eval_3D.py:93-102)."""
    assert pc.ndim == 3
    pc_zmean = pc - pc.mean(axis=1, keepdims=True)
    length_x = pc_zmean[:, :, 0].max(axis=-1) - pc_zmean[:, :, 0].min(axis=-1)
    length_y = pc_zmean[:, :, 1].max(axis=-1) - pc_zmean[:, :, 1].min(axis=-1)
    length_max = jnp.maximum(length_x, length_y)[:, None, None]
    return pc_zmean / (length_max + 1e-7)


def compute_fscore(dist1, dist2, thresholds=DEFAULT_F_THRESHOLDS):
    """F-score at each threshold; NaN -> 0 (reference eval_3D.py:215-231)."""
    scores = []
    for t in thresholds:
        precision = jnp.mean((dist1 < t).astype(jnp.float32), axis=1)
        recall = jnp.mean((dist2 < t).astype(jnp.float32), axis=1)
        denom = precision + recall
        f = jnp.where(denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)
        scores.append(f)
    return jnp.stack(scores, axis=1)  # [B, n_thresholds]


def chamfer_eval(pc_pred, pc_gt, use_pallas=None):
    """(acc [B, N], comp [B, M]) sqrt NN distances."""
    d1, d2, _, _ = chamfer_distance(pc_pred, pc_gt, use_pallas)
    return d1, d2


def brute_force_search_impl(
    pc_pred,
    pc_gt,
    thresholds=DEFAULT_F_THRESHOLDS,
    rot_batch=48,
    use_pallas=None,
    rot_samples=(24, 24, 12),
    prune=(1024, 128),
    fast_coarse=True,
):
    """Best-of-6912-rotations alignment of one sample.

    The search is coarse-to-fine: every rotation is first scored on a
    ``prune[0]``-point subsample of both clouds (a prefix of the predicted
    cloud, whose points are i.i.d. area-uniform draws, and an evenly strided
    gather of the GT cloud, whose file order is arbitrary), then the best
    ``prune[1]`` candidates are rescored with the full exact Chamfer. The *reported* metrics always come from the exact full-cloud
    pass; pruning only narrows which rotations get the exact treatment. With
    (1024, 128) this removes ~96% of the full-resolution NN work, which is
    what makes evaluate.py's per-sample protocol (eval_3D.py:140-170)
    tractable on TPU where the min-reduction is VPU-bound. Pass prune=None
    for the exhaustive reference behavior.

    Args:
      pc_pred [P, 3], pc_gt [G, 3].
    Returns dict: best (acc, comp, f_score [n_thr], pc_pred [P, 3] rotated+
    normalized, pc_gt normalized).
    """
    rotations = get_rotation_sphere(
        azim_sample=rot_samples[0],
        elev_sample=rot_samples[1],
        roll_sample=rot_samples[2],
    )
    n_rot = rotations.shape[0]
    gt_n = normalize_pc(pc_gt[None])  # [1, G, 3]

    if prune is not None and prune[1] < n_rot:
        m, K = prune
        m = min(m, pc_pred.shape[0], pc_gt.shape[0])
        pred_sub = pc_pred[:m]  # i.i.d. by construction (sample_surface_points)
        # GT clouds come verbatim from dataset .npy files whose point order
        # may be spatially sorted (mesh traversal); a prefix would then be a
        # spatially biased subsample that misranks rotations. An evenly
        # strided gather is representative under any ordering.
        gt_idx = np.round(np.linspace(0, pc_gt.shape[0] - 1, m)).astype(np.int32)
        gt_sub = normalize_pc(pc_gt[gt_idx][None])

        def coarse_fn(R):
            rot = normalize_pc(jnp.einsum("rij,pj->rpi", R, pred_sub))
            gt_rep = jnp.broadcast_to(gt_sub, (R.shape[0],) + gt_sub.shape[1:])
            if fast_coarse:
                # ranking-grade scorer: bf16 matmul distances, no argmin or
                # refinement — survivors get the exact chamfer below
                acc_d = jnp.sqrt(nn_min_squared_fast(rot, gt_rep, use_pallas))
                comp_d = jnp.sqrt(nn_min_squared_fast(gt_rep, rot, use_pallas))
            else:
                acc_d, comp_d = chamfer_eval(rot, gt_rep, use_pallas)
            return (acc_d.mean(axis=1) + comp_d.mean(axis=1)) / 2.0

        cb = min(rot_batch * 4, n_rot)
        c_pad = -(-n_rot // cb) * cb - n_rot
        rot_p = jnp.concatenate([rotations, jnp.tile(rotations[:1], (c_pad, 1, 1))])
        cd_coarse = jax.lax.map(
            coarse_fn, rot_p.reshape(-1, cb, 3, 3)
        ).reshape(-1)[:n_rot]
        _, top_idx = jax.lax.top_k(-cd_coarse, K)
        candidates = rotations[top_idx]
    else:
        candidates = rotations

    n_cand = candidates.shape[0]
    rb = min(rot_batch, n_cand)
    pad = -(-n_cand // rb) * rb - n_cand
    cand_p = jnp.concatenate([candidates, jnp.tile(candidates[:1], (pad, 1, 1))])

    def batch_fn(R):
        rot = jnp.einsum("rij,pj->rpi", R, pc_pred)  # [rb, P, 3]
        rot = normalize_pc(rot)
        gt_rep = jnp.broadcast_to(gt_n, (R.shape[0],) + gt_n.shape[1:])
        acc_d, comp_d = chamfer_eval(rot, gt_rep, use_pallas)
        f = compute_fscore(acc_d, comp_d, thresholds)  # [rb, n_thr]
        return acc_d.mean(axis=1), comp_d.mean(axis=1), f

    accs, comps, fs = jax.lax.map(batch_fn, cand_p.reshape(-1, rb, 3, 3))
    accs = accs.reshape(-1)[:n_cand]
    comps = comps.reshape(-1)[:n_cand]
    fs = fs.reshape(-1, fs.shape[-1])[:n_cand]
    cd = (accs + comps) / 2.0
    best = jnp.argmin(cd)
    R_best = cand_p[best]
    pc_best = normalize_pc(jnp.einsum("ij,pj->pi", R_best, pc_pred)[None])[0]
    return {
        "acc": accs[best],
        "comp": comps[best],
        "f_score": fs[best],
        "pc_pred": pc_best,
        "pc_gt": gt_n[0],
        "rotation": R_best,
    }


brute_force_search = partial(
    jax.jit,
    static_argnames=(
        "rot_batch", "thresholds", "use_pallas", "rot_samples", "prune", "fast_coarse",
    ),
)(brute_force_search_impl)


def make_brute_force_batch(
    mesh=None,
    axis_name: str = "data",
    **static,
):
    """Batched brute-force alignment: (pred [B, P, 3], gt [B, G, 3]) -> dict
    of stacked per-sample results.

    Replaces the per-sample Python loop over :func:`brute_force_search` with
    one jitted ``vmap``; with ``mesh`` given, the batch axis is sharded over
    the mesh's data axis so each device aligns its own samples in parallel
    (the reference evaluates data-parallel across ranks,
    model/shape_engine.py:413-429).
    """
    fn = jax.vmap(partial(brute_force_search_impl, **static))
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(mesh, P(axis_name))
    # per-sample metrics come back replicated so every process of a
    # multi-host run holds the full rows (reference all_gathers them,
    # shape_engine.py:413-429); the big clouds stay sharded — each process
    # dumps only the samples it owns
    out_sh = {
        "acc": NamedSharding(mesh, P()),
        "comp": NamedSharding(mesh, P()),
        "f_score": NamedSharding(mesh, P()),
        "rotation": NamedSharding(mesh, P()),
        "pc_pred": bsh,
        "pc_gt": bsh,
    }
    return jax.jit(fn, in_shardings=(bsh, bsh), out_shardings=out_sh)


def icp(X1, X2, num_iter=50, use_pallas=None):
    """SVD ICP aligning X1 [B, N, 3] onto X2 [B, M, 3] (eval_3D.py:271-284)."""

    def step(X1, _):
        _, _, idx, _ = chamfer_distance(X1, X2, use_pallas)
        X2_corresp = jnp.take_along_axis(X2, idx[..., None], axis=1)
        t1 = X1.mean(axis=-2, keepdims=True)
        t2 = X2_corresp.mean(axis=-2, keepdims=True)
        H = jnp.einsum("bni,bnj->bij", X1 - t1, X2_corresp - t2)
        U, S, Vt = jnp.linalg.svd(H)
        V = jnp.swapaxes(Vt, -1, -2)
        R = jnp.einsum("bij,bkj->bik", V, U)
        det = jnp.linalg.det(R)
        V_fix = V.at[:, :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[:, None])
        R = jnp.einsum("bij,bkj->bik", V_fix, U)
        X1_new = jnp.einsum("bni,bji->bnj", X1 - t1, R) + t2
        return X1_new, None

    X1_final, _ = jax.lax.scan(step, X1, None, length=num_iter)
    return X1_final


def transform_gt_to_view(dpc_points, pose_gt, flip_xy=False):
    """GT cloud -> view-centered frame (eval_3D.py:120-123, 187-190)."""
    R_gt = pose_gt[..., :3]
    pts = jnp.einsum("bij,bnj->bni", R_gt, dpc_points)
    if flip_xy:
        pts = pts * jnp.asarray([-1.0, -1.0, 1.0])
    return pts
