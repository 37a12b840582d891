"""Camera geometry in pure JAX (vectorized, fixed-shape, mask-based).

Functional equivalents of the reference's ``utils/camera.py``. The reference's
per-sample Python loop in ``valid_norm_fac`` (camera.py:52-78) becomes a masked
batched reduction so the whole pipeline stays jittable and shards over the data
mesh axis without host sync.

Conventions: points are [..., N, 3] float32, poses are [..., 3, 4] (R|t),
intrinsics are [..., 3, 3]. Pixel grid follows the reference: integer pixel
coordinates (x, y, 1), no half-pixel offset (camera.py:80-86).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Pose utilities (reference camera.py:6-49)
# ---------------------------------------------------------------------------

def pose_from(R=None, t=None):
    """Build [..., 3, 4] pose from R [..., 3, 3] and/or t [..., 3]."""
    if R is None and t is None:
        raise ValueError("need R or t")
    if R is None:
        t = jnp.asarray(t, jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), t.shape[:-1] + (3, 3))
    elif t is None:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.zeros(R.shape[:-1], jnp.float32)
    else:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def pose_invert(pose):
    """Invert a rigid [..., 3, 4] pose (R orthonormal)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = (-R_inv @ t)[..., 0]
    return pose_from(R=R_inv, t=t_inv)


def pose_compose_pair(pose_a, pose_b):
    """pose_new(x) = pose_b(pose_a(x))."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return pose_from(R=R_new, t=t_new)


def pose_compose(pose_list):
    pose_new = pose_list[0]
    for p in pose_list[1:]:
        pose_new = pose_compose_pair(pose_new, p)
    return pose_new


# ---------------------------------------------------------------------------
# Unit-sphere normalization of the visible surface (reference camera.py:52-78)
# ---------------------------------------------------------------------------

def valid_norm_fac(seen_points, mask, eps=0.0):
    """Masked per-sample mean + max-radius of the visible surface.

    Args:
      seen_points: [B, HW, 3]
      mask: [B, HW] boolean (or float) validity mask.
    Returns:
      means [B, 3], max_dists [B].

    Vectorized replacement for the reference's python-per-sample loop; masked
    empty samples produce mean 0 / scale 1 (the reference would NaN there).
    """
    mask_f = mask.reshape(seen_points.shape[0], seen_points.shape[1]).astype(seen_points.dtype)
    count = jnp.sum(mask_f, axis=1, keepdims=True)  # [B, 1]
    safe_count = jnp.maximum(count, 1.0)
    means = jnp.sum(seen_points * mask_f[..., None], axis=1) / safe_count  # [B, 3]
    centered = seen_points - means[:, None, :]
    # sqrt has a NaN gradient at exactly 0 (an all-zero depth map lands there);
    # the double-where keeps both primal and gradient finite
    sq = jnp.sum(centered * centered, axis=-1)  # [B, HW]
    dist = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    dist = jnp.where(mask_f > 0, dist, -jnp.inf)
    max_dists = jnp.max(dist, axis=1)  # [B]
    max_dists = jnp.where(count[:, 0] > 0, max_dists, 1.0)
    if eps:
        max_dists = jnp.maximum(max_dists, eps)
    return means, max_dists


def normalize_seen_points(seen_points, mask):
    """Center/scale visible surface to unit sphere; zero the background.

    Mirrors graph_shape.py:138-141. Returns (normalized [B, HW, 3], mean, scale).
    """
    mask_f = mask.reshape(seen_points.shape[0], seen_points.shape[1])
    mean, scale = valid_norm_fac(seen_points, mask_f)
    # guard: an (untrained / degenerate) all-zero depth map gives scale 0
    scale = jnp.maximum(scale, 1e-8)
    out = (seen_points - mean[:, None, :]) / scale[:, None, None]
    out = out * (mask_f > 0).astype(out.dtype)[..., None]
    return out, mean, scale


# ---------------------------------------------------------------------------
# Projection / unprojection (reference camera.py:80-154)
# ---------------------------------------------------------------------------

def get_pixel_grid(H, W, dtype=jnp.float32):
    """[H*W, 3] homogeneous pixel coordinates (x, y, 1)."""
    y = jnp.arange(H, dtype=dtype)
    x = jnp.arange(W, dtype=dtype)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    Z = jnp.ones_like(Y)
    return jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)


def unproj_depth(depth, intr):
    """Unproject a depth map into camera-frame 3D points.

    Args:
      depth: [B, H, W] (or [B, 1, H, W]).
      intr: [B, 3, 3].
    Returns:
      [B, H*W, 3] camera-frame points.
    """
    if depth.ndim == 4:
        depth = depth[:, 0] if depth.shape[1] == 1 else depth.squeeze(-1)
    B, H, W = depth.shape
    K_inv = jnp.linalg.inv(intr.astype(jnp.float32))
    pix = get_pixel_grid(H, W)  # [HW, 3]
    # rays [B, HW, 3] = pix @ K_inv^T
    rays = jnp.einsum("nk,bjk->bnj", pix, K_inv)
    return rays * depth.reshape(B, H * W, 1)


def to_hom(X):
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X_world, pose):
    """[B, N, 3] x [B, 3, 4] -> [B, N, 3]."""
    return to_hom(X_world) @ jnp.swapaxes(pose, -1, -2)


def cam2img(X_cam, intr):
    return X_cam @ jnp.swapaxes(intr, -1, -2)


def proj_points(points, intr, pose):
    points_cam = world2cam(points, pose)
    depth = points_cam[..., 2]
    points_img = cam2img(points_cam, intr)
    points_2D = points_img[..., :2] / points_img[..., 2:]
    return points_2D, depth


# ---------------------------------------------------------------------------
# Rotation builders & brute-force rotation sphere (reference camera.py:156-230)
# ---------------------------------------------------------------------------

def _rot_azim(angles_deg):
    a = jnp.deg2rad(angles_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        axis=-2,
    )


def _rot_elev(angles_deg):
    a = jnp.deg2rad(angles_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        axis=-2,
    )


def _rot_roll(angles_deg):
    a = jnp.deg2rad(angles_deg)
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, s, z], -1),
            jnp.stack([-s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )


azim_to_rotation_matrix = _rot_azim
elev_to_rotation_matrix = _rot_elev
roll_to_rotation_matrix = _rot_roll

# Axis-permutation applied before the Euler product (reference camera.py:223-227).
R_PERMUTE = np.array(
    [[-1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, -1.0, 0.0]], dtype=np.float32
)


def get_rotation_sphere(azim_sample=4, elev_sample=4, roll_sample=4, scales=(1.0)):
    """All rotations R = scale * Rz(roll) Rx(elev) Ry(azim) R_permute.

    Returns [len(scales)*azim*elev*roll, 3, 3], ordered scale-major then
    azim > elev > roll (matching reference loop nesting camera.py:216-229).
    """
    if isinstance(scales, (int, float)):
        scales = (float(scales),)
    azims = np.linspace(0.0, 360.0, num=azim_sample, endpoint=False)
    elevs = np.linspace(0.0, 360.0, num=elev_sample, endpoint=False)
    rolls = np.linspace(0.0, 360.0, num=roll_sample, endpoint=False)
    # grid in the reference's nesting order: azim outer, elev mid, roll inner
    A, E, RL = np.meshgrid(azims, elevs, rolls, indexing="ij")
    A, E, RL = (x.reshape(-1) for x in (A, E, RL))
    Ry = _rot_azim(jnp.asarray(A, jnp.float32))
    Rx = _rot_elev(jnp.asarray(E, jnp.float32))
    Rz = _rot_roll(jnp.asarray(RL, jnp.float32))
    R = Rz @ Rx @ Ry @ jnp.asarray(R_PERMUTE)
    out = jnp.concatenate([s * R for s in scales], axis=0)
    return out
