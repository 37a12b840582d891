"""Analytic-SDF scene generator: ground-truth-perfect synthetic data.

Generates scenes of simple solids (sphere / rounded box / torus / capsule)
with *exact* ground truth — sphere-traced z-depth maps consistent with
``camera.unproj_depth``, analytically-sampled surface point clouds, and
exact SDF supervision samples — written in the reference's released
synthetic-data on-disk layout (reference ``data/synthetic.py:50-170``:
``{subset}/{images_processed,masks,depth,pointclouds,gt_sdf,camera_data,
lists}``). The reference ships no data generator (its data is a fixed
download); this module exists so the training/eval stack can be verified
end-to-end — overfit on analytic shapes, then score the reconstruction
against the *true* surface with the full Chamfer/F-score harness.

Everything here is plain vectorized numpy on the host: it is a data
*writer*, not part of the jitted compute path.

Conventions (matching the pipeline):
  * World frame: object centered at the origin, radius <= ~0.5.
  * Camera: OpenCV-style (x right, y down, z forward); ``pose`` is the
    [R|t] world->camera 3x4 used by ``camera.pose_from_Rt``.
  * Depth maps store z-depth (NOT ray length) at integer pixel coords, so
    ``camera.unproj_depth(depth, K)`` reproduces the camera-frame surface.
  * Stored SDF values carry a +0.003 bias that exactly cancels the
    loader's reference-data offset (``synthetic.get_gt_sdf`` subtracts
    0.003, reference ``data/synthetic.py:123``), so the occupancy labels
    the model trains on are the *exact* analytic ``sdf < 0``.
"""

import os

import numpy as np

__all__ = [
    "SDF_KINDS",
    "make_sdf",
    "look_at_pose",
    "render_scene",
    "surface_points",
    "sdf_samples",
    "generate_dataset",
]


# ---------------------------------------------------------------------------
# SDF primitives (p: [..., 3] -> [...])
# ---------------------------------------------------------------------------


def _sdf_sphere(p, r):
    return np.linalg.norm(p, axis=-1) - r


def _sdf_box(p, half, round_r=0.02):
    q = np.abs(p) - (np.asarray(half) - round_r)
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return outside + inside - round_r


def _sdf_torus(p, R, r):
    q = np.stack([np.linalg.norm(p[..., [0, 2]], axis=-1) - R, p[..., 1]], axis=-1)
    return np.linalg.norm(q, axis=-1) - r


def _sdf_capsule(p, a, b, r):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    pa, ba = p - a, b - a
    h = np.clip((pa @ ba) / (ba @ ba), 0.0, 1.0)
    return np.linalg.norm(pa - h[..., None] * ba, axis=-1) - r


SDF_KINDS = ("sphere", "box", "torus", "capsule", "box_sphere")


def make_sdf(kind, rng=None):
    """Build an SDF callable + albedo for one of :data:`SDF_KINDS`.

    With ``rng`` given, shape parameters are jittered so every object is
    distinct (the model must actually read the image to reconstruct it).
    """
    u = (lambda lo, hi: float(rng.uniform(lo, hi))) if rng is not None else (
        lambda lo, hi: 0.5 * (lo + hi)
    )
    if kind == "sphere":
        r = u(0.3, 0.45)
        sdf = lambda p: _sdf_sphere(p, r)
        albedo = (0.9, 0.3, 0.25)
    elif kind == "box":
        half = (u(0.2, 0.42), u(0.2, 0.42), u(0.2, 0.42))
        sdf = lambda p: _sdf_box(p, half)
        albedo = (0.25, 0.55, 0.9)
    elif kind == "torus":
        R, r = u(0.26, 0.36), u(0.1, 0.16)
        sdf = lambda p: _sdf_torus(p, R, r)
        albedo = (0.3, 0.85, 0.4)
    elif kind == "capsule":
        h, r = u(0.18, 0.3), u(0.12, 0.2)
        a, b = (0.0, -h, 0.0), (0.0, h, 0.0)
        sdf = lambda p: _sdf_capsule(p, a, b, r)
        albedo = (0.9, 0.75, 0.2)
    elif kind == "box_sphere":  # union: box with a sphere cap on top
        half = (u(0.24, 0.34), u(0.14, 0.2), u(0.24, 0.34))
        r = u(0.16, 0.24)
        c = (0.0, -(half[1] + 0.6 * r), 0.0)  # y down: "top" is -y
        sdf = lambda p: np.minimum(
            _sdf_box(p, half), _sdf_sphere(p - np.asarray(c), r)
        )
        albedo = (0.75, 0.4, 0.85)
    else:
        raise ValueError(f"unknown SDF kind {kind!r} (one of {SDF_KINDS})")
    return sdf, np.asarray(albedo, np.float32)


def _normals(sdf, p, eps=1e-4):
    e = np.zeros((3, 3))
    np.fill_diagonal(e, eps)
    n = np.stack(
        [sdf(p + e[i]) - sdf(p - e[i]) for i in range(3)], axis=-1
    )
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Camera + rendering
# ---------------------------------------------------------------------------


def look_at_pose(cam_pos):
    """World->camera [R|t] (3x4) for an OpenCV camera at ``cam_pos``
    looking at the origin, world +y mapping to image up."""
    C = np.asarray(cam_pos, np.float64)
    f = -C / np.linalg.norm(C)  # forward (+z_cam)
    up = np.array([0.0, 1.0, 0.0])
    if abs(f @ up) > 0.98:  # looking along y: pick another up
        up = np.array([0.0, 0.0, 1.0])
    r = np.cross(up, f)
    r /= np.linalg.norm(r)
    d = np.cross(f, r)  # image-down direction
    R = np.stack([r, d, f], axis=0)
    t = -R @ C
    return np.concatenate([R, t[:, None]], axis=1).astype(np.float32)


def render_scene(sdf, albedo, K, pose, H, W, n_steps=128, s_max=6.0, hit_eps=5e-4):
    """Sphere-trace ``sdf`` through camera (K, pose) -> (rgb, depth, mask).

    Returns:
      rgb   [H, W, 3] float32 in [0, 1], background white (data.bgcolor=1).
      depth [H, W] float32 z-depth, 0 on background (loader derives the
            mask as depth != 0, matching ``synthetic.get_depth``).
      mask  [H, W] bool.
    """
    pose = np.asarray(pose, np.float64)
    R, t = pose[:, :3], pose[:, 3]
    C = -R.T @ t  # camera center, world frame
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).reshape(-1, 3)
    r_cam = pix @ np.linalg.inv(np.asarray(K, np.float64)).T  # [HW, 3], z=1
    d_w = r_cam @ R  # R^T r, unnormalized: s is exactly z-depth
    d_norm = np.linalg.norm(d_w, axis=-1)

    s = np.full(len(d_w), 1e-4)
    alive = np.ones(len(d_w), bool)
    for _ in range(n_steps):
        x = C + s[alive, None] * d_w[alive]
        dist = sdf(x)
        s[alive] = s[alive] + dist / d_norm[alive]
        sub = (np.abs(dist) > hit_eps) & (s[alive] < s_max)
        if not sub.any():
            break
        alive[alive] = sub
    x = C + s[:, None] * d_w
    hit = (np.abs(sdf(x)) <= 10 * hit_eps) & (s < s_max) & (s > 0)

    depth = np.where(hit, s, 0.0).reshape(H, W).astype(np.float32)
    rgb = np.ones((H * W, 3), np.float32)
    if hit.any():
        n = _normals(sdf, x[hit])
        light = np.array([0.4, -0.7, -0.6])
        light = light / np.linalg.norm(light)
        lam = np.clip((n @ light), 0.0, 1.0)
        # fixed-direction fill light so the shading encodes orientation
        fill = 0.5 * np.clip(n @ np.array([-0.6, 0.2, -0.77]), 0.0, 1.0)
        rgb[hit] = np.clip(albedo * (0.25 + 0.65 * lam + fill)[:, None], 0, 1)
    return rgb.reshape(H, W, 3), depth, hit.reshape(H, W)


# ---------------------------------------------------------------------------
# Ground-truth sampling
# ---------------------------------------------------------------------------


def surface_points(sdf, n, rng, box=0.65, newton_iters=10, tol=1e-3):
    """``n`` exact surface points via Newton projection along the SDF
    gradient from uniform seeds (generic over any SDF; the fixture analogue
    of the reference data's mesh-sampled ``pointclouds/*.npy``)."""
    out = []
    got = 0
    while got < n:
        x = rng.uniform(-box, box, size=(4 * n, 3))
        for _ in range(newton_iters):
            x = x - sdf(x)[:, None] * _normals(sdf, x)
        keep = np.abs(sdf(x)) < tol
        x = x[keep]
        out.append(x)
        got += len(x)
        if len(x) == 0:  # degenerate SDF: avoid spinning forever
            raise RuntimeError("surface projection found no surface")
    return np.concatenate(out)[:n].astype(np.float32)


def sdf_samples(sdf, n, rng, box=0.7, near_sigma=0.05):
    """SDF supervision samples: half uniform in [-box, box]^3, half
    near-surface gaussian perturbations (the reference data's
    ``gt_sdf/*.npy`` {sample_pt, sample_sdf} mix). Stored values carry the
    +0.003 loader-offset compensation (see module docstring)."""
    n_uni = n // 2
    pts_u = rng.uniform(-box, box, size=(n_uni, 3))
    surf = surface_points(sdf, n - n_uni, rng)
    pts_s = surf + rng.normal(0.0, near_sigma, size=surf.shape)
    pts = np.concatenate([pts_u, pts_s]).astype(np.float32)
    vals = (sdf(pts) + 0.003).astype(np.float32)
    return pts, vals


# ---------------------------------------------------------------------------
# Dataset writer (reference on-disk layout)
# ---------------------------------------------------------------------------


def _camera_ring(n_views, rng, dist=1.78):
    """Camera centers on a ring of elevations/azimuths at the pix3d-style
    object distance (reference data/pix3d.py:140-148 pins t_z=1.78)."""
    cams = []
    for v in range(n_views):
        az = 2 * np.pi * (v + rng.uniform(-0.2, 0.2)) / n_views
        el = np.deg2rad(rng.uniform(-35.0, 35.0))
        c = dist * np.array(
            [np.cos(el) * np.sin(az), np.sin(el), -np.cos(el) * np.cos(az)]
        )
        cams.append(c)
    return cams


def generate_dataset(
    root,
    n_objects=5,
    n_views=8,
    H=224,
    seed=0,
    subset="analytic",
    category="prim",
    n_pc_points=10000,
    n_sdf_points=20000,
    val_views=1,
    focal=1.3875,
    holdout_objects=0,
):
    """Write a complete analytic synthetic-train-data tree under ``root``.

    Layout and file semantics follow the reference release exactly (see
    module docstring); ``data.root`` should point at ``root`` and
    ``data.synthetic.subset`` at ``subset``. The last ``val_views`` views
    of every train object go to the val list.

    With ``holdout_objects`` > 0, that many *additional* objects (fresh
    parameter draws from the same primitive families) are generated whose
    views ALL go to a per-object category ``ho{i}`` val list (the matching
    train list exists but is empty). Evaluating on those categories scores
    objects the model never saw in training — the zero-shot protocol of the
    reference's Pix3D/OCRTOC/OmniObject3D harness (reference
    ``utils/eval_3D.py:104-207``) at analytic scale — while the seen-object
    ``{category}`` val views measure the train-distribution baseline in the
    same run (per-category rows in cd_cat.txt separate the two).

    Returns the subset directory.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "train_data", subset)
    os.makedirs(os.path.join(base, "lists"), exist_ok=True)

    f = focal * H
    K = np.array([[f, 0, H / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    lists = {}  # category -> (train_lines, val_lines)

    def _cat_dirs(cat):
        for sub in ("images_processed", "masks", "depth", "pointclouds", "gt_sdf"):
            os.makedirs(os.path.join(base, sub, cat), exist_ok=True)
        for sub in ("intr", "extr"):
            os.makedirs(os.path.join(base, "camera_data", sub, cat), exist_ok=True)

    for o in range(n_objects + holdout_objects):
        held_out = o >= n_objects
        cat = f"ho{o - n_objects}" if held_out else category
        if cat not in lists:
            _cat_dirs(cat)
            lists[cat] = ([], [])
        train_lines, val_lines = lists[cat]
        kind = SDF_KINDS[o % len(SDF_KINDS)]
        sdf, albedo = make_sdf(kind, rng)
        obj = f"{kind}{o}"
        pc = surface_points(sdf, n_pc_points, rng)
        np.save(os.path.join(base, "pointclouds", cat, f"{cat}_{obj}.npy"), pc)
        pts, vals = sdf_samples(sdf, n_sdf_points, rng)
        np.save(
            os.path.join(base, "gt_sdf", cat, f"{cat}_{obj}.npy"),
            {"sample_pt": pts, "sample_sdf": vals},
        )
        for v, cam in enumerate(_camera_ring(n_views, rng)):
            pose = look_at_pose(cam)
            rgb, depth, mask = render_scene(sdf, albedo, K, pose, H, H)
            stem = f"{cat}_{obj}_{v:03d}"
            Image.fromarray((rgb * 255).astype(np.uint8)).save(
                os.path.join(base, "images_processed", cat, stem + ".png")
            )
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                os.path.join(base, "masks", cat, stem + ".png")
            )
            np.save(os.path.join(base, "depth", cat, stem + ".npy"), depth)
            np.save(
                os.path.join(base, "camera_data", "intr", cat, stem + ".npy"), K
            )
            np.save(
                os.path.join(base, "camera_data", "extr", cat, stem + ".npy"), pose
            )
            to_val = held_out or v >= n_views - val_views
            (val_lines if to_val else train_lines).append(stem + ".png")

    for cat, (train_lines, val_lines) in lists.items():
        with open(os.path.join(base, "lists", f"{cat}_train.list"), "w") as fh:
            fh.write("\n".join(train_lines) + "\n")
        with open(os.path.join(base, "lists", f"{cat}_val.list"), "w") as fh:
            fh.write("\n".join(val_lines) + "\n")
    return base
