import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu import camera


def rand_rotation(rng):
    # QR-based random rotation
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_pose_compose_invert_roundtrip():
    rng = np.random.default_rng(0)
    R = rand_rotation(rng)[None]
    t = rng.normal(size=(1, 3))
    pose = camera.pose_from(R=R, t=t)
    inv = camera.pose_invert(pose)
    comp = camera.pose_compose_pair(pose, inv)
    np.testing.assert_allclose(np.asarray(comp[..., :3]), np.eye(3)[None], atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp[..., 3]), 0, atol=1e-5)


def test_unproj_depth_pinhole_identity():
    # With f=1, c=0, depth d: point = (x*d, y*d, d)
    H = W = 4
    depth = np.full((1, H, W), 2.0, np.float32)
    intr = np.eye(3, dtype=np.float32)[None]
    pts = np.asarray(camera.unproj_depth(jnp.asarray(depth), jnp.asarray(intr)))
    pts = pts.reshape(H, W, 3)
    assert np.allclose(pts[0, 0], [0, 0, 2])
    assert np.allclose(pts[1, 3], [6, 2, 2])  # x=3, y=1, z=1 scaled by depth 2


def test_unproj_matches_manual_K():
    rng = np.random.default_rng(1)
    H = W = 8
    depth = rng.uniform(0.5, 2.0, size=(2, H, W)).astype(np.float32)
    f = 1.3875 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    intr = np.stack([K, K])
    pts = np.asarray(camera.unproj_depth(jnp.asarray(depth), jnp.asarray(intr)))
    # manual: for pixel (x, y), ray = K^-1 (x, y, 1)
    Kinv = np.linalg.inv(K)
    x, y = 3, 5
    ray = Kinv @ np.array([x, y, 1.0])
    manual = ray * depth[0, y, x]
    np.testing.assert_allclose(pts[0, y * W + x], manual, rtol=1e-5)


def test_valid_norm_fac_matches_loop():
    rng = np.random.default_rng(2)
    B, N = 3, 50
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    mask = rng.uniform(size=(B, N)) > 0.4
    mask[0, :5] = True  # ensure nonempty
    means, max_dists = camera.valid_norm_fac(jnp.asarray(pts), jnp.asarray(mask))
    for b in range(B):
        valid = pts[b][mask[b]]
        mean_ref = valid.mean(axis=0)
        dist_ref = np.linalg.norm(valid - mean_ref, axis=1).max()
        np.testing.assert_allclose(np.asarray(means)[b], mean_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(max_dists)[b], dist_ref, atol=1e-5)


def test_valid_norm_fac_empty_mask_safe():
    pts = np.zeros((1, 10, 3), np.float32)
    mask = np.zeros((1, 10), bool)
    means, max_dists = camera.valid_norm_fac(jnp.asarray(pts), jnp.asarray(mask))
    assert np.isfinite(np.asarray(means)).all()
    assert np.asarray(max_dists)[0] == 1.0


def test_world2cam_proj_points():
    rng = np.random.default_rng(3)
    R = rand_rotation(rng)
    t = rng.normal(size=3)
    pose = camera.pose_from(R=R[None], t=t[None])
    pts = rng.normal(size=(1, 7, 3)).astype(np.float32)
    cam = np.asarray(camera.world2cam(jnp.asarray(pts), pose))
    manual = pts[0] @ R.T + t
    np.testing.assert_allclose(cam[0], manual, rtol=1e-4, atol=1e-5)


def test_rotation_sphere_properties():
    R = np.asarray(camera.get_rotation_sphere(4, 4, 3))
    assert R.shape == (48, 3, 3)
    # all orthonormal with |det| == 1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (48, 1, 1)), atol=1e-5)
    det = np.linalg.det(R)
    np.testing.assert_allclose(np.abs(det), 1.0, atol=1e-5)
    # first rotation: azim=elev=roll=0 => R == R_permute
    np.testing.assert_allclose(R[0], camera.R_PERMUTE, atol=1e-6)


def test_rotation_sphere_ordering_matches_reference_nesting():
    # reference nests: for azim: for elev: for roll
    R = np.asarray(camera.get_rotation_sphere(2, 2, 2))
    # entry 1 should differ from entry 0 only by roll (inner loop)
    roll180 = np.asarray(camera._rot_roll(jnp.asarray([180.0])))[0]
    expected = roll180 @ R[0]
    np.testing.assert_allclose(R[1], expected, atol=1e-5)
