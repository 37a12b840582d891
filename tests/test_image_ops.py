import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from zeroshape_tpu.ops import image as img_ops


def _torch_resize(x_nhwc, out_hw, mode, align_corners=None):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kwargs = {} if align_corners is None else {"align_corners": align_corners}
    out = F.interpolate(t, size=out_hw, mode=mode, **kwargs)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def test_bilinear_matches_torch_align_true():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 7, 3)).astype(np.float32)
    for out_hw in [(14, 14), (13, 9), (3, 5)]:
        ours = np.asarray(img_ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=True))
        ref = _torch_resize(x, out_hw, "bilinear", True)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bilinear_matches_torch_align_false():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 24, 24, 4)).astype(np.float32)
    for out_hw in [(14, 14), (48, 48), (7, 7)]:
        ours = np.asarray(img_ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=False))
        ref = _torch_resize(x, out_hw, "bilinear", False)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_nearest_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
    for out_hw in [(12, 12), (3, 3), (24, 24)]:
        ours = np.asarray(img_ops.resize_nearest(jnp.asarray(x), out_hw))
        ref = _torch_resize(x, out_hw, "nearest")
        np.testing.assert_allclose(ours, ref)


def test_max_pool_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(img_ops.max_pool2d(jnp.asarray(x), 4))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = np.transpose(F.max_pool2d(t, 4).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref)


def test_interpolate_coordmap_identity():
    rng = np.random.default_rng(4)
    c = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    m = np.ones((1, 8, 8, 1), np.float32)
    c2, m2 = img_ops.interpolate_coordmap(jnp.asarray(c), jnp.asarray(m), (8, 8))
    np.testing.assert_allclose(np.asarray(c2), c)


def test_interpolate_coordmap_downsample_masked():
    c = np.ones((1, 8, 8, 3), np.float32) * 5.0
    m = np.zeros((1, 8, 8, 1), np.float32)
    m[0, :4, :4] = 1.0
    c2, m2 = img_ops.interpolate_coordmap(jnp.asarray(c), jnp.asarray(m), (4, 4))
    c2, m2 = np.asarray(c2), np.asarray(m2)
    # valid region keeps its value (renormalized), masked-out region is zeroed
    assert np.allclose(c2[0, 0, 0], 5.0, atol=1e-4)
    assert m2[0, 3, 3, 0] == 0 or np.allclose(c2[0, 3, 3] % 5.0, 0, atol=1e-4)
