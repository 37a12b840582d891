import os

import numpy as np
import pytest
from PIL import Image

from zeroshape_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native zsdl library unavailable"
)


def test_decode_png_matches_pil(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    out = native.decode_image(p)
    assert out.shape == (40, 30, 3)
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0, atol=1e-6)


def test_decode_gray_png_fanout(tmp_path):
    arr = np.arange(0, 255, 255 // 16, dtype=np.uint8)[:16].reshape(4, 4)
    p = str(tmp_path / "g.png")
    Image.fromarray(arr, mode="L").save(p)
    out = native.decode_image(p, channels=3)
    assert out.shape == (4, 4, 3)
    assert np.allclose(out[..., 0], out[..., 2])


def test_decode_resize_matches_torch_semantics(tmp_path):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "r.png")
    Image.fromarray(arr).save(p)
    out = native.decode_image(p, out_hw=(16, 16))
    t = torch.from_numpy(arr.astype(np.float32) / 255).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(16, 16), mode="bilinear", align_corners=False)
    ref = ref[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_decode_jpeg(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    out = native.decode_image(p)
    assert out.shape == (24, 24, 3)
    # must match PIL's decode of the same lossy file exactly
    pil = np.asarray(Image.open(p)).astype(np.float32) / 255
    np.testing.assert_allclose(out, pil, atol=1e-6)


def test_decode_batch(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(4):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        p = str(tmp_path / f"b{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    out = native.decode_batch(paths, (20, 20), n_threads=2)
    assert out.shape == (4, 20, 20, 3)


def test_decode_batch_bad_path(tmp_path):
    assert native.decode_batch([str(tmp_path / "missing.png")], (8, 8)) is None


def test_load_npy_dtypes(tmp_path):
    for dtype in (np.float32, np.float64, np.int32, np.int64):
        arr = (np.arange(24).reshape(2, 3, 4) * 1.5).astype(dtype)
        p = str(tmp_path / f"a_{np.dtype(dtype).name}.npy")
        np.save(p, arr)
        out = native.load_npy(p)
        assert out.shape == (2, 3, 4)
        np.testing.assert_allclose(out, arr.astype(np.float32))


def test_load_npy_rejects_fortran(tmp_path):
    arr = np.asfortranarray(np.ones((3, 3), np.float32))
    p = str(tmp_path / "f.npy")
    np.save(p, arr)
    assert native.load_npy(p) is None
