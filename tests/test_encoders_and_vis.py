import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu.models.coord_enc import CoordEncAtt
from zeroshape_tpu.models.rgb_enc import RGBEncAtt, RGBEncRes
from zeroshape_tpu.metrics import eval3d
from zeroshape_tpu import vis


def test_coord_enc_att_shapes():
    m = CoordEncAtt(embed_dim=64, n_blocks=2, num_heads=8, win_size=8)
    coord = jnp.zeros((2, 32, 32, 3))
    mask = jnp.ones((2, 32, 32), bool)
    vars_ = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        coord, mask,
    )
    out = m.apply(vars_, coord, mask)
    assert out.shape == (2, 1 + 16, 64)  # 32/8 = 4 -> 16 windows + cls


def test_rgb_enc_att_shapes():
    m = RGBEncAtt(img_size=32, embed_dim=64, n_blocks=2, num_heads=8, win_size=16)
    rgb = jnp.zeros((2, 32, 32, 3))
    vars_ = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, rgb
    )
    out = m.apply(vars_, rgb)
    assert out.shape == (2, 1 + 4, 64)


def test_rgb_enc_res_shapes():
    m = RGBEncRes(latent_dim=32, win_size=16)
    rgb = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), rgb)
    out = m.apply(vars_, rgb)
    assert out.shape == (1, 17, 32)


def test_occupancy_grid_with_attn():
    L = 5

    def decode_fn(pts):  # [B, T, 3]
        occ = -jnp.linalg.norm(pts, axis=-1)
        attn = jnp.ones(pts.shape[:2] + (L,)) / L
        return occ, attn

    pts = eval3d.get_dense_3D_grid(8, (-1, 1))
    occ, attn = eval3d.occupancy_grid_with_attn(
        decode_fn, pts, batch_size=2, vox_res=8, tile_points=81
    )
    assert occ.shape == (2, 9**3)
    assert attn.shape == (2, 9, 9, L)
    np.testing.assert_allclose(np.asarray(attn), 1.0 / L, rtol=1e-5)


def test_attention_frames():
    rng = np.random.default_rng(0)
    S, fr, H = 9, 4, 32
    attn_xy = rng.uniform(0.0, 1.0, (S, S, 1 + fr * fr)).astype(np.float32)
    image = rng.uniform(0, 1, (H, H, 3)).astype(np.float32)
    frames = eval3d.attention_frames(attn_xy, image, vox_res=8, feat_res=fr)
    assert len(frames) >= 2
    assert frames[0].shape == (H, H, 3)
    assert all(np.isfinite(f).all() for f in frames)


def test_tb_image_honors_num_images():
    """Grid cap + layout follow opt.tb.num_images = [num_H, num_W]
    (reference util_vis.py:28-35: first num_H*num_W images, num_W columns)."""

    class FakeTB:
        def add_image(self, tag, grid, step, dataformats):
            self.tag, self.grid, self.dataformats = tag, grid, dataformats

    tb = FakeTB()
    imgs = np.random.default_rng(0).uniform(size=(12, 8, 8, 3)).astype(np.float32)
    vis.tb_image(tb, 0, "train", "x", imgs, num_images=(2, 3))
    # 6 images kept, 3 columns x 2 rows of 8x8 tiles
    assert tb.grid.shape == (16, 24, 3)
    # row-major: image 3 lands at row 1, col 0
    np.testing.assert_allclose(tb.grid[8:16, 0:8], imgs[3])

    # fewer images than one row: grid shrinks to B columns
    vis.tb_image(tb, 0, "train", "x", imgs[:2], num_images=(4, 8))
    assert tb.grid.shape == (8, 16, 3)


def test_ply_writers_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p = str(tmp_path / "m.ply")
    vis.write_ply_mesh(p, verts, faces)
    content = open(p, "rb").read()
    assert b"element vertex 3" in content and b"element face 1" in content

    p2 = str(tmp_path / "pc.ply")
    vis.write_ply_points(p2, verts, colors=np.zeros((3, 3), np.uint8))
    assert b"element vertex 3" in open(p2, "rb").read()


def test_dump_images_and_html(tmp_path):
    out = str(tmp_path)
    imgs = np.zeros((2, 8, 8, 3), np.float32)
    vis.dump_images(out, [1, 2], "image_input", imgs, folder="dump_x")
    vis.dump_depths(out, [1, 2], "depth_est", np.ones((2, 8, 8, 1), np.float32),
                    np.ones((2, 8, 8, 1)), rescale=True, folder="dump_x")
    assert os.path.isfile(os.path.join(out, "dump_x", "1_image_input.png"))
    vis.create_gif_html(os.path.join(out, "dump_x"), os.path.join(out, "g.html"))
    html = open(os.path.join(out, "g.html")).read()
    assert "base64" in html and "1_image_input.png" in html


def test_dump_seen_surface(tmp_path):
    out = str(tmp_path)
    xyz = np.zeros((4, 4, 3), np.float32)
    xyz[1:3, 1:3] = [[0.1, 0.1, 0.5]]
    vis.dump_seen_surface(out, [7], "seen", "img", [xyz], folder="d")
    obj = open(os.path.join(out, "d", "7_seen.obj")).read()
    assert obj.count("v ") >= 4 and "mtllib" in obj
