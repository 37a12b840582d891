"""Dataset loaders against generated fixture trees (reference file layouts)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from zeroshape_tpu.config import Config


def base_opt(root, H=64):
    return Config(
        {
            "H": H,
            "W": H,
            "seed": 0,
            "batch_size": 2,
            "image_size": [H, H],
            "training": {"n_sdf_points": 16},
            "data": {
                "root": str(root),
                "num_workers": 2,
                "bgcolor": 1,
                "max_img_cat": None,
                "pix3d": {"cat": None},
                "ocrtoc": {"cat": None, "erode_mask": 2},
                "synthetic": {"subset": "testset", "percentage": 1},
            },
        }
    )


def test_synthetic_dataset(tmp_path):
    from test_engine_integration import make_fixture_dataset

    make_fixture_dataset(str(tmp_path))
    from zeroshape_tpu.data.synthetic import Dataset

    opt = base_opt(tmp_path)
    ds = Dataset(opt, split="train")
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb_input_map"].shape == (64, 64, 3)
    assert s["mask_input_map"].shape == (64, 64, 1)
    assert s["depth_input_map"].shape == (64, 64, 1)
    assert s["gt_sample_points"].shape == (16, 3)
    assert s["dpc"]["points"].shape == (512, 3)
    assert s["pose_gt"].shape == (3, 4)
    # loader integration
    loader = ds.setup_loader(opt, shuffle=True, drop_last=True)
    batch = next(iter(loader))
    assert batch["rgb_input_map"].shape == (2, 64, 64, 3)
    # mapping file
    ds.id_filename_mapping(opt, str(tmp_path / "dl.txt"))
    lines = open(tmp_path / "dl.txt").read().splitlines()
    assert len(lines) == 2 and lines[0].startswith("0 ")


def make_pix3d_fixture(root, H=64):
    base = os.path.join(root, "Pix3D")
    rng = np.random.default_rng(0)
    for sub in ("lists", "annotation/chair", "img_processed/chair",
                "mask_processed/chair", "pointclouds/chair"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    names = []
    for i in range(2):
        name = f"{i:04d}"
        names.append(name)
        img = rng.integers(0, 255, (H, H, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(base, "img_processed/chair", name + ".jpg"))
        mask = np.zeros((H, H), np.uint8)
        mask[8:56, 8:56] = 255
        Image.fromarray(mask).save(os.path.join(base, "mask_processed/chair", name + ".png"))
        meta = {
            "img": f"img/chair/{name}.jpg",
            "mask": f"mask/chair/{name}.png",
            "model": f"model/chair/model{i}/model.obj",
            "rot_mat": np.eye(3).tolist(),
            "trans_mat": [0, 0, 1.78],
            "focal_length": 35.0,
            "cam_position": [0, 0, 0],
            "bbox": [0, 0, H, H],
        }
        json.dump(meta, open(os.path.join(base, "annotation/chair", name + ".json"), "w"))
        # cad_path[6:] strips the "model/" prefix -> pointclouds/chair/...
        os.makedirs(os.path.join(base, "pointclouds/chair", f"model{i}"), exist_ok=True)
        np.save(
            os.path.join(base, "pointclouds/chair", f"model{i}", "model.npy"),
            rng.normal(size=(256, 3)).astype(np.float32),
        )
    with open(os.path.join(base, "lists", "chair_test.txt"), "w") as f:
        f.write("\n".join(names))


def test_pix3d_dataset(tmp_path):
    make_pix3d_fixture(str(tmp_path))
    from zeroshape_tpu.data.pix3d import Dataset

    opt = base_opt(tmp_path)
    o = opt.unfrozen_copy()
    o.data.pix3d.cat = "chair"
    opt = o
    ds = Dataset(opt, split="test")
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb_input_map"].shape == (64, 64, 3)
    assert s["dpc"]["points"].shape == (256, 3)
    # fixed intrinsics and pose convention
    assert abs(s["intr"][0, 0] - 1.3875 * 64) < 1e-4
    np.testing.assert_allclose(s["pose_gt"][:, 3], [0, 0, 1.78], atol=1e-6)
    assert ds.label2cat[s["category_label"]] == "chair"


def make_ocrtoc_fixture(root, dirname="Ocrtoc", depth_dir="depth_np", H=64):
    base = os.path.join(root, dirname)
    rng = np.random.default_rng(1)
    for sub in ("lists", "images_processed/mug", f"{depth_dir}/mug",
                "camera_data/extr/mug", "pointclouds/mug"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    names = []
    for i in range(6):
        name = f"mug1_{i:03d}"
        names.append(name + ".png")
        img = rng.integers(0, 255, (H, H, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(base, "images_processed/mug", name + ".png"))
        depth = np.zeros((H, H), np.float32)
        depth[16:48, 16:48] = rng.uniform(0.5, 1, (32, 32))
        np.save(os.path.join(base, depth_dir, "mug", name + ".npy"), depth)
        Rt = np.concatenate([np.eye(3), [[0], [0], [1.5]]], 1).astype(np.float32)
        np.save(os.path.join(base, "camera_data/extr/mug", name + ".npy"), Rt)
    np.save(
        os.path.join(base, "pointclouds/mug", "mug1.npy"),
        rng.normal(size=(128, 3)).astype(np.float32),
    )
    with open(os.path.join(base, "lists", "mug_test.list"), "w") as f:
        f.write("\n".join(names))


def test_ocrtoc_dataset(tmp_path):
    make_ocrtoc_fixture(str(tmp_path))
    from zeroshape_tpu.data.ocrtoc import Dataset

    opt = base_opt(tmp_path)
    ds = Dataset(opt, split="test")
    # every 5th image: 6 images -> indices 0, 5
    assert len(ds) == 2
    s = ds[0]
    assert s["depth_input_map"].shape == (64, 64, 1)
    assert s["mask_eroded"].shape == (64, 64, 1)
    assert s["mask_eroded"].sum() < s["mask_input_map"].sum()
    assert s["dpc"]["points"].shape == (128, 3)


def test_omniobj3d_dataset(tmp_path):
    make_ocrtoc_fixture(str(tmp_path), dirname="OmniObject3D", depth_dir="depth")
    from zeroshape_tpu.data.omniobj3d import Dataset

    opt = base_opt(tmp_path)
    ds = Dataset(opt, split="test")
    assert len(ds) == 6  # no subsampling
    s = ds[1]
    assert s["depth_input_map"].shape == (64, 64, 1)
    assert "mask_eroded" not in s
