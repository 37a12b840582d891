"""Geometric self-consistency of the analytic-SDF scene generator:
depth maps must unproject (through the pipeline's own camera math) onto
the analytic surface, and the written tree must load through
SyntheticDataset with exact occupancy labels."""

import numpy as np
import pytest

import jax.numpy as jnp

from zeroshape_tpu import camera
from zeroshape_tpu.data import analytic


@pytest.mark.parametrize("kind", ["sphere", "box", "torus"])
def test_render_unprojects_onto_surface(kind):
    H = 64
    sdf, albedo = analytic.make_sdf(kind)
    f = 1.3875 * H
    K = np.array([[f, 0, H / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    pose = analytic.look_at_pose([0.9, -0.8, -1.2])
    rgb, depth, mask = analytic.render_scene(sdf, albedo, K, pose, H, H)

    assert mask.sum() > 100, "object should be visible"
    assert (depth[mask] > 0).all() and (depth[~mask] == 0).all()
    assert rgb.shape == (H, H, 3) and rgb.min() >= 0 and rgb.max() <= 1

    # unproject with the pipeline's camera math -> camera frame -> world
    pts_cam = np.asarray(
        camera.unproj_depth(jnp.asarray(depth)[None], jnp.asarray(K)[None])
    )[0]
    R, t = pose[:, :3], pose[:, 3]
    pts_world = (pts_cam - t) @ R  # R^T (x - t)
    d = np.abs(sdf(pts_world.astype(np.float64)))[mask.reshape(-1)]
    assert np.quantile(d, 0.95) < 5e-3, f"95% of unprojected pixels on surface, got {np.quantile(d, 0.95)}"


def test_surface_points_and_sdf_samples():
    sdf, _ = analytic.make_sdf("box_sphere")
    rng = np.random.default_rng(0)
    pc = analytic.surface_points(sdf, 500, rng)
    assert pc.shape == (500, 3)
    assert np.abs(sdf(pc.astype(np.float64))).max() < 2e-3

    pts, vals = analytic.sdf_samples(sdf, 400, rng)
    assert pts.shape == (400, 3) and vals.shape == (400,)
    # stored values compensate the loader's -0.003: check the raw relation
    np.testing.assert_allclose(vals - 0.003, sdf(pts.astype(np.float64)), atol=1e-5)


def test_generated_tree_loads_through_synthetic_dataset(tmp_path):
    from zeroshape_tpu.config import Config

    H = 48
    # n_objects=5 reaches the "box_sphere" kind, whose object name contains
    # an underscore — a regression guard for the list-parsing bug that broke
    # Run B (get_list must strip the known category prefix, not rsplit)
    analytic.generate_dataset(
        str(tmp_path), n_objects=5, n_views=3, H=H, n_pc_points=256,
        n_sdf_points=512, val_views=1,
    )
    opt = Config(
        {
            "H": H,
            "W": H,
            "seed": 0,
            "data": {
                "root": str(tmp_path),
                "num_workers": 0,
                "bgcolor": 1,
                "synthetic": {"subset": "analytic", "percentage": 1},
            },
            "training": {"n_sdf_points": 128},
            "eval": {"batch_size": 1, "n_vis": 1},
            "batch_size": 2,
        }
    )
    from zeroshape_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(opt, split="train")
    assert len(ds) == 5 * 2  # 5 objects x (3 views - 1 val view)
    underscored = [i for i, e in enumerate(ds.list) if "_" in e[2]]
    assert underscored, "expected an object name containing an underscore"
    ds[underscored[0]]  # must resolve every per-object file path
    s = ds[0]
    assert s["rgb_input_map"].shape == (H, H, 3)
    assert s["depth_input_map"].shape == (H, H, 1)
    assert s["gt_sample_points"].shape == (128, 3)
    # loader subtracts 0.003; our stored +0.003 bias cancels it, so
    # occupancy (sdf < 0) is exact for the analytic solid: points well
    # inside must be occupied, points far outside must not
    r = np.linalg.norm(s["gt_sample_points"], axis=-1)
    occ = s["gt_sample_sdf"] < 0
    assert occ[r < 0.1].all() if (r < 0.1).any() else True
    assert (~occ[r > 0.8]).all() if (r > 0.8).any() else True
    # mask/depth agree
    assert ((s["depth_input_map"][..., 0] > 0) == (s["mask_input_map"][..., 0] > 0.5)).all()

    val = SyntheticDataset(opt, split="val")
    assert len(val) == 5


def test_holdout_objects_are_val_only(tmp_path):
    """holdout_objects writes per-object ho{i} categories whose views are ALL
    val (empty train list): training never sees them, evaluation scores them
    per category — the zero-shot split scripts/generalize_e2e.py trains."""
    from zeroshape_tpu.config import Config
    from zeroshape_tpu.data.synthetic import SyntheticDataset

    H = 32
    analytic.generate_dataset(
        str(tmp_path), n_objects=3, n_views=3, H=H, n_pc_points=128,
        n_sdf_points=256, val_views=1, holdout_objects=2,
    )
    opt = Config(
        {
            "H": H, "W": H, "seed": 0,
            "data": {
                "root": str(tmp_path), "num_workers": 0, "bgcolor": 1,
                "synthetic": {"subset": "analytic", "percentage": 1},
            },
            "training": {"n_sdf_points": 64},
        }
    )
    tr = SyntheticDataset(opt, split="train")
    va = SyntheticDataset(opt, split="val")
    # train: only the shared category, 3 objects x 2 non-val views
    assert {e[1] for e in tr.list} == {"prim"}
    assert len(tr) == 3 * 2
    # val: 1 view per seen object + ALL 3 views of each held-out object
    cats = {e[1] for e in va.list}
    assert cats == {"prim", "ho0", "ho1"}
    assert sum(1 for e in va.list if e[1] == "prim") == 3
    for ho in ("ho0", "ho1"):
        assert sum(1 for e in va.list if e[1] == ho) == 3
    # held-out object names never appear in the train entries
    ho_objects = {e[2] for e in va.list if e[1].startswith("ho")}
    assert ho_objects.isdisjoint({e[2] for e in tr.list})
    # every category loads end to end (paths resolve, sample keys intact)
    for idx, e in enumerate(va.list):
        if e[1] == "ho1":
            s = va[idx]
            assert s["rgb_input_map"].shape == (H, H, 3)
            break
