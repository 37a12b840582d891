"""Depth engine end-to-end on the fixture dataset + evaluate.py CLI smoke."""

import os
import sys

import numpy as np
import pytest
import yaml

from zeroshape_tpu.config import Config, set_options
from test_engine_integration import make_fixture_dataset


def depth_yaml(tmp_path, data_root):
    cfg = {
        "group": "depth",
        "name": "dtest",
        "yaml": None,
        "load": None,
        "resume": False,
        "debug": False,
        "profile": False,
        "seed": 0,
        "batch_size": 2,
        "image_size": [64, 64],
        "max_epoch": 1,
        "output_root": str(tmp_path / "output"),
        "arch": {"depth": {"pretrained": None}},
        "eval": {
            "batch_size": 2,
            "n_vis": 1,
            "depth_cap": None,
            "d_thresholds": [1.02, 1.05, 1.1, 1.2],
        },
        "data": {
            "root": str(data_root),
            "num_classes_test": 2,
            "dataset_train": "synthetic",
            "dataset_test": "synthetic",
            "num_workers": 2,
            "bgcolor": 1,
            "synthetic": {"subset": "testset", "percentage": 1},
        },
        "training": {
            "n_sdf_points": 16,
            "depth_loss": {"grad_reg": 0.1, "depth_inv": True, "mask_shrink": False},
        },
        "loss_weight": {"depth": 1, "intr": 10},
        "optim": {
            "lr": 1e-4,
            "weight_decay": 0.05,
            "fix_dpt": False,
            "clip_norm": 1.0,
            "accum": 2,
            "sched": True,
        },
        "freq": {
            "print": 1,
            "print_eval": 1,
            "scalar": 10,
            "vis": 10,
            "save_vis": 10,
            "ckpt_latest": 10,
            "eval": 1,
        },
    }
    p = tmp_path / "depth_test.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


@pytest.mark.slow
def test_depth_engine_end_to_end(tmp_path):
    data_root = make_fixture_dataset(str(tmp_path))
    yaml_path = depth_yaml(tmp_path, data_root)
    opt = set_options(Config({"yaml": yaml_path}), safe_check=False)

    from zeroshape_tpu.data.base import default_collate
    from zeroshape_tpu.runtime.depth_engine import Runner

    runner = Runner(opt)
    runner.load_dataset()
    runner.build_networks()
    runner.setup_optimizer(default_collate([runner.train_data[0]]))
    runner.restore_checkpoint()
    runner.train()

    out = opt.output_path
    assert os.path.isdir(os.path.join(out, "latest.ckpt"))
    val = runner.evaluate(ep=1, training=False)
    assert np.isfinite(val)
    assert os.path.isfile(os.path.join(out, "best_val.txt"))
    content = open(os.path.join(out, "best_val.txt")).read()
    assert "l1_err" in content and "d>1.05" in content
