"""Accuracy regression gate: train-from-scratch -> evaluate -> assert CD.

An automated, in-repo version of the analytic-overfit accuracy evidence
(BASELINE.md Runs A/B): the full engine lifecycle trains the shape graph
from random init on a small analytic-SDF dataset (exact ground truth) and
the Chamfer harness must beat a stored bound. A Run-B-class regression —
e.g. a dead depth head, a broken unprojection/normalization, a decoder that
stops learning, a corrupted eval pipeline — fails this test instead of
surfacing rounds later. The reference's only quality control is manual
validation-as-test (model/shape_engine.py:240-246); this automates it.

Opt-in (slow: ~25-60 min on the CPU mesh depending on host load — real
training):
    ZEROSHAPE_ACCURACY_GATE=1 python -m pytest tests/test_accuracy_gate.py -q
"""

import os

import numpy as np
import pytest
import yaml

from zeroshape_tpu.config import Config, set_options

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.environ.get("ZEROSHAPE_ACCURACY_GATE"),
        reason="accuracy gate is opt-in: set ZEROSHAPE_ACCURACY_GATE=1",
    ),
]

# Stored bound, calibrated round 5 (scripts/calibrate_gate.py): on the real
# chip (bf16) 3 seeds reach best CD [0.0711, 0.0813, 0.0585] -> mean + 3*sigma
# = 0.1047; on the 8-device CPU mesh (fp32) seed 0 reaches 0.0950 (documented
# round 4, reproduced round 5). The bound 0.11 covers the chip 3-sigma bound
# and the CPU point with headroom, sits 29% below the 0.155 random-init floor,
# and fails any regression that stops the pipeline learning while clearing
# measured run-to-run draw variance.
CD_BOUND = 0.11
EPOCHS = 24


def gate_yaml(tmp_path, data_root):
    cfg = {
        "group": "shape",
        "name": "accgate",
        "yaml": None,
        "load": None,
        "resume": False,
        "debug": False,
        "profile": False,
        "seed": 0,
        "batch_size": 8,
        "image_size": [64, 64],
        "max_epoch": EPOCHS,
        "output_root": str(tmp_path / "output"),
        "arch": {
            "num_heads": 8,
            "latent_dim": 64,
            "win_size": 16,
            "depth": {
                "encoder": "resnet",
                "n_blocks": 2,
                "dsp": 1,
                "pretrained": None,
                # from-scratch: keep the depth head ReLU-alive at init
                # (docs/TRAINING.md head_init_scale)
                "head_init_scale": 0.001,
            },
            "rgb": {"encoder": None, "n_blocks": 2},
            "impl": {
                "n_channels": 64,
                "att_blocks": 2,
                "mlp_ratio": 2.0,
                "posenc_perlayer": False,
                "mlp_layers": 4,
                "posenc_3D": 0,
                "skip_in": [2],
            },
        },
        "eval": {
            "batch_size": 4,
            "brute_force": False,
            "n_vis": 0,
            "vox_res": 32,
            "num_points": 2048,
            "range": [-1.5, 1.5],
            "icp": False,
            "f_thresholds": [0.01, 0.05, 0.2],
        },
        "data": {
            "root": str(data_root),
            "num_classes_test": 2,
            "max_img_cat": None,
            "dataset_train": "synthetic",
            "dataset_test": "synthetic",
            "num_workers": 2,
            "bgcolor": 1,
            "synthetic": {"subset": "analytic", "percentage": 1},
        },
        "training": {
            "n_sdf_points": 512,
            "shape_loss": {"impt_weight": 1, "impt_thres": 0.01},
            "depth_loss": {"grad_reg": 0.1, "depth_inv": True, "mask_shrink": False},
        },
        "loss_weight": {"shape": 1, "depth": 1, "intr": 10},
        "optim": {
            "lr": 1e-3,
            "lr_ft": 1e-3,
            "weight_decay": 0.05,
            "fix_dpt": False,
            "clip_norm": None,
            "accum": 1,
            "sched": False,
        },
        "freq": {
            "print": 10,
            "print_eval": 10,
            "scalar": 1000,
            "vis": 100000,
            "save_vis": 100000,
            "ckpt_latest": 1000,
            "eval": EPOCHS,  # validate once, at the end
        },
    }
    path = tmp_path / "shape_accgate.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_accuracy_gate_trained_cd_beats_bound(tmp_path):
    from zeroshape_tpu.data.analytic import generate_dataset
    from zeroshape_tpu.data.base import default_collate
    from zeroshape_tpu.runtime.shape_engine import Runner

    data_root = str(tmp_path / "data")
    generate_dataset(
        data_root, n_objects=4, n_views=6, H=64, seed=0,
        n_pc_points=2048, n_sdf_points=4096, val_views=1,
    )
    opt = set_options(
        Config({"yaml": gate_yaml(tmp_path, data_root)}), safe_check=False
    )
    runner = Runner(opt)
    runner.load_dataset()
    runner.build_networks()
    runner.setup_optimizer(default_collate([runner.train_data[0]]))
    runner.restore_checkpoint()
    runner.train()

    assert np.isfinite(runner.best_val)
    assert runner.best_val < CD_BOUND, (
        f"trained CD {runner.best_val:.4f} missed the regression bound "
        f"{CD_BOUND} — the train->eval pipeline stopped learning "
        f"(random init sits at 0.155 on this dataset; a healthy run "
        f"reaches ~0.095)"
    )
