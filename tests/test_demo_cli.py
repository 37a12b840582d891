"""demo.py CLI smoke test: tiny image+mask -> mesh/attention/depth dumps."""

import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image


def make_examples(tmp_path):
    d = tmp_path / "examples"
    (d / "images").mkdir(parents=True)
    (d / "masks").mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
    Image.fromarray(img).save(d / "images" / "obj.png")
    mask = np.zeros((96, 80), np.uint8)
    mask[24:72, 20:60] = 255
    Image.fromarray(mask).save(d / "masks" / "obj.png")
    return str(d)


def tiny_shape_yaml(tmp_path):
    cfg = {
        "group": "shape",
        "name": "demo_test",
        "yaml": None,
        "task": "shape",
        "datadir": None,
        "ckpt": None,
        "seed": 0,
        "image_size": [64, 64],
        "output_root": str(tmp_path / "out"),
        "arch": {
            "num_heads": 8,
            "latent_dim": 64,
            "win_size": 16,
            "depth": {"encoder": "resnet", "n_blocks": 2, "dsp": 1, "pretrained": None},
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
        "eval": {"vox_res": 16, "range": [-1.5, 1.5], "num_points": 128},
        "data": {"bgcolor": 1},
        "pretrain": {"depth": None},
    }
    p = tmp_path / "shape_demo.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


@pytest.mark.slow
def test_demo_shape_task(tmp_path, monkeypatch):
    datadir = make_examples(tmp_path)
    yaml_path = tiny_shape_yaml(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["demo.py", f"--yaml={yaml_path}", "--task=shape", f"--datadir={datadir}"],
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import demo

    demo.main()
    preds = os.path.join(datadir, "preds")
    files = os.listdir(preds)
    assert "obj_image_input.png" in files
    assert "obj_mask_input.png" in files
    assert "obj_attn.gif" in files
    # an untrained net may or may not produce surface; mesh file optional but
    # the attention/mask/image dumps must exist
    assert any(f.endswith(".png") for f in files)


@pytest.mark.slow
def test_demo_shape_fast_path_skips_attention(tmp_path, monkeypatch):
    """--eval.dump_attn! must skip the dense decode-with-attention pass and
    produce no attention GIF while keeping the mesh/image dumps."""
    datadir = make_examples(tmp_path)
    yaml_path = tiny_shape_yaml(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["demo.py", f"--yaml={yaml_path}", "--task=shape", f"--datadir={datadir}",
         "--eval.dump_attn!"],
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import demo

    demo.main()
    preds = os.path.join(datadir, "preds")
    files = os.listdir(preds)
    assert "obj_image_input.png" in files
    assert "obj_attn.gif" not in files


@pytest.mark.slow
def test_demo_depth_task(tmp_path, monkeypatch):
    datadir = make_examples(tmp_path)
    yaml_path = tiny_shape_yaml(tmp_path)
    # rewrite task to depth
    cfg = yaml.safe_load(open(yaml_path))
    cfg["task"] = "depth"
    cfg["group"] = "depth"
    cfg["loss_weight"] = {"depth": 1, "intr": 10}
    depth_yaml = os.path.join(os.path.dirname(yaml_path), "depth_demo.yaml")
    open(depth_yaml, "w").write(yaml.safe_dump(cfg))
    monkeypatch.setattr(
        sys, "argv",
        ["demo.py", f"--yaml={depth_yaml}", "--task=depth", f"--datadir={datadir}"],
    )
    import demo

    demo.main()
    preds = os.path.join(datadir, "preds")
    files = os.listdir(preds)
    assert "obj_depth_est.png" in files
    assert "obj_seen_surface_pred.obj" in files
    assert "obj_seen_surface_fixed.mtl" in files
