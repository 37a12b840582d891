"""The fused-decoder gate must accept the shipped config and reject others.

`eval.fused_decoder` falls back to the XLA decode silently when
`fused_supported` is False, so config drift in options/shape.yaml would
quietly drop the fast path — this pins the gate to the shipped architecture.
"""

import os

import yaml

from zeroshape_tpu.config import Config
from zeroshape_tpu.ops.implicit_kernel import fused_supported

ROOT = os.path.join(os.path.dirname(__file__), "..")


def shipped_opt():
    with open(os.path.join(ROOT, "options", "shape.yaml")) as f:
        raw = yaml.safe_load(f)
    return Config(raw)


def test_shipped_shape_yaml_is_fused_supported():
    opt = shipped_opt()
    assert fused_supported(opt)
    assert opt.eval.fused_decoder is True


def test_gate_rejects_off_spec_arches():
    for key, value in [
        ("arch.latent_dim", 64),
        ("arch.num_heads", 4),
        ("arch.impl.n_channels", 128),
        ("arch.impl.att_blocks", 3),
        ("arch.impl.mlp_layers", 4),
        ("arch.impl.mlp_ratio", 2.0),
        ("arch.impl.skip_in", [2]),
        ("arch.impl.posenc_3D", 4),
    ]:
        opt = shipped_opt()
        node = opt
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
        assert not fused_supported(opt), key
