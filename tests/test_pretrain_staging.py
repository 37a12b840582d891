"""Pretrained-weight staging (reference graph_shape.load_pretrained_depth,
/root/reference/model/compute_graph/graph_shape.py:69-87, and
graph_depth.__init__:16-19): the shape graph loads stage-1 depth+intr
weights from ``opt.pretrain.depth``; the depth graph loads omnidata weights
from ``opt.arch.depth.pretrained``. These tests fabricate both checkpoint
kinds and assert the DPT / intr-head parameters actually land in the state.

No forward passes: param trees come from ``jax.eval_shape`` and are
materialized with deterministic values, so the full-size DPT costs only
memory, not compute.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu.config import Config
from zeroshape_tpu.models.graph_depth import DepthGraph
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.parallel.train import TrainState
from zeroshape_tpu.runtime import checkpoint as ckpt
from tests.test_checkpoint import _flatten, full_opt


H = 64


def _depth_shapes():
    model = DepthGraph(H=H, W=H, predict_intr=True)
    batch = {
        "rgb_input_map": jnp.zeros((1, H, H, 3)),
        "mask_input_map": jnp.zeros((1, H, H, 1)),
        "depth_input_map": jnp.zeros((1, H, H, 1)),
        "intr": jnp.zeros((1, 3, 3)),
    }
    return jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            train=False,
        )
    )


def _shape_shapes():
    opt = full_opt()
    opt.H = opt.W = H
    opt.arch.impl.mlp_layers = 2
    opt.arch.impl.skip_in = []
    model = ShapeGraph.from_opt(opt)
    batch = {
        "rgb_input_map": jnp.zeros((1, H, H, 3)),
        "mask_input_map": jnp.zeros((1, H, H, 1)),
        "depth_input_map": jnp.zeros((1, H, H, 1)),
        "intr": jnp.zeros((1, 3, 3)),
        "pose_gt": jnp.zeros((1, 3, 4)),
        "gt_sample_points": jnp.zeros((1, 16, 3)),
        "gt_sample_sdf": jnp.zeros((1, 16)),
    }
    return jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            train=False,
        )
    )


def _materialize(shapes, fill):
    """Concrete arrays from a ShapeDtypeStruct tree; fill='zeros'|'arange'."""
    i = [0]

    def leaf(s):
        if fill == "zeros":
            return np.zeros(s.shape, s.dtype)
        i[0] += 1
        return np.full(s.shape, i[0] % 97 * 0.01, s.dtype)

    return jax.tree.map(leaf, shapes)


def _state_from(variables_shapes, fill):
    return TrainState(
        step=np.int64(0),
        params=_materialize(variables_shapes["params"], fill),
        batch_stats=_materialize(variables_shapes.get("batch_stats", {}), fill),
        opt_state={},
        tx=None,
    )


@pytest.fixture(scope="module")
def depth_state():
    return _state_from(_depth_shapes(), fill="arange")


@pytest.fixture(scope="module")
def shape_state_shapes():
    return _shape_shapes()


def _shape_opt(pretrain_depth=None, omnidata=None):
    opt = full_opt()
    opt.H = opt.W = H
    opt.pretrain = {"depth": pretrain_depth}
    opt.arch.depth.pretrained = omnidata
    return opt


def _trees_equal(a, b):
    fa, fb = _flatten(a), _flatten(b)
    assert set(fa) == set(fb)
    return all(np.array_equal(fa[k], fb[k]) for k in fa)


def test_stage_noop_when_unset(shape_state_shapes):
    state = _state_from(shape_state_shapes, fill="zeros")
    out = ckpt.stage_pretrained(state, _shape_opt(), graph="shape", log=lambda *a: None)
    assert out is state


def test_stage_missing_path_raises(shape_state_shapes):
    state = _state_from(shape_state_shapes, fill="zeros")
    with pytest.raises(FileNotFoundError):
        ckpt.stage_pretrained(
            state, _shape_opt(pretrain_depth="/nonexistent/depth.ckpt"),
            graph="shape", log=lambda *a: None,
        )
    with pytest.raises(FileNotFoundError):
        ckpt.stage_pretrained(
            state, _shape_opt(omnidata="/nonexistent/omnidata.ckpt"),
            graph="shape", log=lambda *a: None,
        )


def test_stage_from_orbax_depth_checkpoint(tmp_path, depth_state, shape_state_shapes):
    path = ckpt.save_checkpoint(
        str(tmp_path), depth_state, ep=3, it=100, best_val=0.5, best_ep=3, latest=True
    )
    state = _state_from(shape_state_shapes, fill="zeros")
    out = ckpt.stage_pretrained(
        state, _shape_opt(pretrain_depth=path), graph="shape", log=lambda *a: None
    )
    # dpt + intr head come from the stage-1 checkpoint...
    assert _trees_equal(out.params["dpt_depth"], depth_state.params["dpt_depth"])
    assert _trees_equal(out.params["intr_head"], depth_state.params["intr_head"])
    assert _trees_equal(
        out.batch_stats["intr_head"], depth_state.batch_stats["intr_head"]
    )
    # ...while the rest of the shape graph stays untouched
    for leaf in jax.tree.leaves(out.params["coord_encoder"]):
        assert np.all(leaf == 0)
    for leaf in jax.tree.leaves(out.params["impl_network"]):
        assert np.all(leaf == 0)


def test_stage_accepts_relative_orbax_path(
    tmp_path, depth_state, shape_state_shapes, monkeypatch
):
    """Configs naturally carry run-relative paths (pretrain.depth:
    output/depth/.../best.ckpt); orbax requires absolute directories, so the
    loader must abspath — a relative path crashed the round-5 staged run."""
    ckpt.save_checkpoint(
        str(tmp_path), depth_state, ep=3, it=100, best_val=0.5, best_ep=3, latest=True
    )
    monkeypatch.chdir(tmp_path)
    state = _state_from(shape_state_shapes, fill="zeros")
    out = ckpt.stage_pretrained(
        state, _shape_opt(pretrain_depth="latest.ckpt"), graph="shape",
        log=lambda *a: None,
    )
    assert _trees_equal(out.params["dpt_depth"], depth_state.params["dpt_depth"])


def _fabricate_torch_depth_sd():
    """Torch state dict with the depth graph's key layout and matching shapes."""
    from tests.test_checkpoint import record_mapping
    from zeroshape_tpu.runtime.checkpoint import _t_conv, _t_linear

    records = {
        k: v
        for k, v in record_mapping().items()
        if (v[2] == "skip" and k.startswith(("dpt_depth.", "intr")))
        or (v[2] != "skip" and v[0][0] in ("dpt_depth", "intr_head"))
    }
    shapes_tree = _depth_shapes()
    flat = _flatten(jax.tree.map(lambda s: tuple(s.shape), shapes_tree["params"]))
    flat.update(
        _flatten(jax.tree.map(lambda s: tuple(s.shape), shapes_tree["batch_stats"]))
    )
    rng = np.random.default_rng(3)
    sd = {}
    for key, (path, transform, kind) in records.items():
        if kind == "skip":
            # unused-but-present weights (refinenet4.resConfUnit1): the
            # converter consumes them without mapping, any shape works
            sd[key] = np.zeros((1,), np.float32)
            continue
        shape = flat[path]
        if transform is _t_linear:
            t_shape = (shape[1], shape[0])
        elif transform is _t_conv:
            t_shape = (shape[3], shape[2], shape[0], shape[1])
        else:
            t_shape = shape
        sd[key] = rng.normal(size=t_shape).astype(np.float32)
    return sd


def test_stage_from_torch_depth_checkpoint(tmp_path, shape_state_shapes):
    import torch

    sd = _fabricate_torch_depth_sd()
    path = str(tmp_path / "depth.ckpt")
    torch.save(
        {"graph": {k: torch.from_numpy(v) for k, v in sd.items()}, "epoch": 3}, path
    )
    state = _state_from(shape_state_shapes, fill="zeros")
    out = ckpt.stage_pretrained(
        state, _shape_opt(pretrain_depth=path), graph="shape", log=lambda *a: None
    )
    np.testing.assert_array_equal(
        out.params["intr_head"]["proj"]["kernel"],
        np.transpose(sd["intr_proj.weight"], (1, 0)),
    )
    np.testing.assert_array_equal(
        out.params["dpt_depth"]["dpt"]["layer1_rn"]["conv"]["kernel"],
        np.transpose(sd["dpt_depth.scratch.layer1_rn.weight"], (2, 3, 1, 0)),
    )
    # untouched elsewhere
    for leaf in jax.tree.leaves(out.params["impl_network"]):
        assert np.all(leaf == 0)
    # a truncated checkpoint must be rejected, not partially loaded
    bad = dict(sd)
    bad.pop("dpt_depth.scratch.layer1_rn.weight")
    bad_path = str(tmp_path / "bad.ckpt")
    torch.save({"graph": {k: torch.from_numpy(v) for k, v in bad.items()}}, bad_path)
    with pytest.raises(ValueError):
        ckpt.stage_pretrained(
            state, _shape_opt(pretrain_depth=bad_path), graph="shape",
            log=lambda *a: None,
        )


def test_stage_omnidata_into_depth_graph(tmp_path):
    """Depth engine: arch.depth.pretrained stages omnidata weights (raw
    'model_state_dict' layout, keys without the dpt_depth prefix)."""
    import torch

    sd = {
        k[len("dpt_depth."):]: v
        for k, v in _fabricate_torch_depth_sd().items()
        if k.startswith("dpt_depth.")
    }
    path = str(tmp_path / "omnidata_dpt_depth_v2.ckpt")
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}}, path
    )
    state = _state_from(_depth_shapes(), fill="zeros")
    opt = _shape_opt(omnidata=path)
    out = ckpt.stage_pretrained(state, opt, graph="depth", log=lambda *a: None)
    np.testing.assert_array_equal(
        out.params["dpt_depth"]["dpt"]["layer1_rn"]["conv"]["kernel"],
        np.transpose(sd["scratch.layer1_rn.weight"], (2, 3, 1, 0)),
    )
    # intr head is NOT loaded from omnidata weights
    for leaf in jax.tree.leaves(out.params["intr_head"]):
        assert np.all(leaf == 0)
