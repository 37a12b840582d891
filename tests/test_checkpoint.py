import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu.config import Config
from zeroshape_tpu.models.graph_shape import ShapeGraph
from zeroshape_tpu.runtime import checkpoint as ckpt
from zeroshape_tpu.runtime.checkpoint import (
    _Mapper,
    _map_coord_encoder,
    _map_dpt_depth,
    _map_implicit,
    _map_intr_head,
    _t_conv,
    _t_linear,
)


def full_opt():
    return Config(
        {
            "H": 224,
            "W": 224,
            "arch": {
                "num_heads": 8,
                "latent_dim": 256,
                "win_size": 16,
                "depth": {"encoder": "resnet", "n_blocks": 12, "dsp": 1},
                "rgb": {"encoder": None, "n_blocks": 12},
                "impl": {
                    "n_channels": 256,
                    "att_blocks": 2,
                    "mlp_ratio": 4.0,
                    "posenc_perlayer": False,
                    "mlp_layers": 8,
                    "posenc_3D": 0,
                    "skip_in": [2, 4, 6],
                },
            },
        }
    )


def _flatten(tree, path=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, path + (k,)))
        else:
            out[path + (k,)] = v
    return out


@pytest.fixture(scope="module")
def full_shapes():
    """Abstract param/batch_stats shapes of the full 224px model (no compute)."""
    model = ShapeGraph.from_opt(full_opt())
    batch = {
        "rgb_input_map": jnp.zeros((1, 224, 224, 3)),
        "mask_input_map": jnp.zeros((1, 224, 224, 1)),
        "depth_input_map": jnp.zeros((1, 224, 224, 1)),
        "intr": jnp.zeros((1, 3, 3)),
        "pose_gt": jnp.zeros((1, 3, 4)),
        "gt_sample_points": jnp.zeros((1, 16, 3)),
        "gt_sample_sdf": jnp.zeros((1, 16)),
    }
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            train=False,
        )
    )
    return variables


def record_mapping():
    """Run the shape-graph mapping, recording (torch key -> flax path, kind)."""
    records = {}
    orig_param, orig_stat, orig_take = _Mapper.param, _Mapper.stat, _Mapper.take

    def rec_param(self, path, torch_key, transform=None):
        records[torch_key] = (tuple(path), transform, "param")

    def rec_stat(self, path, torch_key):
        records[torch_key] = (tuple(path), None, "stat")

    def rec_take(self, torch_key, transform=None):
        records.setdefault(torch_key, (None, None, "skip"))

    _Mapper.param, _Mapper.stat, _Mapper.take = rec_param, rec_stat, rec_take
    try:
        m = _Mapper({})
        _map_dpt_depth(m, ("dpt_depth",), "dpt_depth")
        _map_intr_head(m, ("intr_head",), "intr_head", "intr_proj")
        _map_coord_encoder(m, ("coord_encoder",), "coord_encoder")
        _map_implicit(m, ("impl_network",), "impl_network")
    finally:
        _Mapper.param, _Mapper.stat, _Mapper.take = orig_param, orig_stat, orig_take
    return records


def test_converter_covers_model_exactly(full_shapes):
    records = record_mapping()
    flax_params = _flatten(jax.tree.map(lambda x: x.shape, full_shapes["params"]))
    flax_stats = _flatten(jax.tree.map(lambda x: x.shape, full_shapes.get("batch_stats", {})))

    mapped_params = {p for p, _, kind in records.values() if kind == "param"}
    mapped_stats = {p for p, _, kind in records.values() if kind == "stat"}

    # every mapped path must exist; every model path must be mapped
    assert sorted(mapped_params - set(flax_params))[:8] == []
    assert sorted(set(flax_params) - mapped_params)[:8] == []
    assert sorted(mapped_stats - set(flax_stats))[:8] == []
    assert sorted(set(flax_stats) - mapped_stats)[:8] == []


def test_converter_round_trip_values(full_shapes):
    records = record_mapping()
    flax_params = _flatten(jax.tree.map(lambda x: x.shape, full_shapes["params"]))
    flax_stats = _flatten(jax.tree.map(lambda x: x.shape, full_shapes.get("batch_stats", {})))
    all_shapes = dict(flax_params)
    all_shapes.update(flax_stats)

    rng = np.random.default_rng(1)
    sd = {}
    for key, (path, transform, kind) in records.items():
        if kind == "skip":
            sd[key] = np.zeros((1, 197, 256), np.float32)  # impl pos_embed buffer
            continue
        shape = tuple(all_shapes[path])
        if transform is _t_linear:
            t_shape = (shape[1], shape[0])
        elif transform is _t_conv:
            t_shape = (shape[3], shape[2], shape[0], shape[1])
        else:
            t_shape = shape
        sd[key] = rng.normal(size=t_shape).astype(np.float32)
    sd["coord_encoder.encoder.bn1.num_batches_tracked"] = np.int64(7)

    params, stats, rep = ckpt.convert_torch_state_dict(sd, graph="shape")
    assert rep["missing"] == []
    assert rep["unconsumed"] == []
    got = _flatten(jax.tree.map(lambda x: tuple(x.shape), params))
    for path, shape in got.items():
        assert shape == tuple(flax_params[path]), path
    got_stats = _flatten(jax.tree.map(lambda x: tuple(x.shape), stats))
    for path, shape in got_stats.items():
        assert shape == tuple(flax_stats[path]), path
    # spot-check transposes numerically
    np.testing.assert_allclose(
        np.transpose(sd["coord_encoder.encoder.conv1.weight"], (2, 3, 1, 0)),
        params["coord_encoder"]["encoder"]["conv1"]["kernel"],
    )
    np.testing.assert_allclose(
        np.transpose(sd["impl_network.latent_proj.weight"], (1, 0)),
        params["impl_network"]["latent_proj"]["kernel"],
    )
    np.testing.assert_allclose(
        sd["coord_encoder.encoder.bn1.running_mean"],
        stats["coord_encoder"]["encoder"]["bn1"]["bn"]["mean"],
    )


def test_merge_params_partial():
    template = {"a": {"x": np.zeros((2, 2))}, "b": {"y": np.zeros(3)}}
    loaded = {"a": {"x": np.ones((2, 2))}}
    out = ckpt.merge_params(template, loaded)
    assert out["a"]["x"].sum() == 4 and out["b"]["y"].sum() == 0
    with pytest.raises(ValueError):
        ckpt.merge_params(template, {"a": {"x": np.ones((3, 3))}})
