import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu.config import Config
from zeroshape_tpu.models import graph_depth, graph_shape
from zeroshape_tpu.models.graph_shape import ShapeGraph, intr_param2mtx
from zeroshape_tpu.models.graph_depth import DepthGraph


def tiny_opt():
    return Config(
        {
            "H": 64,
            "W": 64,
            "arch": {
                "num_heads": 8,
                "latent_dim": 64,
                "win_size": 16,
                "depth": {"encoder": "resnet", "n_blocks": 2, "dsp": 1},
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
            "training": {
                "n_sdf_points": 32,
                "shape_loss": {"impt_weight": 5, "impt_thres": 0.01},
                "depth_loss": {"grad_reg": 0.1, "depth_inv": True, "mask_shrink": False},
            },
            "loss_weight": {"shape": 1, "depth": None, "intr": None},
        }
    )


def tiny_batch(B=2, H=64, n_pts=32, seed=0):
    rng = np.random.default_rng(seed)
    f = 1.3875 * H
    K = np.array([[f, 0, H / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return {
        "rgb_input_map": jnp.asarray(rng.uniform(0, 1, (B, H, H, 3)), jnp.float32),
        "mask_input_map": jnp.asarray(
            (rng.uniform(size=(B, H, H, 1)) > 0.3).astype(np.float32)
        ),
        "depth_input_map": jnp.asarray(rng.uniform(0.4, 1, (B, H, H, 1)), jnp.float32),
        "intr": jnp.tile(jnp.asarray(K), (B, 1, 1)),
        "pose_gt": jnp.tile(
            jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [1.78]])], axis=1)[None],
            (B, 1, 1),
        ),
        "gt_sample_points": jnp.asarray(rng.normal(size=(B, n_pts, 3)) * 0.3, jnp.float32),
        "gt_sample_sdf": jnp.asarray(rng.normal(size=(B, n_pts)) * 0.05, jnp.float32),
    }


@pytest.fixture(scope="module")
def shape_setup():
    opt = tiny_opt()
    model = ShapeGraph.from_opt(opt)
    batch = tiny_batch()
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    return opt, model, vars_, batch


def test_intr_param2mtx():
    p = jnp.zeros((2, 3))
    K = np.asarray(intr_param2mtx(p, 224, 224))
    assert np.allclose(K[0, 0, 0], 1.3875 * 224)
    assert np.allclose(K[0, 0, 2], 112.0)
    assert np.allclose(K[0, 2, 2], 1.0)
    # extreme params stay bounded
    p2 = jnp.asarray([[100.0, -100.0, 100.0]])
    K2 = np.asarray(intr_param2mtx(p2, 224, 224))
    assert K2[0, 0, 0] <= 4 * 1.3875 * 224 + 1e-3
    assert 0 - 1e-3 <= K2[0, 0, 2] <= 224 + 1e-3


def test_shape_graph_forward_shapes(shape_setup):
    opt, model, vars_, batch = shape_setup
    out, mutated = model.apply(
        vars_, batch, train=False, mutable=["batch_stats"]
    )
    B, H = 2, 64
    assert out["depth_pred"].shape == (B, H, H, 1)
    assert out["intr_pred"].shape == (B, 3, 3)
    assert out["seen_points"].shape == (B, H * H, 3)
    assert out["latent_depth"].shape == (B, 17, 64)
    assert out["pred_sample_occ"].shape == (B, 32)
    assert out["gt_points_cam"].shape == (B, 32, 3)
    assert out["gt_surf_points"].shape == (B, 32, 3)
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()


def test_shape_graph_loss_and_grads(shape_setup):
    opt, model, vars_, batch = shape_setup
    params = vars_["params"]
    other = {k: v for k, v in vars_.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **other},
            batch,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        loss = graph_shape.compute_loss(opt, batch, out, training=True)
        return loss["shape"]

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    # implicit decoder must receive gradient
    g = jax.tree.leaves(grads["impl_network"])
    assert any(np.abs(np.asarray(x)).max() > 0 for x in g)
    # coordinate encoder must receive gradient through the latents
    g2 = jax.tree.leaves(grads["coord_encoder"])
    assert any(np.abs(np.asarray(x)).max() > 0 for x in g2)


def test_depth_graph_forward_and_loss():
    opt = tiny_opt()
    opt_d = opt.unfrozen_copy()
    opt_d.loss_weight = Config({"depth": 1, "intr": 10})
    model = DepthGraph.from_opt(opt_d)
    batch = tiny_batch()
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out, _ = model.apply(vars_, batch, train=False, mutable=["batch_stats"])
    assert out["depth_pred"].shape == (2, 64, 64, 1)
    assert out["seen_points_pred"].shape == (2, 64 * 64, 3)
    loss = graph_depth.compute_loss(opt_d, batch, out, training=True)
    assert set(loss) == {"depth", "intr"}
    assert all(np.isfinite(float(v)) for v in loss.values())


def test_shape_graph_eval_without_gt(shape_setup):
    opt, model, vars_, batch = shape_setup
    eval_batch = {k: v for k, v in batch.items() if not k.startswith("gt_")}
    out, _ = model.apply(vars_, eval_batch, train=False, mutable=["batch_stats"])
    assert "pred_sample_occ" not in out
    assert out["latent_depth"].shape == (2, 17, 64)


def test_shape_graph_transformer_encoder_dsp2():
    """arch.depth.encoder='transformer' with dsp=2: windowed attention encoder
    over the masked-downsampled coordinate map (graph_shape.py:45-46,150)."""
    opt = tiny_opt().unfrozen_copy()
    opt.arch.depth = Config({"encoder": "transformer", "n_blocks": 2, "dsp": 2})
    model = ShapeGraph.from_opt(opt)
    batch = tiny_batch()
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    out = model.apply(vars_, batch, train=False, mutable=False)
    # H=64, dsp=2 -> 32px map; win 16//2=8 -> 4x4=16 windows + cls
    assert out["latent_depth"].shape == (2, 17, 64)
    assert np.isfinite(np.asarray(out["pred_sample_occ"])).all()


def test_shape_graph_with_rgb_encoder():
    """rgb.encoder='resnet' enables the semantic branch: implicit conditions
    on concat(depth, semantic) latents (graph_shape.py:49-59, implicit.py:253)."""
    opt = tiny_opt().unfrozen_copy()
    opt.arch.rgb = Config({"encoder": "resnet", "n_blocks": 2})
    model = ShapeGraph.from_opt(opt)
    batch = tiny_batch()
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    out, _ = model.apply(vars_, batch, train=False, mutable=["batch_stats"])
    assert out["latent_semantic"].shape == (2, 17, 64)
    assert out["pred_sample_occ"].shape == (2, 32)
    assert np.isfinite(np.asarray(out["pred_sample_occ"])).all()


def test_attn_geo_stats_from_forward(shape_setup):
    """Train forward -> the four attention scalars exist, finite, in [0, 1]
    (producer for the reference's consumer at shape_engine.py:537-544)."""
    opt, model, vars_, batch = shape_setup
    out, _ = model.apply(
        vars_, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    stats = graph_shape.attn_geo_stats(opt, batch, out)
    assert set(stats) == {"attn_geo_avg", "attn_geo_seen", "attn_geo_occl", "attn_geo_bg"}
    for k, v in stats.items():
        v = float(v)
        assert np.isfinite(v) and 0.0 <= v <= 1.0, (k, v)
    # eval forward (no supervision) carries no attention -> no stats
    eval_batch = {k: v for k, v in batch.items() if not k.startswith("gt_sample")}
    out_eval = model.apply(vars_, eval_batch, train=False, mutable=False)
    assert graph_shape.attn_geo_stats(opt, eval_batch, out_eval) == {}


def test_attn_geo_stats_classification():
    """Hand-built geometry: a query on the visible surface counts as 'seen',
    an occupied query behind it as 'occl', an unoccupied one as 'bg'."""
    B, H, W, L = 1, 8, 8, 5
    f = 8.0
    intr = jnp.asarray([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], jnp.float32)
    batch = {
        "depth_input_map": jnp.ones((B, H, W, 1), jnp.float32),
        "mask_input_map": jnp.ones((B, H, W, 1), jnp.float32),
        "intr": intr,
        "gt_sample_sdf": jnp.asarray([[-0.001, -0.5, 0.5]], jnp.float32),
    }
    pts = jnp.asarray([[[0, 0, 1.0], [0, 0, 1.5], [0, 0, 0.5]]], jnp.float32)
    attn = jnp.zeros((B, 3, L), jnp.float32)
    attn = attn.at[0, :, 0].set(jnp.asarray([0.8, 0.6, 0.2]))
    out = {
        "attn": attn,
        "gt_points_cam": pts,
        "gt_norm_mean": jnp.zeros((B, 3), jnp.float32),
        "gt_norm_scale": jnp.ones((B,), jnp.float32),
    }
    stats = graph_shape.attn_geo_stats(None, batch, out)
    assert np.isclose(float(stats["attn_geo_avg"]), (0.8 + 0.6 + 0.2) / 3)
    assert np.isclose(float(stats["attn_geo_seen"]), 0.8)
    assert np.isclose(float(stats["attn_geo_occl"]), 0.6)
    assert np.isclose(float(stats["attn_geo_bg"]), 0.2)


def test_head_init_scale_reaches_both_graphs():
    """arch.depth.head_init_scale must flow from the yaml tree into the
    DPTDepthModel of both graphs (the from-scratch liveness fix — see
    models/dpt.py and docs/TRAINING.md). Construction-only, no init."""
    opt = tiny_opt().unfrozen_copy()
    opt.arch.depth.head_init_scale = 0.001
    opt.loss_weight = Config({"shape": 1, "depth": 1, "intr": 10})
    opt = opt.freeze()
    g = ShapeGraph.from_opt(opt)
    assert g.depth_head_init_scale == 0.001
    d = DepthGraph.from_opt(opt)
    assert d.depth_head_init_scale == 0.001
    # default stays the reference's untouched init
    assert ShapeGraph.from_opt(tiny_opt()).depth_head_init_scale == 1.0
