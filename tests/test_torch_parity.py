"""Numerical parity: flax models + torch->flax importer vs torch oracles.

The strongest checkpoint-parity evidence available without network access to
the released weights (BASELINE.md): build the reference's torch module
graph with its exact state-dict key layout (tests/torch_oracle_dpt.py),
randomize it, import the state dict through our converter, and require the
flax forward to match the torch forward numerically. This exercises every
hazard SURVEY §7 ranks under "bit-for-bit-ish parity": conv padding
conventions (torch k//2 vs TF-SAME), weight standardization, GroupNorm/
LayerNorm epsilons, align_corners=True fusion upsampling, pos-embed resize
(align_corners=False), GELU form (erf, not tanh), and the converter's
transposes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from zeroshape_tpu.models.dpt import DPTDepthModel
from zeroshape_tpu.runtime import checkpoint as ckpt

from torch_oracle_dpt import DPTDepthOracle, randomize_


H = 64


@pytest.fixture(scope="module")
def oracle_and_params():
    oracle = randomize_(DPTDepthOracle(H=H, W=H), seed=7).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params, stats, report = ckpt.convert_torch_state_dict(sd, graph="omnidata_dpt")
    assert report["missing"] == [], report["missing"][:5]
    assert report["unconsumed"] == [], report["unconsumed"][:5]
    assert stats == {}  # the DPT stack is GroupNorm-only: no BN statistics
    return oracle, params["dpt_depth"]


@pytest.mark.slow
def test_dpt_full_forward_matches_torch(oracle_and_params):
    oracle, params = oracle_and_params
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, H, H, 3)).astype(np.float32)

    with torch.no_grad():
        depth_t, feat_t = oracle(torch.from_numpy(x).permute(0, 3, 1, 2))
    depth_t = depth_t.permute(0, 2, 3, 1).numpy()
    feat_t = feat_t.permute(0, 2, 3, 1).numpy()

    model = DPTDepthModel()
    depth_j, feat_j = model.apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(feat_j), feat_t, rtol=1e-4, atol=1e-4,
        err_msg="reassembled layer_4 (intrinsics feature) diverges from torch",
    )
    # the end-to-end depth passes through 12 ViT blocks + 4 fusion stages;
    # XLA and oneDNN contract in different orders, so fp32 reassociation
    # noise accumulates to ~5e-4 on <1% of pixels (the per-tap test above
    # holds 1e-4). 1e-3 still catches any semantic divergence (a wrong
    # padding/eps/activation shifts whole maps by >1e-2).
    np.testing.assert_allclose(
        np.asarray(depth_j), depth_t, rtol=1e-3, atol=1e-3,
        err_msg="DPT depth output diverges from torch",
    )


@pytest.mark.slow
def test_dpt_backbone_taps_match_torch(oracle_and_params):
    """Pin down *where* any divergence enters: compare the four backbone taps."""
    oracle, params = oracle_and_params
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, H, H, 3)).astype(np.float32)
    xs = x * 2.0 - 1.0  # DPTDepthModel input scaling

    with torch.no_grad():
        l1, l2, t3, t4 = oracle.pretrained.model(
            torch.from_numpy(xs).permute(0, 3, 1, 2)
        )

    from zeroshape_tpu.models.dpt import HybridViT

    vit = HybridViT()
    j1, j2, j3, j4 = vit.apply(
        {"params": params["dpt"]["pretrained"]}, jnp.asarray(xs)
    )
    np.testing.assert_allclose(
        np.asarray(j1), l1.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4,
        err_msg="ResNetV2 stage0 tap",
    )
    np.testing.assert_allclose(
        np.asarray(j2), l2.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4,
        err_msg="ResNetV2 stage1 tap",
    )
    np.testing.assert_allclose(
        np.asarray(j3), t3.numpy(), rtol=1e-4, atol=1e-4, err_msg="ViT block-8 tap"
    )
    np.testing.assert_allclose(
        np.asarray(j4), t4.numpy(), rtol=1e-4, atol=1e-4, err_msg="ViT block-11 tap"
    )


# ---------------------------------------------------------------------------
# Shape-graph components: coord encoder (BN), implicit decoder, intr head
# ---------------------------------------------------------------------------

from torch_oracle_shape import (
    CoordEncResOracle,
    ImplicitOracle,
    IntrHeadOracle,
    randomize_with_buffers_,
)


@pytest.fixture(scope="module")
def shape_oracles():
    coord = randomize_with_buffers_(CoordEncResOracle(), seed=11).eval()
    intr = randomize_with_buffers_(IntrHeadOracle(), seed=12).eval()
    impl = randomize_with_buffers_(ImplicitOracle(), seed=13).eval()
    sd = {}
    for prefix, mod in (("coord_encoder.", coord), ("impl_network.", impl)):
        sd.update({prefix + k: v.numpy() for k, v in mod.state_dict().items()})
    sd.update({k: v.numpy() for k, v in intr.state_dict().items()})
    # the converter maps the full shape graph; add the DPT oracle's keys too
    from torch_oracle_dpt import DPTDepthOracle, randomize_

    dpt = randomize_(DPTDepthOracle(H=H, W=H), seed=14).eval()
    sd.update({"dpt_depth." + k: v.numpy() for k, v in dpt.state_dict().items()})
    params, stats, report = ckpt.convert_torch_state_dict(sd, graph="shape")
    assert report["missing"] == [], report["missing"][:5]
    assert report["unconsumed"] == [], report["unconsumed"][:5]
    return coord, intr, impl, params, stats


@pytest.mark.slow
def test_coord_encoder_matches_torch(shape_oracles):
    """BN-ResNet50 coord encoder: eval-mode BatchNorm running statistics,
    torch k//2 padding, pooled-fc global token, layer3 local tokens
    (reference seen_coord_enc.py:141-194)."""
    coord, _, _, params, stats = shape_oracles
    from zeroshape_tpu.models.coord_enc import CoordEncRes

    rng = np.random.default_rng(2)
    cm = rng.normal(size=(2, H, H, 3)).astype(np.float32)
    mask = (rng.uniform(size=(2, H, H, 1)) > 0.4).astype(np.float32)

    with torch.no_grad():
        ref = coord(
            torch.from_numpy(cm).permute(0, 3, 1, 2),
            torch.from_numpy(mask).permute(0, 3, 1, 2),
        ).numpy()

    ours = CoordEncRes(latent_dim=256).apply(
        {
            "params": params["coord_encoder"],
            "batch_stats": stats["coord_encoder"],
        },
        jnp.asarray(cm),
        jnp.asarray(mask),
        False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def test_intr_head_matches_torch(shape_oracles):
    _, intr, _, params, stats = shape_oracles
    from zeroshape_tpu.models.graph_shape import IntrHead

    rng = np.random.default_rng(3)
    feat = rng.normal(size=(2, 4, 4, 768)).astype(np.float32)
    with torch.no_grad():
        ref = intr(torch.from_numpy(feat).permute(0, 3, 1, 2)).numpy()
    ours = IntrHead().apply(
        {"params": params["intr_head"], "batch_stats": stats["intr_head"]},
        jnp.asarray(feat),
        False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def _graph_batch(H, B=2, n_pts=64, seed=5):
    """A realistic joint batch for the full-graph oracles."""
    rng = np.random.default_rng(seed)
    rgb = rng.uniform(0, 1, (B, H, H, 3)).astype(np.float32)
    mask = np.zeros((B, H, H, 1), np.float32)
    mask[:, H // 4 : 3 * H // 4, H // 4 : 3 * H // 4] = 1.0
    depth = np.zeros((B, H, H, 1), np.float32)
    depth[mask > 0.5] = rng.uniform(0.5, 1.0, int(mask.sum())).astype(np.float32)
    f = 1.3875 * H
    intr = np.tile(
        np.array([[f, 0, H / 2], [0, f, H / 2], [0, 0, 1]], np.float32), (B, 1, 1)
    )
    th = rng.uniform(0, 2 * np.pi, B)
    pose = np.zeros((B, 3, 4), np.float32)
    for b in range(B):
        c, s = np.cos(th[b]), np.sin(th[b])
        pose[b, :, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        pose[b, :, 3] = (0, 0, 1.78)
    pts = rng.uniform(-0.5, 0.5, (B, n_pts, 3)).astype(np.float32)
    sdf = (rng.normal(size=(B, n_pts)) * 0.1).astype(np.float32)
    return {
        "rgb_input_map": rgb,
        "mask_input_map": mask,
        "depth_input_map": depth,
        "intr": intr,
        "pose_gt": pose,
        "gt_sample_points": pts,
        "gt_sample_sdf": sdf,
    }


def _tame_depth_head(dpt_oracle):
    """Keep the randomized depth head inside the [0,1] clamp with spread —
    a saturated constant map would make the geometry branch vacuous (the
    same failure mode arch.depth.head_init_scale fixes for real training,
    docs/TRAINING.md)."""
    with torch.no_grad():
        last = dpt_oracle.scratch.output_conv[4]
        last.weight.mul_(1e-2)
        last.bias.fill_(0.5)


def _graph_opt(H):
    from zeroshape_tpu.config import Config

    return Config(
        {
            "H": H,
            "W": H,
            "arch": {
                "num_heads": 8,
                "latent_dim": 256,
                "win_size": 16,
                "depth": {"encoder": "resnet", "dsp": 1, "head_init_scale": 1.0},
                "rgb": {"encoder": None},
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
            "loss_weight": {"shape": 1, "depth": 1, "intr": 10},
            "training": {
                "n_sdf_points": 64,
                "shape_loss": {"impt_weight": 1.0, "impt_thres": 0.01},
                "depth_loss": {
                    "grad_reg": 0.1,
                    "depth_inv": True,
                    "mask_shrink": False,
                },
            },
        }
    )


@pytest.mark.slow
def test_shape_graph_full_forward_matches_torch():
    """ENTIRE ShapeGraph.forward + losses vs a torch re-derivation of
    reference graph_shape.py:115-202 from one imported state dict: depth ->
    intr_param2mtx -> unproject/normalize (vectorized vs the reference's
    per-sample loop) -> coord encode -> GT no-grad block -> implicit decode
    -> BCE/MiDaS/intr losses."""
    from torch_oracle_graph import ShapeGraphOracle
    from torch_oracle_shape import randomize_with_buffers_

    from zeroshape_tpu.models import graph_shape
    from zeroshape_tpu.models.graph_shape import ShapeGraph

    H = 64
    oracle = randomize_with_buffers_(ShapeGraphOracle(H=H, W=H), seed=21).eval()
    _tame_depth_head(oracle.dpt_depth)
    sd = {k: v.numpy() for k, v in oracle.state_dict_reference_layout().items()}
    params, stats, report = ckpt.convert_torch_state_dict(sd, graph="shape")
    assert report["missing"] == [], report["missing"][:5]
    assert report["unconsumed"] == [], report["unconsumed"][:5]

    batch = _graph_batch(H)
    nchw = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
    with torch.no_grad():
        out_t, loss_t = oracle(
            nchw(batch["rgb_input_map"]),
            nchw(batch["mask_input_map"]),
            nchw(batch["depth_input_map"]),
            torch.from_numpy(batch["intr"]),
            torch.from_numpy(batch["pose_gt"]),
            torch.from_numpy(batch["gt_sample_points"]),
            torch.from_numpy(batch["gt_sample_sdf"]),
        )
    # guard against a degenerate fixture (dead clamped depth head would make
    # the geometry branch vacuous)
    assert float(out_t["depth_pred"].std()) > 1e-3

    model = ShapeGraph(H=H, W=H)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out_j = model.apply(
        {"params": params, "batch_stats": stats}, jb, train=False,
        with_supervision=True,
    )
    opt = _graph_opt(H)
    loss_j = graph_shape.compute_loss(opt, jb, out_j, training=True)

    np.testing.assert_allclose(
        np.asarray(out_j["depth_pred"]),
        out_t["depth_pred"].permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=1e-3, err_msg="depth_pred",
    )
    np.testing.assert_allclose(
        np.asarray(out_j["intr_pred"]), out_t["intr_pred"].numpy(),
        rtol=1e-3, atol=1e-3, err_msg="intr_pred",
    )
    np.testing.assert_allclose(
        np.asarray(out_j["seen_points"]), out_t["seen_points"].numpy(),
        rtol=1e-3, atol=1e-3, err_msg="normalized visible surface",
    )
    np.testing.assert_allclose(
        np.asarray(out_j["gt_points_cam"]), out_t["gt_points_cam"].numpy(),
        rtol=1e-4, atol=1e-4, err_msg="GT-normalized query points",
    )
    np.testing.assert_allclose(
        np.asarray(out_j["latent_depth"]), out_t["latent_depth"].numpy(),
        rtol=2e-3, atol=2e-3, err_msg="coord-encoder latents",
    )
    np.testing.assert_allclose(
        np.asarray(out_j["pred_sample_occ"]), out_t["pred_sample_occ"].numpy(),
        rtol=5e-3, atol=5e-3, err_msg="occupancy logits",
    )
    for k in ("shape", "depth", "intr"):
        np.testing.assert_allclose(
            float(loss_j[k]), float(loss_t[k]), rtol=2e-3, atol=2e-4,
            err_msg=f"loss[{k}]",
        )


@pytest.mark.slow
def test_depth_graph_full_forward_matches_torch():
    """ENTIRE DepthGraph.forward + losses vs the torch re-derivation of
    reference graph_depth.py:61-105 from one imported state dict."""
    from torch_oracle_graph import DepthGraphOracle
    from torch_oracle_shape import randomize_with_buffers_

    from zeroshape_tpu.models import graph_depth
    from zeroshape_tpu.models.graph_depth import DepthGraph

    H = 64
    oracle = randomize_with_buffers_(DepthGraphOracle(H=H, W=H), seed=22).eval()
    _tame_depth_head(oracle.dpt_depth)
    sd = {}
    sd.update(
        {"dpt_depth." + k: v.numpy() for k, v in oracle.dpt_depth.state_dict().items()}
    )
    sd.update({k: v.numpy() for k, v in oracle.intr_oracle.state_dict().items()})
    params, stats, report = ckpt.convert_torch_state_dict(sd, graph="depth")
    assert report["missing"] == [], report["missing"][:5]
    assert report["unconsumed"] == [], report["unconsumed"][:5]

    batch = _graph_batch(H, seed=6)
    nchw = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
    with torch.no_grad():
        out_t, loss_t = oracle(
            nchw(batch["rgb_input_map"]),
            nchw(batch["mask_input_map"]),
            nchw(batch["depth_input_map"]),
            torch.from_numpy(batch["intr"]),
        )
    assert float(out_t["depth_pred"].std()) > 1e-3

    model = DepthGraph(H=H, W=H, predict_intr=True)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    out_j = model.apply({"params": params, "batch_stats": stats}, jb, train=False)
    opt = _graph_opt(H)
    loss_j = graph_depth.compute_loss(opt, jb, out_j)

    np.testing.assert_allclose(
        np.asarray(out_j["depth_pred"]),
        out_t["depth_pred"].permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=1e-3, err_msg="depth_pred",
    )
    np.testing.assert_allclose(
        np.asarray(out_j["intr_pred"]), out_t["intr_pred"].numpy(),
        rtol=1e-3, atol=1e-3, err_msg="intr_pred",
    )
    np.testing.assert_allclose(
        np.asarray(out_j["seen_points_pred"]), out_t["seen_points_pred"].numpy(),
        rtol=1e-3, atol=1e-3, err_msg="normalized predicted surface",
    )
    np.testing.assert_allclose(
        np.asarray(out_j["seen_points_gt"]), out_t["seen_points_gt"].numpy(),
        rtol=1e-4, atol=1e-4, err_msg="normalized GT surface",
    )
    for k in ("depth", "intr"):
        np.testing.assert_allclose(
            float(loss_j[k]), float(loss_t[k]), rtol=2e-3, atol=2e-4,
            err_msg=f"loss[{k}]",
        )


def test_implicit_matches_torch(shape_oracles):
    """Masked joint attention + skip MLP: the factored encode/decode must
    reproduce the reference's joint-sequence formulation with converted
    weights (implicit.py:11-288), including the baked sin-cos pos embed."""
    _, _, impl, params, stats = shape_oracles
    from zeroshape_tpu.models.implicit import Implicit

    rng = np.random.default_rng(4)
    latent = rng.normal(size=(2, 17, 256)).astype(np.float32)
    pts = (rng.uniform(size=(2, 50, 3)) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        occ_t, attn_t = impl(torch.from_numpy(latent), torch.from_numpy(pts))

    m = Implicit(num_patches=16, latent_dim=256, drop_path=0.0)
    occ_j, attn_j = m.apply(
        {"params": params["impl_network"]},
        jnp.asarray(latent),
        None,
        jnp.asarray(pts),
    )
    np.testing.assert_allclose(
        np.asarray(occ_j), occ_t.numpy(), rtol=2e-4, atol=2e-4,
        err_msg="occupancy logits diverge",
    )
    np.testing.assert_allclose(
        np.asarray(attn_j), attn_t.numpy(), rtol=2e-4, atol=2e-4,
        err_msg="attention visualization weights diverge",
    )
