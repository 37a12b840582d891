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
