import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu.models.dpt import DPTDepthModel
from zeroshape_tpu.models.coord_enc import CoordEncRes
from zeroshape_tpu.models.implicit import Implicit
from zeroshape_tpu.models.resnet import ResNet50, ResNetV2Stem


def test_resnet50_feature_shapes():
    m = ResNet50()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    feats, pooled = m.apply(vars_, x)
    assert feats["layer1"].shape == (1, 16, 16, 256)
    assert feats["layer2"].shape == (1, 8, 8, 512)
    assert feats["layer3"].shape == (1, 4, 4, 1024)
    assert feats["layer4"].shape == (1, 2, 2, 2048)
    assert pooled.shape == (1, 2048)


def test_resnetv2_stem_shapes():
    m = ResNetV2Stem()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    s0, s1, final = m.apply(vars_, x)
    assert s0.shape == (1, 16, 16, 256)
    assert s1.shape == (1, 8, 8, 512)
    assert final.shape == (1, 4, 4, 1024)


def test_dpt_depth_shapes_and_range():
    m = DPTDepthModel()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    depth, feat = m.apply(vars_, x)
    assert depth.shape == (1, 64, 64, 1)
    assert feat.shape == (1, 2, 2, 768)
    d = np.asarray(depth)
    assert d.min() >= 0.0 and d.max() <= 1.0


def test_dpt_head_init_scale_keeps_head_alive():
    """From-scratch init: with the default kernel init the 1-channel head can
    land its whole pre-ReLU map outside [0, 1] and die (zero gradient through
    ReLU∘clamp — the observed frozen MiDaS loss ≈ 1.01). head_init_scale keeps
    the init output near the +0.05 bias so gradients flow.

    Wiring check: scale → 0 makes the output exactly the bias. Liveness check:
    scale 1e-3 (what options/shape_overfit.yaml ships — the un-normalized DPT
    fusion path emits large-magnitude features, so 1e-2 is already mostly
    dead) gives a spatially varying, almost fully ReLU-alive init output and
    a nonzero depth-loss gradient on the head kernel.
    """
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)

    m0 = DPTDepthModel(head_init_scale=0.0)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    d0 = np.asarray(m0.apply(v0, x)[0])
    assert np.allclose(d0, 0.05), "scale=0 must reduce the head to its bias"

    m = DPTDepthModel(head_init_scale=0.001)
    v = m.init(jax.random.PRNGKey(0), x)
    d = np.asarray(m.apply(v, x)[0])
    assert d.std() > 0.0
    assert 0.0 < d.mean() < 0.2
    assert (d > 0.0).mean() > 0.9, "the init map must be ReLU-alive"

    from zeroshape_tpu import losses

    gt = jnp.asarray(
        np.random.default_rng(2).uniform(1.0, 2.0, (1, 1, 64, 64)), jnp.float32
    )
    mask = jnp.ones((1, 1, 64, 64), jnp.float32)

    def loss_fn(params):
        depth, _ = m.apply({"params": params, **{k: v[k] for k in v if k != "params"}}, x)
        return losses.depth_loss(jnp.transpose(depth, (0, 3, 1, 2)), gt, mask)

    grads = jax.grad(loss_fn)(v["params"])
    gk = np.asarray(grads["head_conv3"]["kernel"])
    assert np.abs(gk).max() > 0.0, "depth loss must reach the head kernel"


def test_coord_enc_res_token_shape():
    m = CoordEncRes(latent_dim=256, win_size=16)
    coord = jnp.zeros((2, 64, 64, 3))
    mask = jnp.ones((2, 64, 64, 1))
    vars_ = m.init(jax.random.PRNGKey(0), coord, mask)
    tokens = m.apply(vars_, coord, mask)
    # 64/16 = 4 -> 16 local + 1 global
    assert tokens.shape == (2, 17, 256)


# ---------------------------------------------------------------------------
# Implicit decoder: factored two-stream == naive masked joint attention
# ---------------------------------------------------------------------------

def _np(p):
    return np.asarray(p, np.float64)


def _layernorm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _gelu(x):
    # tanh-free exact gelu (matches jax.nn.gelu(approximate=True)? flax uses
    # approximate by default) -> use the tanh approximation like flax nn.gelu
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def _softplus100(x):
    return np.where(x * 100 > 20, x, np.log1p(np.exp(np.minimum(x * 100, 20.0))) / 100)


def _naive_joint_forward(params, pos_embed, latent_tokens, points, num_heads, skip_in=(2,)):
    """Oracle: one concatenated sequence per block with an explicit attention
    mask (latents<->latents; point i -> latents + itself), as the reference
    formulates it."""
    P = points.shape[1]
    L = latent_tokens.shape[1]
    lat = latent_tokens @ _np(params["latent_proj"]["kernel"]) + _np(params["latent_proj"]["bias"])
    pts = points @ _np(params["point_proj"]["kernel"]) + _np(params["point_proj"]["bias"])
    x = np.concatenate([lat, pts], axis=1)  # [B, L+P, C]
    B, N, C = x.shape
    hd = C // num_heads

    # mask[i, j] = 1 if token i may attend to token j
    mask = np.zeros((N, N), bool)
    mask[:L, :L] = True
    for i in range(P):
        mask[L + i, :L] = True
        mask[L + i, L + i] = True

    n_blocks = len([k for k in params if k.startswith("block")])
    out_points = None
    for l in range(n_blocks):
        blk = params[f"block{l}"]
        last = l == n_blocks - 1
        if l == 0:
            x[:, :L] = x[:, :L] + pos_embed
        n = _layernorm(x, _np(blk["norm1"]["scale"]), _np(blk["norm1"]["bias"]))
        qkv = n @ _np(blk["qkv"]["kernel"]) + _np(blk["qkv"]["bias"])
        qkv = qkv.reshape(B, N, 3, num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k, v = (np.swapaxes(t, 1, 2) for t in (q, k, v))  # [B, H, N, hd]
        attn = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        attn = np.where(mask[None, None], attn, -np.inf)
        attn = np.exp(attn - attn.max(-1, keepdims=True))
        attn = attn / attn.sum(-1, keepdims=True)
        o = np.einsum("bhqk,bhkd->bhqd", attn, v)
        o = np.swapaxes(o, 1, 2).reshape(B, N, C)
        o = o @ _np(blk["proj"]["kernel"]) + _np(blk["proj"]["bias"])

        def mlp(y):
            h = _layernorm(y, _np(blk["norm2"]["scale"]), _np(blk["norm2"]["bias"]))
            h = h @ _np(blk["mlp"]["fc1"]["kernel"]) + _np(blk["mlp"]["fc1"]["bias"])
            h = _gelu(h)
            return h @ _np(blk["mlp"]["fc2"]["kernel"]) + _np(blk["mlp"]["fc2"]["bias"])

        if last:
            xp = x[:, L:] + o[:, L:]
            xp = xp + mlp(xp)
            out_points = xp
        else:
            x = x + o
            x = x + mlp(x)

    out = _layernorm(out_points, _np(params["norm"]["scale"]), _np(params["norm"]["bias"]))
    inputs = np.concatenate([points, out], axis=-1)
    h = inputs
    mlp_p = params["impl_mlp"]
    n_lin = len([k for k in mlp_p if k.startswith("lin")])
    for l in range(n_lin):
        if l in skip_in:
            h = np.concatenate([h, inputs], axis=-1) / np.sqrt(2)
        h = h @ _np(mlp_p[f"lin{l}"]["kernel"]) + _np(mlp_p[f"lin{l}"]["bias"])
        if l < n_lin - 1:
            h = _softplus100(h)
    return h[..., 0]


@pytest.fixture(scope="module")
def implicit_setup():
    m = Implicit(num_patches=16, latent_dim=32, n_channels=64, n_blocks_attn=2,
                 n_layers_mlp=4, num_heads=4, skip_in=(2,), drop_path=0.1)
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(2, 17, 32)), jnp.float32)
    points = jnp.asarray(rng.normal(size=(2, 25, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), latent, None, points)
    return m, vars_, latent, points


def test_implicit_shapes(implicit_setup):
    m, vars_, latent, points = implicit_setup
    occ, attn = m.apply(vars_, latent, None, points)
    assert occ.shape == (2, 25)
    assert attn.shape == (2, 25, 17)
    # attention rows: cross mass <= 1 (self term excluded from vis)
    a = np.asarray(attn)
    assert (a >= 0).all() and (a.sum(-1) <= 1.0 + 1e-5).all()


def test_implicit_matches_naive_joint_oracle(implicit_setup):
    m, vars_, latent, points = implicit_setup
    occ, _ = m.apply(vars_, latent, None, points)
    pos = np.asarray(
        __import__("zeroshape_tpu.models.layers", fromlist=["x"]).get_2d_sincos_pos_embed(
            64, 4, cls_token=True
        )
    )
    oracle = _naive_joint_forward(
        jax.tree.map(np.asarray, vars_["params"]), pos, _np(latent), _np(points), num_heads=4
    )
    np.testing.assert_allclose(np.asarray(occ), oracle, rtol=2e-3, atol=2e-4)


def test_implicit_point_independence(implicit_setup):
    """Each point's occupancy must not depend on other points in the query set
    (the masked attention guarantees this by construction)."""
    m, vars_, latent, points = implicit_setup
    occ_full, _ = m.apply(vars_, latent, None, points)
    occ_half, _ = m.apply(vars_, latent, None, points[:, :5])
    np.testing.assert_allclose(np.asarray(occ_full)[:, :5], np.asarray(occ_half), rtol=1e-5, atol=1e-6)


def test_implicit_encode_decode_split(implicit_setup):
    """decode(encode(latent), points) == __call__ exactly."""
    m, vars_, latent, points = implicit_setup
    occ_joint, attn_joint = m.apply(vars_, latent, None, points)

    def split(mdl, latent, points):
        caches = mdl.encode(latent)
        return mdl.decode(caches, points)

    occ_split, attn_split = m.apply(vars_, latent, points, method=split)
    np.testing.assert_allclose(np.asarray(occ_joint), np.asarray(occ_split), atol=1e-6)
    np.testing.assert_allclose(np.asarray(attn_joint), np.asarray(attn_split), atol=1e-6)
