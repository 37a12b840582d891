"""Exactness of the fused Pallas decoder kernel vs the XLA implicit decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeroshape_tpu.models.implicit import Implicit
from zeroshape_tpu.ops.implicit_kernel import fused_decode, pack_decoder_params


@pytest.fixture(scope="module")
def setup():
    m = Implicit(
        num_patches=16,
        latent_dim=32,
        n_channels=64,
        n_blocks_attn=2,
        n_layers_mlp=4,  # 5 linears
        num_heads=4,
        skip_in=(2,),
        drop_path=0.1,
    )
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(1, 17, 32)), jnp.float32)
    points = jnp.asarray(rng.normal(size=(1, 300, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), latent, None, points)
    return m, vars_, latent, points


@pytest.mark.parametrize("attn_mode", ["perhead", "blockdiag", "grouped"])
def test_fused_decode_matches_xla(setup, attn_mode):
    m, vars_, latent, points = setup

    def encode(mdl, latent):
        return mdl.encode(latent)

    caches = m.apply(vars_, latent, method=encode)
    occ_ref, _ = m.apply(vars_, latent, None, points)

    packed = pack_decoder_params(vars_["params"], n_blocks=2, n_mlp_linears=5)
    occ_kernel = fused_decode(
        points[0],
        caches,
        packed,
        latent_len=17,
        n_blocks=2,
        n_heads=4,
        skip_in=(2,),
        n_mlp_linears=5,
        tile=128,
        interpret=True,
        attn_mode=attn_mode,
    )
    # bf16 matmuls vs the fp32 XLA path: logit-scale agreement
    a, b = np.asarray(occ_kernel), np.asarray(occ_ref)[0]
    np.testing.assert_allclose(a, b, rtol=8e-2, atol=2e-2)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9999, corr
    assert np.abs(a - b).mean() < 5e-3


def test_fused_decode_batched_matches_per_sample(setup):
    m, vars_, _, _ = setup
    rng = np.random.default_rng(1)
    B = 3
    latent = jnp.asarray(rng.normal(size=(B, 17, 32)), jnp.float32)
    points = jnp.asarray(rng.normal(size=(B, 200, 3)), jnp.float32)
    caches = m.apply(vars_, latent, method=lambda mdl, l: mdl.encode(l))
    packed = pack_decoder_params(vars_["params"], n_blocks=2, n_mlp_linears=5)
    kw = dict(
        latent_len=17, n_blocks=2, n_heads=4, skip_in=(2,), n_mlp_linears=5,
        tile=128, interpret=True,
    )
    from zeroshape_tpu.ops.implicit_kernel import fused_decode_batched

    batched = fused_decode_batched(points, caches, packed, **kw)
    assert batched.shape == (B, 200)
    for b in range(B):
        per = [(k[b : b + 1], v[b : b + 1]) for (k, v) in caches]
        one = fused_decode(points[b], per, packed, **kw)
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(one), rtol=1e-5, atol=1e-6
        )


def test_fused_decode_grouped_two_groups():
    """Shipped-shape heads (8 x hd=32) split into two 4-head groups: the
    grouped layout's multi-group path must match the XLA decode."""
    m = Implicit(
        num_patches=16, latent_dim=64, n_channels=256, n_blocks_attn=1,
        n_layers_mlp=2, num_heads=8, skip_in=(), drop_path=0.0,
    )
    rng = np.random.default_rng(2)
    latent = jnp.asarray(rng.normal(size=(1, 17, 64)), jnp.float32)
    points = jnp.asarray(rng.normal(size=(1, 256, 3)), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), latent, None, points)
    caches = m.apply(vars_, latent, method=lambda mdl, l: mdl.encode(l))
    occ_ref, _ = m.apply(vars_, latent, None, points)
    packed = pack_decoder_params(vars_["params"], n_blocks=1, n_mlp_linears=3)
    occ = fused_decode(
        points[0], caches, packed, latent_len=17, n_blocks=1, n_heads=8,
        skip_in=(), n_mlp_linears=3, tile=128, interpret=True,
        attn_mode="grouped",
    )
    a, b = np.asarray(occ), np.asarray(occ_ref)[0]
    np.testing.assert_allclose(a, b, rtol=8e-2, atol=2e-2)
    assert np.corrcoef(a, b)[0, 1] > 0.9999
