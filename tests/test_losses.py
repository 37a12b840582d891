import jax.numpy as jnp
import numpy as np

from zeroshape_tpu import losses


def np_bce_logits(x, y):
    return np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))


def test_shape_loss_matches_numpy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 64)).astype(np.float32)
    sdf = rng.normal(scale=0.05, size=(2, 64)).astype(np.float32)
    got = float(losses.shape_loss(jnp.asarray(logits), jnp.asarray(sdf), 0.01, 5.0))
    occ = (sdf < 0).astype(np.float32)
    loss = np_bce_logits(logits, occ)
    w = np.where(np.abs(sdf) < 0.01, 5.0, 1.0)
    np.testing.assert_allclose(got, (loss * w).mean(), rtol=1e-5)


def test_intr_loss_masked():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 32, 3)).astype(np.float32)
    b = rng.normal(size=(2, 32, 3)).astype(np.float32)
    m = (rng.uniform(size=(2, 32)) > 0.5).astype(np.float32)
    got = float(losses.intr_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m)))
    d = ((a - b) ** 2).sum(-1)
    ref = (d * m).sum() / (m.sum() + 1e-8)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_masked_median_lower_median():
    x = jnp.asarray([[3.0, 1.0, 2.0, 9.0], [5.0, 5.0, 5.0, 5.0]])
    m = jnp.asarray([[True, True, True, False], [False, False, False, False]])
    med = np.asarray(losses._masked_median(x, m))
    assert med[0] == 2.0  # median of {1,2,3}
    assert med[1] == 0.0  # empty mask -> 0


def test_masked_median_even_count_is_lower():
    x = jnp.asarray([[4.0, 1.0, 3.0, 2.0]])
    m = jnp.ones((1, 4), bool)
    # lower median of {1,2,3,4} = 2 (torch nanmedian convention)
    assert float(losses._masked_median(x, m)[0]) == 2.0


def test_compute_scale_and_shift_exact_affine():
    rng = np.random.default_rng(2)
    pred = rng.uniform(1, 2, size=(1, 8, 8)).astype(np.float32)
    target = 3.0 * pred + 0.5
    mask = np.ones_like(pred)
    s, t = losses.compute_scale_and_shift(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(s[0]), 3.0, rtol=1e-4)
    np.testing.assert_allclose(float(t[0]), 0.5, rtol=1e-3)


def test_masked_median_bisection_matches_sort_exactly():
    """The 32-step bit-space bisection must return the EXACT lower median
    (an actual row element), bit-identical to the full-sort formulation,
    on adversarial inputs: duplicates, negatives, zeros, tiny/huge values,
    even/odd counts, empty and single-element rows."""
    import numpy as np

    from zeroshape_tpu import losses

    rng = np.random.default_rng(0)
    cases = []
    x = rng.normal(size=(8, 257)).astype(np.float32) * rng.choice(
        [1e-6, 1.0, 1e6], size=(8, 1)
    ).astype(np.float32)
    m = rng.uniform(size=(8, 257)) > 0.3
    cases.append((x, m))
    # heavy duplicates + negatives + exact zeros
    x2 = rng.choice([-2.0, -0.0, 0.0, 0.5, 3.0], size=(4, 64)).astype(np.float32)
    m2 = rng.uniform(size=(4, 64)) > 0.2
    cases.append((x2, m2))
    # empty row, single-element row, full row
    x3 = rng.normal(size=(3, 16)).astype(np.float32)
    m3 = np.zeros((3, 16), bool)
    m3[1, 7] = True
    m3[2, :] = True
    cases.append((x3, m3))
    for x, m in cases:
        ref = np.asarray(losses._masked_median_sort(jnp.asarray(x), jnp.asarray(m)))
        got = np.asarray(losses._masked_median(jnp.asarray(x), jnp.asarray(m)))
        np.testing.assert_array_equal(got, ref)


def test_masked_median_gradient_routes_to_median_element():
    """d/dx median(x) is 1 on the (lower-)median element, 0 elsewhere —
    torch.nanmedian's subgradient, which the reference loss backprops
    through (midas_loss.py:34-61)."""
    import jax
    import numpy as np

    from zeroshape_tpu import losses

    x = jnp.asarray([[3.0, 1.0, 7.0, 5.0, 9.0]])
    m = jnp.ones((1, 5), bool)
    g = jax.grad(lambda v: losses._masked_median(v, m).sum())(x)
    np.testing.assert_allclose(np.asarray(g), [[0, 0, 0, 1.0, 0]])  # median=5


def test_midas_loss_zero_for_identical_aligned():
    # pred is an affine transform of target => ssi term ~0, grad term ~0
    rng = np.random.default_rng(3)
    gt = rng.uniform(0.5, 1.5, size=(2, 1, 16, 16)).astype(np.float32)
    pred = 2.0 * gt + 1.0
    mask = np.ones_like(gt)
    val = float(
        losses.midas_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask), alpha=0.0)
    )
    assert val < 1e-4


def test_midas_loss_positive_and_finite():
    rng = np.random.default_rng(4)
    gt = rng.uniform(0.2, 1.0, size=(2, 1, 16, 16)).astype(np.float32)
    pred = rng.uniform(0.2, 1.0, size=(2, 1, 16, 16)).astype(np.float32)
    mask = (rng.uniform(size=(2, 1, 16, 16)) > 0.3).astype(np.float32)
    val = float(
        losses.midas_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask), alpha=0.1)
    )
    assert np.isfinite(val) and val > 0


def test_erode_mask_blocks():
    m = np.ones((1, 1, 8, 8), np.float32)
    m[0, 0, 0, 0] = 0  # one hole invalidates its 4x4 cell
    out = np.asarray(losses.erode_mask(jnp.asarray(m), 4))
    assert out[0, 0, :4, :4].sum() == 0
    assert out[0, 0, 4:, 4:].all()


def test_summarize_loss_weights():
    ld = {"shape": jnp.asarray(2.0), "depth": jnp.asarray(3.0)}
    total = float(losses.summarize_loss(ld, {"shape": 1.0, "depth": None}))
    assert total == 2.0
