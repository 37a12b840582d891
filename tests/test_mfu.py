"""Pin scripts/mfu.py's FLOP accounting (VERDICT round-4 weak #4).

The 40.5%-MFU claim in BASELINE.md rests on `cost_analysis()` FLOP counts
read through mfu.py's helpers; a refactor that silently changed what they
report would invalidate the published number. Hand-countable programs pin
the accounting: XLA costs a [M,K]@[K,N] matmul at 2*M*K*N FLOPs.
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from mfu import _cost_flops, _flops_fallback_cpu  # noqa: E402


def test_matmul_flops_match_hand_count():
    M, K, N = 64, 128, 256
    a = np.ones((M, K), np.float32)
    b = np.ones((K, N), np.float32)
    fn = lambda x, y: x @ y
    expect = 2 * M * K * N

    flops, src = _flops_fallback_cpu(fn, a, b)
    assert src == "cpu-lowered cost_analysis"
    assert abs(flops - expect) / expect < 0.05, (flops, expect)

    # the primary (compiled-executable) path agrees on this backend
    flops2, _ = _cost_flops(jax.jit(fn).lower(a, b))
    if flops2 is not None:  # cost_analysis is backend-dependent
        assert abs(flops2 - expect) / expect < 0.05, (flops2, expect)


def test_flops_scale_with_batch():
    K, N = 128, 128
    fn = lambda x, y: x @ y
    f1, _ = _flops_fallback_cpu(fn, np.ones((32, K), np.float32), np.ones((K, N), np.float32))
    f2, _ = _flops_fallback_cpu(fn, np.ones((64, K), np.float32), np.ones((K, N), np.float32))
    assert abs(f2 - 2 * f1) / f2 < 0.05, (f1, f2)


def test_fallback_accepts_device_committed_args():
    # the fallback must pull committed arrays to the host before lowering
    # (ADVICE round-4: committed arrays steer lowering back to the device)
    dev = jax.devices()[0]
    a = jax.device_put(jnp.ones((16, 32), jnp.float32), dev)
    b = jax.device_put(jnp.ones((32, 8), jnp.float32), dev)
    flops, _ = _flops_fallback_cpu(lambda x, y: x @ y, a, b)
    expect = 2 * 16 * 32 * 8
    assert abs(flops - expect) / expect < 0.05, (flops, expect)
