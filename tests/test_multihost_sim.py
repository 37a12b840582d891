"""Opt-in wrapper around scripts/multihost_sim.py so the load-bearing
multi-host evidence cannot rot unnoticed: the 2-process train step and the
2-process evaluation pass must both run and agree across processes.

Opt-in (slow: spawns 2 jax.distributed processes, several minutes each on
the CPU mesh):
    ZEROSHAPE_MULTIHOST_SIM=1 python -m pytest tests/test_multihost_sim.py -q
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.environ.get("ZEROSHAPE_MULTIHOST_SIM"),
        reason="multihost sim is opt-in: set ZEROSHAPE_MULTIHOST_SIM=1",
    ),
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_sim.py")


def _run(mode):
    env = dict(os.environ)
    # the sim manages its own XLA flags / platform; drop the suite's 8-device
    # forcing so each worker gets exactly 4 virtual devices
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, SCRIPT, mode],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    assert f"multihost {mode} sim OK" in res.stdout, res.stdout[-3000:]


def test_multihost_train_step_agrees():
    _run("train")


def test_multihost_eval_agrees():
    _run("eval")
