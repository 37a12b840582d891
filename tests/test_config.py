import os

import pytest
import yaml

from zeroshape_tpu.config import (
    Config,
    load_options,
    override_options,
    parse_arguments,
    set_options,
)


def test_parse_dotted_overrides():
    opt = parse_arguments(["--a.b.c=3", "--flag", "--other!", "--lr=3.e-5", "--name=run1"])
    assert opt.a.b.c == 3
    assert opt.flag is True
    assert opt.other is False
    assert abs(opt.lr - 3e-5) < 1e-12
    assert opt.name == "run1"


def test_parse_duplicate_key_rejected():
    with pytest.raises(ValueError):
        parse_arguments(["--a=1", "--a=2"])


def test_parent_inheritance(tmp_path):
    parent = tmp_path / "base.yaml"
    parent.write_text(yaml.safe_dump({"x": 1, "nested": {"a": 1, "b": 2}}))
    child = tmp_path / "child.yaml"
    child.write_text(yaml.safe_dump({"_parent_": str(parent), "nested": {"b": 3}, "y": 5}))
    opt = load_options(str(child))
    assert opt.x == 1 and opt.y == 5
    assert opt.nested.a == 1 and opt.nested.b == 3


def test_safe_check_rejects_unknown_key():
    base = Config({"a": 1})
    with pytest.raises(KeyError):
        override_options(base, Config({"zz": 2}), safe_check=True)


def test_frozen_config_is_readonly(tmp_path):
    y = tmp_path / "o.yaml"
    y.write_text(
        yaml.safe_dump(
            {
                "group": "g",
                "name": "n",
                "seed": 0,
                "image_size": [224, 224],
                "max_epoch": 15,
                "freq": {"eval": None},
            }
        )
    )
    opt = set_options(Config({"yaml": str(y)}), safe_check=False)
    assert opt.H == 224 and opt.W == 224
    assert opt.freq.eval == 1  # derived: max(15 // 20, 1)
    with pytest.raises(AttributeError):
        opt.H = 5
    # unfrozen copies are writable
    cp = opt.unfrozen_copy()
    cp.H = 5
    assert cp.H == 5 and opt.H == 224


def test_compilation_cache_enabled_by_process_options():
    """Every CLI path (set_options -> process_options) turns on the
    persistent XLA compile cache so repeat launches skip the full-model
    compile; ZEROSHAPE_NO_JAX_CACHE opts out. Run in subprocesses: the
    suite itself opts out (conftest) and jax config is process-global."""
    import subprocess
    import sys

    prog = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from zeroshape_tpu.config import _enable_compilation_cache;"
        "_enable_compilation_cache();"
        "d = jax.config.jax_compilation_cache_dir;"
        "print('DIR', d)"
    )
    env = dict(os.environ)
    env.pop("ZEROSHAPE_NO_JAX_CACHE", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)  # an ambient dir would win
    out = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert "DIR" in out.stdout and out.stdout.split("DIR", 1)[1].strip().endswith(
        ".jax_cache"
    ), out.stdout

    env["ZEROSHAPE_NO_JAX_CACHE"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    tail = out.stdout.split("DIR", 1)[1].strip()
    assert tail in ("None", ""), out.stdout
