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
