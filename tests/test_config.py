"""Config system: merge, dotlist parsing, YAML extends chains."""

import os

import pytest

from lagrangebench_tpu.config import (
    Config,
    check_subset,
    from_dotlist,
    load_with_extends,
    merge,
)
from lagrangebench_tpu.defaults import check_cfg, defaults, resolve_backend


def test_attribute_access_and_nesting():
    cfg = Config({"a": 1, "b": {"c": 2}})
    assert cfg.a == 1
    assert cfg.b.c == 2
    cfg.b.d = 3
    assert cfg["b"]["d"] == 3
    with pytest.raises(AttributeError):
        _ = cfg.missing


def test_merge_priority_and_deep():
    base = Config({"x": 1, "sub": {"a": 1, "b": 2}})
    over = Config({"sub": {"b": 3}, "y": 4})
    out = merge(base, over)
    assert out.x == 1 and out.y == 4
    assert out.sub.a == 1 and out.sub.b == 3
    # merge does not mutate inputs
    assert base.sub.b == 2


def test_dotlist_types():
    cfg = from_dotlist(["a.b=3", "a.c=0.5", "d=true", "e=[1,2]", "f=null", "g=gns"])
    assert cfg.a.b == 3 and isinstance(cfg.a.b, int)
    assert cfg.a.c == 0.5
    assert cfg.d is True
    assert cfg.e == [1, 2]
    assert cfg.f is None
    assert cfg.g == "gns"


def test_extends_chain(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        "extends: LAGRANGEBENCH_DEFAULTS\n"
        "model:\n  input_seq_length: 4\n"
        "train:\n  batch_size: 2\n"
    )
    child = tmp_path / "child.yaml"
    child.write_text("extends: base.yaml\nmodel:\n  name: gns\n  latent_dim: 32\n")

    cfg = load_with_extends(str(child), defaults)
    assert cfg.model.name == "gns"
    assert cfg.model.latent_dim == 32
    assert cfg.model.input_seq_length == 4  # from base
    assert cfg.train.batch_size == 2  # from base
    assert cfg.train.noise_std == defaults.train.noise_std  # from defaults
    assert "extends" not in cfg


def test_extends_cycle_detection(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text("extends: b.yaml\n")
    b.write_text("extends: a.yaml\n")
    with pytest.raises(ValueError, match="Circular"):
        load_with_extends(str(a), defaults)


def test_check_subset():
    check_subset(defaults, from_dotlist(["train.batch_size=4"]))
    with pytest.raises(AssertionError, match="Unknown config key"):
        check_subset(defaults, from_dotlist(["train.batchsize=4"]))


def test_backend_aliases():
    assert resolve_backend("jaxmd_vmap") == "celllist"
    assert resolve_backend("matscipy") == "celllist"
    assert resolve_backend("allpairs") == "allpairs"
    with pytest.raises(AssertionError):
        resolve_backend("bogus")


def test_check_cfg_requires_dataset():
    cfg = defaults.copy()
    with pytest.raises(AssertionError, match="dataset.src"):
        check_cfg(cfg)
    cfg.dataset.src = "/tmp/x"
    check_cfg(cfg)
