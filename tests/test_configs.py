"""All shipped config presets must resolve and validate."""

import glob
import os

import pytest

from lagrangebench_tpu.config import load_with_extends
from lagrangebench_tpu.defaults import check_cfg, defaults

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESETS = sorted(
    p
    for p in glob.glob(os.path.join(REPO, "configs", "*", "*.yaml"))
    if not p.endswith("base.yaml")
)


@pytest.mark.parametrize("path", PRESETS, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_preset_resolves(path, monkeypatch):
    monkeypatch.chdir(REPO)  # extends paths are repo-relative
    cfg = load_with_extends(path, defaults)
    assert cfg.model.name in ("gns", "segnn", "egnn", "painn", "linear")
    check_cfg(cfg)
    # model presets carry the published hyperparameters
    assert cfg.model.latent_dim in (64, 128)
    assert cfg.train.optimizer.lr_start <= 1e-3
