"""End-to-end smoke test: YAML config -> train -> infer via the CLI path."""

import os

import pytest

from .fixtures import make_dataset


def test_train_and_infer_end_to_end(tmp_path, monkeypatch):
    dataset_path = make_dataset(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(
        "extends: LAGRANGEBENCH_DEFAULTS\n"
        f"dataset:\n  src: {dataset_path}\n"
        "mode: all\n"
        "model:\n"
        "  name: linear\n"
        "  input_seq_length: 3\n"
        "train:\n"
        "  batch_size: 2\n"
        "  step_max: 6\n"
        "  pushforward:\n"
        "    steps: [-1]\n"
        "    unrolls: [0]\n"
        "    probs: [1]\n"
        "eval:\n"
        "  n_rollout_steps: 5\n"
        "  train:\n"
        "    n_trajs: 1\n"
        "  infer:\n"
        "    n_trajs: 1\n"
        "    batch_size: 1\n"
        "    metrics: [mse, e_kin]\n"
        "    out_type: none\n"
        "logging:\n"
        "  log_steps: 2\n"
        "  eval_steps: 3\n"
        "neighbors:\n"
        "  backend: allpairs\n"
    )

    import main as cli

    metrics = cli.main([f"config={cfg_yaml}"])
    assert "val/loss" in metrics
    assert metrics["val/loss"] >= 0.0

    # checkpoint directory was created with config + best subdir
    ckp_root = tmp_path / "ckp"
    runs = os.listdir(ckp_root)
    assert len(runs) == 1
    run_dir = ckp_root / runs[0]
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "best" / "metadata_ckp.json").exists()

    # restart from the checkpoint in infer mode
    metrics2 = cli.main([f"load_ckp={run_dir}", "mode=infer"])
    assert "val/loss" in metrics2


def test_train_and_infer_fused_processor(tmp_path, monkeypatch):
    """CLI smoke test with the preset fast path on: fused_processor GNS
    (off-TPU it runs the identical-math XLA mirror) trains then infers."""
    dataset_path = make_dataset(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(
        "extends: LAGRANGEBENCH_DEFAULTS\n"
        f"dataset:\n  src: {dataset_path}\n"
        "mode: all\n"
        "model:\n"
        "  name: gns\n"
        "  fused_processor: true\n"
        "  compute_dtype: bfloat16\n"
        "  input_seq_length: 3\n"
        "  num_mp_steps: 2\n"
        "  latent_dim: 8\n"
        "train:\n"
        "  batch_size: 2\n"
        "  step_max: 4\n"
        "  pushforward:\n"
        "    steps: [-1]\n"
        "    unrolls: [0]\n"
        "    probs: [1]\n"
        "eval:\n"
        "  n_rollout_steps: 3\n"
        "  train:\n"
        "    n_trajs: 1\n"
        "  infer:\n"
        "    n_trajs: 1\n"
        "    batch_size: 1\n"
        "    metrics: [mse]\n"
        "    out_type: none\n"
        "logging:\n"
        "  log_steps: 2\n"
        "  eval_steps: 4\n"
        "neighbors:\n"
        "  backend: auto\n"
    )

    import main as cli

    metrics = cli.main([f"config={cfg_yaml}"])
    assert "val/loss" in metrics
    assert metrics["val/loss"] >= 0.0


def test_standard_checkpoint_infers_with_fused_processor(tmp_path, monkeypatch):
    """Cross-layout load: a checkpoint trained with the STANDARD processor
    infers under a fused_processor config (runner auto-converts the tree
    via models.ensure_fused_params — the shipped GNS presets enable the
    fused path, and imported reference checkpoints are standard-layout)."""
    dataset_path = make_dataset(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    base = (
        "extends: LAGRANGEBENCH_DEFAULTS\n"
        f"dataset:\n  src: {dataset_path}\n"
        "model:\n"
        "  name: gns\n"
        "  fused_processor: {fused}\n"
        "  input_seq_length: 3\n"
        "  num_mp_steps: 2\n"
        "  latent_dim: 8\n"
        "train:\n"
        "  batch_size: 2\n"
        "  step_max: 2\n"
        "  pushforward:\n"
        "    steps: [-1]\n"
        "    unrolls: [0]\n"
        "    probs: [1]\n"
        "eval:\n"
        "  n_rollout_steps: 3\n"
        "  train:\n"
        "    n_trajs: 1\n"
        "  infer:\n"
        "    n_trajs: 1\n"
        "    batch_size: 1\n"
        "    metrics: [mse]\n"
        "    out_type: none\n"
        "logging:\n"
        "  log_steps: 2\n"
        "  eval_steps: 2\n"
        "neighbors:\n"
        "  backend: celllist\n"
    )
    cfg_std = tmp_path / "std.yaml"
    cfg_std.write_text("mode: train\n" + base.format(fused="false"))

    import main as cli

    cli.main([f"config={cfg_std}"])
    ckp_root = tmp_path / "ckp"
    run_dir = ckp_root / os.listdir(ckp_root)[0]

    cfg_fused = tmp_path / "fused.yaml"
    cfg_fused.write_text("mode: infer\n" + base.format(fused="true"))
    metrics = cli.main([f"config={cfg_fused}", f"load_ckp={run_dir}"])
    assert "val/loss" in metrics and metrics["val/loss"] >= 0.0
