"""Small-surface units: VTK writer, checkpoint best-dir, profiling."""

import json
import os

import numpy as np

from lagrangebench_tpu.checkpoint import load_checkpoint, save_checkpoint
from lagrangebench_tpu.evaluate import pkl2vtk, write_vtk
from lagrangebench_tpu.profiling import StepTimer


def test_write_vtk_2d_and_vectors(tmp_path):
    path = str(tmp_path / "frame.vtk")
    write_vtk(
        {
            "r": np.array([[0.1, 0.2], [0.3, 0.4]]),
            "tag": np.array([0, 1]),
            "vel": np.array([[1.0, 0.0], [0.0, 1.0]]),
        },
        path,
    )
    text = open(path).read()
    assert "POINTS 2 float" in text
    assert "0.1 0.2 0" in text  # 2D padded to 3D
    assert "SCALARS tag int 1" in text
    assert "VECTORS vel float" in text


def test_pkl2vtk(tmp_path):
    import pickle

    rollout = {
        "predicted_rollout": np.zeros((3, 4, 2)),
        "ground_truth_rollout": np.ones((3, 4, 2)),
        "particle_type": np.zeros(4, np.int64),
    }
    src = str(tmp_path / "rollout_0.pkl")
    with open(src, "wb") as f:
        pickle.dump(rollout, f)
    pkl2vtk(src, str(tmp_path / "vtk"))
    files = sorted(os.listdir(tmp_path / "vtk"))
    assert len(files) == 6  # 3 predicted + 3 reference frames


def test_checkpoint_best_dir_tracking(tmp_path):
    ckp = str(tmp_path / "ckp")
    params = {"w": np.ones((2, 2))}

    save_checkpoint(ckp, params, {}, None, {"step": 1, "loss": 0.5})
    save_checkpoint(ckp, {"w": np.full((2, 2), 2.0)}, {}, None,
                    {"step": 2, "loss": 0.1})  # better -> best updated
    save_checkpoint(ckp, {"w": np.full((2, 2), 3.0)}, {}, None,
                    {"step": 3, "loss": 0.9})  # worse -> best kept

    with open(os.path.join(ckp, "best", "metadata_ckp.json")) as f:
        best = json.load(f)
    assert best["step"] == 2 and best["loss"] == 0.1
    best_params, _, _, step = load_checkpoint(os.path.join(ckp, "best"))
    assert step == 2
    np.testing.assert_allclose(best_params["w"], 2.0)
    # main dir holds the latest
    latest, _, _, step = load_checkpoint(ckp)
    assert step == 3
    np.testing.assert_allclose(latest["w"], 3.0)


def test_step_timer():
    t = StepTimer()
    t.tick()
    t.tick()
    t.tick()
    stats = t.stats(particles_per_step=100)
    assert stats["perf/ms_per_step"] >= 0
    assert "perf/particle_steps_per_sec" in stats
    t.reset_clock()
    t.tick()  # must not raise after a reset
