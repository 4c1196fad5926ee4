"""Offline tooling: statistics + consolidation round-trips."""

import numpy as np

from lagrangebench_tpu.data import H5Dataset
from lagrangebench_tpu.data_gen import compute_statistics_h5, consolidate_frames


def test_consolidate_and_stats_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    box = 2.0
    dim = 2
    n, steps = 8, 30
    trajs, types = [], []
    for i in range(4):
        base = rng.uniform(0, box, size=(1, n, dim))
        vel = rng.normal(0, 0.01, size=(1, n, dim))
        t = np.arange(steps)[:, None, None]
        trajs.append(np.mod(base + vel * t, box))
        types.append(np.zeros(n, dtype=np.int64))

    metadata = {
        "bounds": [[0.0, box]] * dim,
        "periodic_boundary_conditions": [True] * dim,
        "default_connectivity_radius": 0.3,
        "dt": 0.01,
        "write_every": 1,
        "dx": 0.1,
    }
    out = consolidate_frames(trajs, types, str(tmp_path / "ds"), metadata)

    # loadable by the dataset layer
    data = H5Dataset("train", out, name="custom", input_seq_length=3)
    pos, ptype = data[0]
    assert pos.shape[0] == n and pos.shape[2] == dim
    assert data.metadata["num_particles_max"] == n

    # stats: constant-velocity trajectories -> acc std ~ 0, vel mean ~ mean vel
    stats = data.metadata
    assert np.allclose(stats["acc_std"], 0.0, atol=1e-9)
    assert np.all(np.asarray(stats["vel_std"]) >= 0.0)

    # hand-check against a direct computation on the train split
    direct = compute_statistics_h5(
        [str(tmp_path / "ds" / "train.h5")], [box] * dim, [True] * dim
    )
    np.testing.assert_allclose(stats["vel_mean"], direct["vel_mean"])


def test_stats_excludes_walls(tmp_path):
    import h5py

    box, dim, n, steps = 1.0, 2, 4, 10
    pos = np.zeros((steps, n, dim))
    # fluid particles move; wall particles teleport wildly (must be ignored)
    pos[:, 0] = np.linspace(0, 0.09, steps)[:, None]
    pos[:, 1] = np.linspace(0, 0.09, steps)[:, None]
    pos[:, 2:] = np.random.default_rng(0).uniform(0, 1, size=(steps, 2, dim))
    ptype = np.array([0, 0, 1, 1])

    path = tmp_path / "walls.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("00000")
        g.create_dataset("position", data=pos)
        g.create_dataset("particle_type", data=ptype)

    stats = compute_statistics_h5([str(path)], [box] * dim, [False] * dim)
    assert np.allclose(stats["acc_std"], 0.0, atol=1e-12)
    assert stats["vel_mean"][0] > 0.0
