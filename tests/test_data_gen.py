"""Offline tooling: statistics + consolidation round-trips."""

import json

import numpy as np
import pytest

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


def test_jax_sph_converter_end_to_end(tmp_path):
    """Per-frame jax-sph directories -> loadable dataset, with LDC wall
    trimming and the 1.45*dx radius heuristic."""
    import h5py
    import yaml

    from lagrangebench_tpu.data import H5Dataset
    from lagrangebench_tpu.data_gen.jax_sph_converter import (
        convert_jax_sph_dir,
        trim_outer_walls,
    )

    rng = np.random.default_rng(0)
    src = tmp_path / "2D_LDC_512"
    dx, n_frames, n_trajs = 0.05, 12, 4
    n_fluid, n_wall = 40, 10
    for t in range(n_trajs):
        d = src / f"2D_LDC_512_{100 + t}"
        d.mkdir(parents=True)
        with open(d / "config.yaml", "w") as f:
            yaml.safe_dump(
                {
                    "case": {"name": "LDC", "dx": dx, "dim": 2,
                             "bounds": [[0.0, 1.0], [0.0, 1.0]],
                             "pbc": [False, False]},
                    "solver": {"name": "SIR", "dt": 0.001},
                    "io": {"write_every": 10},
                },
                f,
            )
        # fluid inside the domain + wall padding layers outside it
        fluid = rng.uniform(3 * dx, 1.0 - 3 * dx, size=(n_fluid, 2))
        wall_below = np.stack(
            [rng.uniform(0, 1, n_wall), rng.uniform(0, 1.5 * dx, n_wall)], 1
        )
        tag = np.concatenate([np.zeros(n_fluid), np.ones(n_wall)]).astype(np.int32)
        base = np.concatenate([fluid, wall_below])
        for k in range(n_frames):
            r = base + 0.001 * k * (tag[:, None] == 0)
            with h5py.File(d / f"traj_{k}.h5", "w") as f:
                f.create_dataset("r", data=r.astype(np.float32))
                f.create_dataset("tag", data=tag)

    dst = str(tmp_path / "out")
    convert_jax_sph_dir(str(src), dst, split="2_1_1")

    with open(f"{dst}/metadata.json") as f:
        meta = json.load(f)
    assert meta["default_connectivity_radius"] == pytest.approx(0.072)  # 1.45*0.05 rounds half-even
    assert meta["sequence_length_train"] == n_frames - 1
    # wall padding below 2*dx was trimmed
    with h5py.File(f"{dst}/train.h5") as f:
        pos = f["00000/position"][:]
        assert pos[0, :, 1].min() >= 2 * dx
        assert pos.shape[0] == n_frames

    # loadable by the data layer
    ds = H5Dataset("train", dst, input_seq_length=3)
    window, ptype = ds[0]
    assert window.shape[0] == meta["num_particles_max"]

    # trim mask semantics
    r = np.array([[0.5, 0.05], [0.5, 0.3], [0.01, 0.5], [0.99 + 6 * dx, 0.5]])
    tag = np.array([0, 0, 1, 1])
    keep = trim_outer_walls(r, tag, dx, (1.0, 1.0))
    assert list(keep) == [False, True, False, False]
