"""Training-step benchmark: batched GNS-10-128 train step, pallas vs celllist.

Times the trainer's fused jit train step (preprocess + noise + NL update per
sample, model grads on the flattened super-graph, optimizer update) at a
given batch size on the current device.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_train(backend: str, batch: int = 4, n: int = 4000, steps: int = 20):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _grid_positions, _make_case_and_model
    from lagrangebench_tpu.train.trainer import Trainer
    from lagrangebench_tpu.utils import broadcast_to_batch

    dim, isl = 3, 6
    case, metadata, init_fn, apply_fn = _make_case_and_model(
        n, dim=dim, isl=isl, backend=backend, nl_format="dense",
        compute_dtype="bfloat16",
    )

    pos = np.stack(
        [_grid_positions(n, dim, 1.0, isl, seed=i) for i in range(batch)]
    )
    ptype = np.zeros((batch, n), dtype=np.int32)

    _metadata = dict(metadata)

    class _Data:
        metadata = _metadata
        subseq_length = isl + 1
        input_seq_length = isl
        num_samples = batch
        dataset_path = "<memory>"
        name = "bench"

        def __len__(self):
            return batch

        def __getitem__(self, i):
            return pos[i], ptype[i]

    trainer = Trainer(
        (init_fn, apply_fn),
        case,
        _Data(),
        _Data(),
        cfg_train={
            "batch_size": batch,
            "noise_std": 3e-4,
            "pushforward": {"steps": [-1], "unrolls": [0], "probs": [1]},
        },
        cfg_eval={"n_rollout_steps": 1, "train": {"n_trajs": 1}},
        cfg_logging={"log_steps": 1, "eval_steps": 1000},
        input_seq_length=isl,
        seed=0,
    )

    key = jax.random.PRNGKey(0)
    sample0 = (jnp.asarray(pos[0]), jnp.asarray(ptype[0]))
    key, features, _, neighbors = case.allocate(key, sample0)
    params, state = init_fn(key, (features, ptype[0]))
    opt_state = trainer.opt_init(params)
    keys = jax.random.split(key, batch)
    nbrs_b = broadcast_to_batch(neighbors, batch)
    raw = (jnp.asarray(pos), jnp.asarray(ptype))

    def step():
        return trainer._train_step(
            params, state, opt_state, keys, raw, nbrs_b, 3e-4, 0
        )

    out = step()
    jax.block_until_ready(out[0])
    assert not bool(out[6]), "train bench overflowed"

    t0 = time.perf_counter()
    for _ in range(steps):
        out = step()
    jax.block_until_ready(out[0])
    ms = (time.perf_counter() - t0) / steps * 1e3
    return {
        "backend": backend,
        "batch": batch,
        "n_particles": n,
        "ms_per_train_step": round(ms, 2),
        "particle_steps_per_sec": round(n * batch / (ms / 1e3), 1),
    }


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    for backend in ("pallas", "celllist"):
        print(json.dumps(bench_train(backend, batch=batch, n=n)), flush=True)
