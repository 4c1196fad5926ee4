"""Micro-benchmarks of the rollout-step components on the current device.

Each op runs inside a lax.scan whose carry threads a tiny data dependency
through the iterations — prevents XLA from CSE/DCE-ing repeated calls and
amortizes host dispatch (important on remote-compiled TPU backends).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _grid_positions, _make_case_and_model


def timeit(name, fn, n=20):
    """fn: salt (f32 scalar) -> array; prints ms per call."""

    @jax.jit
    def loop(salt0):
        def body(salt, _):
            r = fn(salt)
            return salt + jnp.sum(r.astype(jnp.float32)) * 1e-30, None

        salt, _ = jax.lax.scan(body, salt0, None, length=n)
        return salt

    r = loop(jnp.float32(0.0))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = loop(jnp.float32(1e-32))
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt


def main():
    n, dim, isl = 8000, 3, 6
    case, metadata, init_fn, apply_fn = _make_case_and_model(
        n, dim=dim, isl=isl, nl_format="dense", compute_dtype="bfloat16"
    )
    pos = _grid_positions(n, dim, 1.0, isl)
    ptype = np.zeros(n, dtype=np.int32)
    features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
    params, state = init_fn(jax.random.PRNGKey(0), (features, ptype))
    current = jnp.asarray(pos[:, :isl], jnp.float32)
    ptype_j = jnp.asarray(ptype)
    print("edge capacity:", neighbors.idx.shape, flush=True)

    timeit(
        "nl_update",
        lambda s: neighbors.update_fn(
            current[:, -1] + s, None, num_particles=n
        ).idx,
    )
    timeit(
        "preprocess_eval",
        lambda s: case.preprocess_eval((current + s, ptype_j), neighbors)[0][
            "rel_dist"
        ],
    )
    timeit(
        "gns_forward",
        lambda s: apply_fn(
            params,
            {},
            ({**features, "vel_hist": features["vel_hist"] + s}, ptype_j),
        )[0]["acc"],
        n=10,
    )

    if neighbors.format == "dense":
        k = neighbors.idx.shape[1]
        snd = neighbors.idx
        recv = jax.lax.broadcasted_iota(jnp.int32, snd.shape, 0)
        from lagrangebench_tpu.ops.scatter import aggregate_to_receivers

        timeit(
            "aggregate_dense_128",
            lambda s: aggregate_to_receivers(
                jnp.full((n, k, 128), 1.0, jnp.bfloat16) + s.astype(jnp.bfloat16),
                recv, snd, n,
            ),
        )
        h = jnp.ones((n, 128), jnp.bfloat16)
        timeit(
            "gather2_128",
            lambda s: (h + s.astype(jnp.bfloat16))[recv]
            + (h + s.astype(jnp.bfloat16))[snd],
        )
        w1 = jnp.ones((384, 128), jnp.bfloat16)
        x = jnp.ones((n, k, 384), jnp.bfloat16)
        timeit(
            "edge_matmul_384x128_bf16",
            lambda s: (x + s.astype(jnp.bfloat16)) @ w1,
        )
    else:
        e_cap = neighbors.idx.shape[1]
        recv = neighbors.idx[0]
        snd = neighbors.idx[1]
        timeit(
            "segment_sum_128",
            lambda s: jax.ops.segment_sum(
                jnp.full((e_cap, 128), 1.0, jnp.float32) + s,
                recv,
                num_segments=n,
                indices_are_sorted=True,
            ),
        )
        h = jnp.ones((n, 128), jnp.float32)
        timeit("gather2_128", lambda s: (h + s)[recv] + (h + s)[snd])
        w1 = jnp.ones((384, 128), jnp.float32)
        x = jnp.ones((e_cap, 384), jnp.float32)
        timeit("edge_matmul_384x128", lambda s: (x + s) @ w1)


if __name__ == "__main__":
    main()
