"""Headline benchmark: GNS-10-128 rollout throughput on an RPF3D-scale system.

Measures full autoregressive rollout steps (neighbor update + feature build +
GNS forward + semi-implicit Euler integration) on 8,000 particles in 3D —
the reference's heaviest GNS benchmark config (RPF 3D, reference
docs/pages/baselines.rst: 30.5 ms/forward on an A6000 48GB, i.e. ~0.26M
particle-steps/s; BASELINE.md). Prints one JSON line with particle-steps/s
and the ratio vs that baseline.
"""

from __future__ import annotations

import json
import time

import numpy as np


def run_bench(
    n_particles: int = 8000,
    dim: int = 3,
    isl: int = 6,
    n_steps: int = None,
    n_warmup: int = 2,
    backend: str = "pallas",
    nl_format: str = "dense",
    compute_dtype: str = "bfloat16",
    batch_size: int = 1,
    use_fused_processor: bool = True,
    nl_multiplier: float = 1.25,
    emit_geometry: bool = None,
):
    """Single-chip rollout throughput; batch_size > 1 vmaps trajectories
    (production rollouts are batched, reference eval default batch is 2).

    ``nl_multiplier`` sizes the per-row edge capacity from the observed
    max row count. 1.25 is needed at this density: the max neighbor count
    rises from 19 to 21+ as the rollout evolves (tighter caps trip the
    escalation retry and land on LARGER buffers).

    ``n_steps`` (env ``BENCH_STEPS``, default 50) is the scan length of
    ONE rollout call; ``BENCH_REPEATS`` (default 12) rollout calls are
    dispatched as one non-blocking chain with a single final
    ``block_until_ready``. On remote-attached runtimes a blocking chain
    pays one host<->device round trip (~28 ms measured on the axon
    tunnel — scripts/experiments/rtt_probe.py) REGARDLESS of how many
    calls pipeline into it, so the reported ms/rollout-step amortizes the
    RTT over ``n_repeats * n_steps`` steps (600 by default: ~0.05 ms/step
    of RTT; round-2 numbers blocked per 50x3 chain and folded ~0.19 ms).

    The horizon is deliberately SHORT per call: every repeat restarts
    from the same initial state, so the system stays at the nominal
    RPF-like density being benchmarked. The model here is random-init;
    unrolling it for hundreds of steps random-walks particles into
    clusters, inflating the max neighbor count (>40 at 200 steps vs 21
    at 50) — that measures an artifact, not the workload."""
    import os as _os

    if n_steps is None:
        n_steps = int(_os.environ.get("BENCH_STEPS", "50"))
    if emit_geometry is None:
        # measured A/B on v5e (round 4): in-kernel geometry is SLOWER
        # (6.17 vs 5.80 ms/step) — the combined id+geometry scatter and the
        # extra VMEM difference planes cost more than the (N, K, dim)
        # sender-position gather + min-image they remove. Off by default;
        # the knob stays for re-measurement on other toolchains.
        emit_geometry = bool(int(_os.environ.get("BENCH_EMIT_GEOM", "0")))
    import jax as _jax

    if backend == "pallas" and _jax.default_backend() != "tpu":
        backend = "celllist"  # pallas interpret mode is impractically slow
    if _jax.default_backend() != "tpu":
        use_fused_processor = False
    if backend != "pallas":
        emit_geometry = False  # in-kernel geometry is a pallas-NL feature
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _grid_positions, _make_case_and_model

    case, metadata, init_fn, apply_fn = _make_case_and_model(
        n_particles,
        dim=dim,
        isl=isl,
        backend=backend,
        nl_format=nl_format,
        compute_dtype=compute_dtype,
        use_fused_processor=use_fused_processor,
        nl_multiplier=nl_multiplier,
        emit_geometry=emit_geometry,
    )

    pos = _grid_positions(n_particles, dim, 1.0, isl)
    ptype = np.zeros(n_particles, dtype=np.int32)

    features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
    params, state = init_fn(jax.random.PRNGKey(0), (features, ptype))

    # the production rollout shape: the whole horizon is ONE lax.scan on
    # device (see evaluate/rollout.py), so per-step host dispatch overhead
    # does not exist
    def one_step(params_, cur, ptype_, nbrs):
        features, nbrs = case.preprocess_eval((cur, ptype_), nbrs)
        out, _ = apply_fn(params_, {}, (features, ptype_))
        next_pos = case.integrate(out, cur)
        cur = jnp.concatenate([cur[:, 1:], next_pos[:, None]], axis=1)
        return cur, nbrs

    if batch_size > 1:
        # production batching: flat super-graph preprocess + model
        # (vmapped gathers lower poorly — ops/batching.py)
        from lagrangebench_tpu.ops.batching import unflatten_nodes

        integrate_vmap = jax.vmap(case.integrate, in_axes=(0, 0))

        def step(params_, cur, ptype_, nbrs):
            flat_f, nbrs = case.preprocess_eval_batched((cur, ptype_), nbrs)
            out_flat, _ = apply_fn(
                params_, {}, (flat_f, ptype_.reshape(-1))
            )
            out = {
                k: unflatten_nodes(v, batch_size, n_particles)
                for k, v in out_flat.items()
            }
            next_pos = integrate_vmap(out, cur)
            cur = jnp.concatenate([cur[:, :, 1:], next_pos[:, :, None]], axis=2)
            return cur, nbrs
    else:
        step = one_step

    @jax.jit
    def rollout(params_, current, ptype, neighbors):
        def step_fn(carry, _):
            cur, ptype_, nbrs = carry
            cur, nbrs = step(params_, cur, ptype_, nbrs)
            return (cur, ptype_, nbrs), None

        (current, _, neighbors), _ = jax.lax.scan(
            step_fn, (current, ptype, neighbors), None, length=n_steps
        )
        return current, neighbors

    current = jnp.asarray(pos[:, :isl], jnp.float32)
    ptype_j = jnp.asarray(ptype)

    def broadcast(nbrs):
        if batch_size > 1:
            from lagrangebench_tpu.utils import broadcast_to_batch

            return broadcast_to_batch(nbrs, batch_size)
        return nbrs

    if batch_size > 1:
        from lagrangebench_tpu.utils import broadcast_to_batch

        current = broadcast_to_batch(current, batch_size)
        ptype_j = broadcast_to_batch(ptype_j, batch_size)
    neighbors_b = broadcast(neighbors)

    # warmup / compile, with the production overflow-escalation retry
    boost = 1.0
    for _ in range(4):
        cur_w, nbrs_w = rollout(params, current, ptype_j, neighbors_b)
        if not bool(jnp.any(nbrs_w.did_buffer_overflow)):
            break
        boost *= 1.3
        print(f"# bench: neighbor overflow, boosting capacity x{boost:.2f}")
        features, neighbors = case.allocate_eval(
            (pos[:, :isl], ptype), capacity_boost=boost
        )
        neighbors_b = broadcast(neighbors)
    jax.block_until_ready(cur_w)

    n_repeats = int(_os.environ.get("BENCH_REPEATS", "12"))
    t0 = time.perf_counter()
    for _ in range(n_repeats):
        cur_w, nbrs_w = rollout(params, current, ptype_j, neighbors_b)
    jax.block_until_ready(cur_w)
    elapsed = (time.perf_counter() - t0) / n_repeats

    assert not bool(
        jnp.any(nbrs_w.did_buffer_overflow)
    ), "bench rollout overflowed"
    ms_per_step = elapsed / n_steps * 1e3
    particle_steps_per_sec = n_particles * n_steps * batch_size / elapsed

    # reference: RPF 3D GNS-10-128 forward = 30.5 ms for 8,000 particles on
    # an NVIDIA A6000 (docs/pages/baselines.rst) => 262,295 particle-steps/s
    baseline = 8000 / 30.5e-3

    return {
        "metric": "rollout_particle_steps_per_sec_gns10_rpf3d_scale",
        "value": round(particle_steps_per_sec, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(particle_steps_per_sec / baseline, 3),
        "detail": {
            "ms_per_rollout_step": round(ms_per_step, 3),
            "n_particles": n_particles,
            "edges_capacity": int(
                neighbors.idx.shape[-1]
                * (neighbors.idx.shape[0] if neighbors.format == "dense" else 1)
            ),
            "backend": backend,
            "nl_format": nl_format,
            "compute_dtype": compute_dtype,
            "batch_size": batch_size,
            "fused_processor": use_fused_processor,
            "emit_geometry": emit_geometry,
            "device": str(jax.devices()[0]),
        },
    }


if __name__ == "__main__":
    result = run_bench()
    print(json.dumps(result))
