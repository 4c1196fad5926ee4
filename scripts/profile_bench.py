"""Decompose the headline-bench rollout step (pallas NL + fused GNS)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _grid_positions, _make_case_and_model


def timeit(name, fn, n=int(os.environ.get("PROF_N", "20"))):
    @jax.jit
    def loop(salt0):
        def body(salt, _):
            r = fn(salt)
            return salt + jnp.sum(r.astype(jnp.float32)) * 1e-30, None

        salt, _ = jax.lax.scan(body, salt0, None, length=n)
        return salt

    jax.block_until_ready(loop(jnp.float32(0.0)))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(jnp.float32(1e-32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt


def main():
    n, dim, isl = 8000, 3, 6
    backend = os.environ.get("NL_BACKEND", "pallas")
    case, metadata, init_fn, apply_fn = _make_case_and_model(
        n, dim=dim, isl=isl, backend=backend, nl_format="dense",
        compute_dtype="bfloat16", use_fused_processor=True,
    )
    pos = _grid_positions(n, dim, 1.0, isl)
    ptype = np.zeros(n, dtype=np.int32)
    features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
    params, state = init_fn(jax.random.PRNGKey(0), (features, ptype))
    current = jnp.asarray(pos[:, :isl], jnp.float32)
    ptype_j = jnp.asarray(ptype)
    print("edge capacity:", neighbors.idx.shape, flush=True)

    t_nl = timeit(
        "nl_update",
        lambda s: neighbors.update_fn(
            current[:, -1] + s, neighbors, num_particles=n
        ).idx,
    )
    t_pre = timeit(
        "preprocess_eval (nl + features)",
        lambda s: case.preprocess_eval((current + s, ptype_j), neighbors)[0][
            "rel_dist"
        ],
    )
    print(f"  -> features alone: {t_pre - t_nl:.3f} ms", flush=True)

    t_fwd = timeit(
        "forward_fused",
        lambda s: apply_fn(
            params, {},
            ({**features, "vel_hist": features["vel_hist"] + s}, ptype_j),
        )[0]["acc"],
    )

    out0, _ = apply_fn(params, {}, (features, ptype_j))

    def integrate_shift(s):
        nxt = case.integrate({"acc": out0["acc"] + s}, current)
        return jnp.concatenate([current[:, 1:], nxt[:, None]], axis=1)

    t_int = timeit("integrate+shift", integrate_shift)

    def one_step(s):
        cur = current + s
        f, nbrs = case.preprocess_eval((cur, ptype_j), neighbors)
        out, _ = apply_fn(params, {}, (f, ptype_j))
        nxt = case.integrate(out, cur)
        return jnp.concatenate([cur[:, 1:], nxt[:, None]], axis=1)

    t_step = timeit("one_step (full)", one_step)
    print(
        f"sum of parts: {t_nl + (t_pre - t_nl) + t_fwd + t_int:.3f} ms "
        f"vs full {t_step:.3f} ms",
        flush=True,
    )

    # forward with 0 MP steps isolates encoder+decoder+feature-concat glue
    case0, _, init0, apply0 = _make_case_and_model(
        n, dim=dim, isl=isl, backend=backend, nl_format="dense",
        compute_dtype="bfloat16", use_fused_processor=True, mp_steps=1,
    )
    params0, _ = init0(jax.random.PRNGKey(0), (features, ptype))
    t_fwd1 = timeit(
        "forward_fused_mp1",
        lambda s: apply0(
            params0, {},
            ({**features, "vel_hist": features["vel_hist"] + s}, ptype_j),
        )[0]["acc"],
    )
    per_mp = (t_fwd - t_fwd1) / 9
    print(
        f"per-mp-step (incl hs gather+proj): {per_mp:.3f} ms; "
        f"encoder+decoder+glue: {t_fwd1 - per_mp:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
