"""Probe: flat-window carry + incremental vel_hist vs the standard step glue.

Round-3 profiling left ~0.7 ms/step of feature/integrate glue plus ~0.5 ms
of sender-position gather outside the kernels (docs/performance.md). The
gather is now removable via neighbors.emit_geometry (in-kernel geometry).
This probe measures the glue half: the hypothesis is that the cost is the
(N, T, dim) position-window layout — minor dim 3 pads to 128 lanes on TPU
(42x memory) and every op in the per-step vel_hist recompute chain
(T-1 min-image displacements + normalize + reshape) moves padded bytes —
plus the launch count.

Variant B restructures the ROLLOUT CARRY only (no model/case changes):
  * window stored FLAT (N, T*dim) f32 (pads 18->128 once, not 42x per op),
  * vel_hist carried and updated INCREMENTALLY: one new min-image velocity
    per step + two flat concats, instead of recomputing all T-1,
  * edge geometry from the NL kernel (emit_geometry=True),
  * integrate on flat slices.

Run (TPU):
    python scripts/experiments/step_glue_probe.py
Env: GLUE_N (8000), GLUE_STEPS (50), GLUE_REPEATS (12), GLUE_EMIT (0 —
the emit_geometry A/B in bench.py measured the in-kernel geometry WORSE
standalone, so B defaults to the gather path and GLUE_EMIT=1 isolates
the combination).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from functools import partial

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _grid_positions, _make_case_and_model  # noqa: E402


def make_variants(n, dim, isl):
    on_tpu = jax.default_backend() == "tpu"
    emit = on_tpu and bool(int(os.environ.get("GLUE_EMIT", "0")))
    backend = "pallas" if on_tpu else "celllist"
    case, metadata, init_fn, apply_fn = _make_case_and_model(
        n, dim=dim, isl=isl, backend=backend, nl_format="dense",
        compute_dtype="bfloat16",
        use_fused_processor=on_tpu, emit_geometry=emit,
    )
    pos = _grid_positions(n, dim, 1.0, isl)
    ptype = np.zeros(n, dtype=np.int32)
    features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
    params, state = init_fn(jax.random.PRNGKey(0), (features, ptype))

    box = 1.0
    stats = case.normalization_stats
    vmean = jnp.asarray(stats["velocity"]["mean"])
    vstd = jnp.asarray(stats["velocity"]["std"])
    amean = jnp.asarray(stats["acceleration"]["mean"])
    astd = jnp.asarray(stats["acceleration"]["std"])

    # ---------------- A: the standard bench step -------------------------
    def step_a(params_, cur, ptype_, nbrs):
        feats, nbrs = case.preprocess_eval((cur, ptype_), nbrs)
        out, _ = apply_fn(params_, {}, (feats, ptype_))
        next_pos = case.integrate(out, cur)
        cur = jnp.concatenate([cur[:, 1:], next_pos[:, None]], axis=1)
        return cur, nbrs

    @partial(jax.jit, static_argnums=4)
    def rollout_a(params_, current, ptype_, nbrs, n_steps):
        def body(carry, _):
            cur, nbrs = carry
            cur, nbrs = step_a(params_, cur, ptype_, nbrs)
            return (cur, nbrs), None

        (current, nbrs), _ = jax.lax.scan(
            body, (current, nbrs), None, length=n_steps
        )
        return current, nbrs

    # ---------------- B: flat carry + incremental vel_hist ---------------
    def minimg(d):
        return d - box * jnp.floor(d / box + 0.5)

    def step_b(params_, w, vh, ptype_, nbrs):
        """w: (N, T*dim) flat window; vh: (N, (T-1)*dim) normalized."""
        most_recent = w[:, -dim:]
        nn = w.shape[0]
        npart = (ptype_ != -1).sum()
        nbrs = nbrs.update(most_recent, num_particles=npart)
        feats = {
            "vel_hist": vh,
            "senders": nbrs.idx,
            "receivers": jax.lax.broadcasted_iota(
                jnp.int32, nbrs.idx.shape, 0
            ),
        }
        if getattr(nbrs, "aux", None) and "rel_disp" in nbrs.aux:
            feats["rel_disp"] = nbrs.aux["rel_disp"]
            feats["rel_dist"] = nbrs.aux["rel_dist"]
        else:  # CPU fallback: gather path
            senders = nbrs.idx
            recv = jnp.broadcast_to(
                most_recent[:, None, :], senders.shape + (dim,)
            )
            send = most_recent[jnp.minimum(senders, nn - 1)]
            rd = minimg(recv - send) / metadata["default_connectivity_radius"]
            rd = jnp.where((senders < nn)[..., None], rd, 0.0)
            feats["rel_disp"] = rd
            feats["rel_dist"] = jnp.linalg.norm(
                rd, axis=-1, keepdims=True
            )
        out, _ = apply_fn(params_, {}, (feats, ptype_))
        acc = amean + out["acc"] * astd
        last_vel = minimg(most_recent - w[:, -2 * dim:-dim])
        new_vel = last_vel + acc
        new_pos = jnp.mod(most_recent + new_vel, box)
        w = jnp.concatenate([w[:, dim:], new_pos], axis=1)
        vh = jnp.concatenate(
            [vh[:, dim:], (new_vel - vmean) / vstd], axis=1
        )
        return w, vh, nbrs

    @partial(jax.jit, static_argnums=5)
    def rollout_b(params_, w, vh, ptype_, nbrs, n_steps):
        def body(carry, _):
            w, vh, nbrs = carry
            w, vh, nbrs = step_b(params_, w, vh, ptype_, nbrs)
            return (w, vh, nbrs), None

        (w, vh, nbrs), _ = jax.lax.scan(
            body, (w, vh, nbrs), None, length=n_steps
        )
        return w, nbrs

    cur0 = jnp.asarray(pos[:, :isl], jnp.float32)
    w0 = cur0.reshape(n, isl * dim)
    vseq = minimg(cur0[:, 1:] - cur0[:, :-1])
    vh0 = ((vseq - vmean) / vstd).reshape(n, (isl - 1) * dim)
    return (
        params, jnp.asarray(ptype), neighbors, case,
        (rollout_a, cur0), (rollout_b, w0, vh0),
    )


def time_rollout(fn, args, n_steps, repeats):
    out = fn(*args, n_steps)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, n_steps)
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / repeats / n_steps * 1e3, out


def main():
    n = int(os.environ.get("GLUE_N", "8000"))
    n_steps = int(os.environ.get("GLUE_STEPS", "50"))
    repeats = int(os.environ.get("GLUE_REPEATS", "12"))
    dim, isl = 3, 6

    (params, ptype, nbrs, case,
     (rollout_a, cur0), (rollout_b, w0, vh0)) = make_variants(n, dim, isl)

    ms_a, out_a = time_rollout(
        rollout_a, (params, cur0, ptype, nbrs), n_steps, repeats
    )
    ms_b, out_b = time_rollout(
        rollout_b, (params, w0, vh0, ptype, nbrs), n_steps, repeats
    )

    # value check: final windows must agree (same math, different layout).
    # Compare min-image: A keeps positions unwrapped in the window while B
    # wraps into [0, box) every step — x=0 and x=box are the same point.
    fa = np.asarray(out_a[0]).reshape(n, -1)
    fb = np.asarray(out_b[0])
    d = fa - fb
    err = float(np.max(np.abs(d - 1.0 * np.floor(d / 1.0 + 0.5))))
    print(f"A standard glue        : {ms_a:8.3f} ms/step")
    print(f"B flat+incremental glue: {ms_b:8.3f} ms/step")
    print(f"max |final_window A-B| = {err:.3e}  (expect <1e-4; "
          "bf16 model + f32 glue)")
    print(f"speedup: {ms_a / ms_b:.3f}x  ({(ms_a - ms_b):.3f} ms/step)")


if __name__ == "__main__":
    main()
