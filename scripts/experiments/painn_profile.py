"""Decompose the fused-PaiNN forward at the 3.2k/2D bench scale.

Times the pipeline stages in isolation (same shapes/dtypes as the bench)
to locate where the 3.45 ms wall time lives: context nets, the packed
sender gather, the filter chain, the fused layer kernel, readout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

N, K, H, DIM, LAYERS = 3200, 16, 128, 2, 5
RBF = 20


def timeit(name, fn, *args, n=50):
    @jax.jit
    def loop(salt0):
        def body(salt, _):
            r = fn(salt, *args)
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
    from lagrangebench_tpu.ops import painn_msg

    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16
    s = jnp.asarray(rng.normal(size=(N, H)), cdt)
    v = jnp.asarray(rng.normal(size=(N, DIM, H)), cdt)
    senders = jnp.asarray(rng.integers(0, N, size=(N, K)), jnp.int32)
    dir_ij = jnp.asarray(rng.normal(size=(N, K, DIM)), cdt)
    wij = jnp.asarray(rng.normal(size=(N, K, 3 * H)), cdt)
    phi = jnp.asarray(rng.normal(size=(N, K, RBF)), cdt)
    w_ctx1 = jnp.asarray(rng.normal(size=(H, H)) * 0.05, cdt)
    w_ctx2 = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.05, cdt)
    w_filt = jnp.asarray(rng.normal(size=(RBF, 3 * H)) * 0.05, cdt)
    mask = jnp.asarray(rng.uniform(size=(N, K)) > 0.2, cdt)
    p = {
        "filt_w": jnp.asarray(rng.normal(size=(RBF, 3 * H)) * 0.05, cdt),
        "filt_b": jnp.zeros((3 * H,), cdt),
        "vmix_w": jnp.asarray(rng.normal(size=(H, 2 * H)) * 0.05, cdt),
        "mix_w1": jnp.asarray(rng.normal(size=(2 * H, H)) * 0.05, cdt),
        "mix_b1": jnp.zeros((H,), cdt),
        "mix_w2": jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.05, cdt),
        "mix_b2": jnp.zeros((3 * H,), cdt),
    }
    # (N, K, RBF+1) raw basis with the per-edge scale in the last column
    phi_ext = jnp.concatenate([phi, mask[..., None]], axis=-1)

    # -- stage ablations (single instance; the model runs LAYERS of each)
    def ctx(salt):
        x = jax.nn.silu((s + salt.astype(cdt)) @ w_ctx1)
        return x @ w_ctx2

    timeit("context_net (x1)", ctx)

    x3h = jnp.asarray(rng.normal(size=(N, 3 * H)), cdt)

    def pack_gather(salt):
        packed = jnp.concatenate(
            [x3h + salt.astype(cdt), v.reshape(N, DIM * H)], axis=-1
        )
        return packed[senders]

    timeit("pack+gather 640w (x1)", pack_gather)

    def gather_narrow(salt):
        return (x3h + salt.astype(cdt))[senders]

    timeit("gather 384w (x1)", gather_narrow)

    def filt(salt):
        return ((phi + salt.astype(cdt)) @ w_filt) * mask[..., None]

    timeit("filter mm+mask (x1)", filt)

    g = jnp.asarray(rng.normal(size=(N, K, (2 + DIM) * H)), cdt)

    def layer_kernel(salt):
        s_out, v_out = painn_msg.painn_layer(
            g, phi_ext + salt.astype(cdt), -dir_ij, s,
            v.reshape(N, DIM * H), p
        )
        return s_out

    timeit("fused layer kernel (x1)", layer_kernel)

    g3 = jnp.asarray(rng.normal(size=(N, K, 3 * H + DIM * H)), cdt)

    def msg_kernel(salt):
        ds, dv = painn_msg.painn_message(
            g3, wij + salt.astype(cdt), -dir_ij, H
        )
        return ds

    timeit("message kernel only (x1)", msg_kernel)

    # -- full 5-layer fused stack (kernel + ctx + gather + filters)
    def stack(salt):
        s_, vf = s + salt.astype(cdt), v.reshape(N, DIM * H)
        for _ in range(LAYERS):
            x = jax.nn.silu(s_ @ w_ctx1) @ w_ctx2
            x3 = x[..., 2 * H:]
            packed = jnp.concatenate(
                [x[..., : 2 * H]]
                + [vf[..., d * H:(d + 1) * H] * x3 for d in range(DIM)],
                axis=-1,
            )
            gg = packed[senders]
            s_, vf = painn_msg.painn_layer(
                gg, phi_ext, -dir_ij, s_, vf, p
            )
        return s_

    timeit("5-layer fused stack", stack)


if __name__ == "__main__":
    main()
