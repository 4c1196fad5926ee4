"""Measure the w_next projection fold in isolation.

Times a 10-step fused-MP chain (the GNS processor inner loop, including the
inter-step h[senders] gather) with and without folding the next step's
sender/receiver projections into the kernel.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lagrangebench_tpu.ops import fused_mp

N, K, F = 8000, 24, 128
STEPS = 10


def main():
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(N, K, F)), jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    senders = jnp.asarray(rng.integers(0, N, size=(N, K)), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(N, K)) > 0.2)
    ps = [
        jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.ndim == 2 else a,
            fused_mp.init_step_params(jax.random.PRNGKey(i), F),
        )
        for i in range(STEPS)
    ]

    def chain_unfolded(e, h):
        for p in ps:
            hs = jnp.dot(h, p["w_s"], preferred_element_type=jnp.bfloat16)
            hr = jnp.dot(h, p["w_r"], preferred_element_type=jnp.bfloat16)
            e, h = fused_mp.gns_mp_step(e, hs[senders], hr, h, mask, p)
        return e, h

    def chain_folded(e, h):
        hs = jnp.dot(h, ps[0]["w_s"], preferred_element_type=jnp.bfloat16)
        hr = jnp.dot(h, ps[0]["w_r"], preferred_element_type=jnp.bfloat16)
        for i, p in enumerate(ps):
            wn = (ps[i + 1]["w_s"], ps[i + 1]["w_r"]) if i + 1 < STEPS else None
            out = fused_mp.gns_mp_step(
                e, hs[senders], hr, h, mask, p, w_next=wn
            )
            if wn is not None:
                e, h, hs, hr = out
            else:
                e, h = out
        return e, h

    for name, fn in (("unfolded", chain_unfolded), ("folded", chain_folded)):
        jf = jax.jit(fn)
        out = jf(e, h)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            out = jf(e, h)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {dt:.3f} ms / 10-step chain")

    # value parity
    a = jax.jit(chain_unfolded)(e, h)
    b = jax.jit(chain_folded)(e, h)
    for x, y in zip(a, b):
        d = jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
        print("max abs diff:", float(d))


if __name__ == "__main__":
    main()
