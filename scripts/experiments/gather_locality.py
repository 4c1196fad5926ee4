"""Experiment: does spatial LOCALITY of the sender indices move the
h[senders] gather cost?

Motivation (round 3): the inter-step sender gather is ~0.23 ms/step at
8k/3D — ~1.4x its materialization floor — and docs/performance.md
attributes the excess to random 256 B row reads served at HBM sector
granularity. Every prior variant changed the *operator* (Pallas kernels,
one-hot selects, dynamic_gather); none changed the *index distribution*.
If node state were stored in cell-sorted (slot) order, the senders of
consecutive receiver rows would cluster into narrow bands — turning the
random row reads into near-sequential ones. This probe measures the XLA
gather under synthetic index distributions of decreasing entropy:

  random   — uniform over [0, N)                  (today's layout, worst case)
  banded   — idx[i, k] in [i - W, i + W] mod N     (cell-sorted layout, W ~ stencil span)
  sorted   — banded + each row's K entries sorted  (what a slot NL would emit)
  seq      — idx[i, k] = (i + k) mod N             (perfect locality bound)

If banded ~= random, the gather cost is issue/kernel-bound and the
cell-sorted reordering buys nothing (close the book). If banded tracks
seq, a once-per-rollout-step node permutation (the counting-sort slot
order already computed by the NL) is worth wiring through the MP chain.

Run: python scripts/experiments/gather_locality.py [N K F]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=200):
    @jax.jit
    def loop(salt0, *a):
        def body(salt, _):
            r = fn(salt, *a)
            return salt + jnp.sum(r.astype(jnp.float32)) * 1e-30, None

        salt, _ = jax.lax.scan(body, salt0, None, length=n)
        return salt

    jax.block_until_ready(loop(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(jnp.float32(1e-32), *args))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt


def main(argv):
    N = int(argv[1]) if len(argv) > 1 else 8192
    K = int(argv[2]) if len(argv) > 2 else 24
    F = int(argv[3]) if len(argv) > 3 else 128

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)

    idx_random = rng.integers(0, N, size=(N, K), dtype=np.int32)

    # banded: senders within +-W of the receiver row (W ~ 3 cell columns
    # of ~43 particles each at RPF 3D density -> use 128)
    W = 128
    offs = rng.integers(-W, W + 1, size=(N, K))
    idx_banded = ((np.arange(N)[:, None] + offs) % N).astype(np.int32)
    idx_banded_sorted = np.sort(idx_banded, axis=1).astype(np.int32)

    idx_seq = ((np.arange(N)[:, None] + np.arange(K)[None, :]) % N).astype(
        np.int32
    )

    def gather(salt, idx):
        return (h + salt)[idx]

    for name, idx in [
        ("random          ", idx_random),
        ("banded W=128    ", idx_banded),
        ("banded+rowsorted", idx_banded_sorted),
        ("sequential      ", idx_seq),
    ]:
        timeit(name, gather, jnp.asarray(idx))


if __name__ == "__main__":
    main(sys.argv)
