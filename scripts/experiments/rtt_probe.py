"""Measure the per-dispatch-chain round-trip cost of the attached runtime.

On a remote-attached TPU (axon tunnel) every host->device dispatch chain
that ends in a block_until_ready pays one network round trip on top of
device time. This inflates any benchmark that divides wall time by a
small iteration count: ms_measured = ms_device + RTT / n_iter.

Method: run the SAME trivial jitted program (x + 1 on a scalar) as one
blocking call, then as chains of k asynchronously-dispatched calls with a
single block at the end. The marginal wall time per extra call in a chain
is the pipelined dispatch cost; the intercept is the RTT.

Found (v5e over the axon tunnel, 2026-08-17): ~28 ms per blocking chain,
<0.1 ms marginal per pipelined call. Consequences for this repo's
benches: scripts/bench_models.py amortizes over BENCH_N scan iterations
(default 20 -> 1.4 ms/fwd of RTT; use BENCH_N>=200 or the numbers
overstate fast models by ~40%), bench.py amortizes over
n_repeats * BENCH_STEPS rollout steps (default 3 x 200 -> 0.05 ms/step).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def main():
    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.float32(0.0)
    jax.block_until_ready(f(x))  # compile

    for chain in (1, 2, 4, 8, 16, 32):
        n_trials = 5
        t0 = time.perf_counter()
        for _ in range(n_trials):
            y = x
            for _ in range(chain):
                y = f(y)
            jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / n_trials * 1e3
        print(f"chain={chain:3d}: {dt:8.3f} ms/blocking-chain "
              f"({dt / chain:7.3f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
