"""Time WCSPH 3D-TGV substeps vs Verlet-skin width.

The 3D generator at 8000 particles ran ~130 ms/substep with a fresh
celllist rebuild every substep. This probe A/Bs skin widths (cutoff
2h + skin, rebuild every derived-safe period) to pick the generation
setting. Physics is unchanged (all pair terms vanish for q >= 2).

Usage: python scripts/experiments/wcsph_skin_probe.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import numpy as np

from lagrangebench_tpu.data_gen import wcsph

N_SIDE = 20  # 8000 particles, the reference 3D scale
STEPS = 120


def run(nl_skin_h):
    rng = np.random.default_rng(0)
    nl_fns, advance, dt = wcsph.make_sph(
        1.0 / N_SIDE, [1.0] * 3, visc=0.01, nl_skin_h=nl_skin_h
    )
    r, v = wcsph.tgv_initial_state(N_SIDE, rng, dim=3)
    import jax.numpy as jnp

    r, v = jnp.asarray(r, jnp.float32), jnp.asarray(v, jnp.float32)
    nbrs = nl_fns.allocate(r)
    # warm up / compile
    r1, v1, nbrs1 = advance(r, v, nbrs, STEPS)
    jax.block_until_ready(r1)
    t0 = time.perf_counter()
    r2, v2, nbrs2 = advance(r1, v1, nbrs1, STEPS)
    jax.block_until_ready(r2)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    ke = float((0.5 * (v2**2).sum(-1).mean()))
    print(
        f"skin={nl_skin_h:.2f}h K_cap={nbrs2.idx.shape[1]} "
        f"ms/substep={ms:.2f} KE@{2 * STEPS}={ke:.6e} "
        f"overflow={bool(nbrs2.did_buffer_overflow)}",
        flush=True,
    )
    return ms, ke


if __name__ == "__main__":
    base_ms, base_ke = run(0.0)
    for s in (0.25, 0.5, 1.0):
        ms, ke = run(s)
        print(
            f"  -> speedup vs skin=0: {base_ms / ms:.2f}x, "
            f"KE rel diff {abs(ke - base_ke) / base_ke:.2e}",
            flush=True,
        )
