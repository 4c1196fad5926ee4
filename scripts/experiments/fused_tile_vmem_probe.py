"""Probe: scoped-VMEM admissibility of the fused MP kernel vs (n, k, tile).

Round-4 crossover run found a real failure: GNS-10-128 at 150k particles
(celllist fallback, capacity-escalated K=36) dies in compilation with
"Scoped allocation with size 17.74M and limit 16.00M exceeded" on the
enc-variant fused MP kernel at the tile _pick_tile chose (row_budget 4400
-> tile 120). The budget was calibrated at K=24; this measures where the
real admissibility boundary is across (n, k, tile) so the rule can be
fixed from data instead of theory.

Run (TPU):  python scripts/experiments/fused_tile_vmem_probe.py
Compile-only (jit(...).lower().compile()); each point ~10-40 s.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from lagrangebench_tpu.ops import fused_mp


def try_point(n, k, tile, fe=4, f=128, enc=True):
    cdt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    p = fused_mp.init_step_params(key, f)
    enc_p = None
    if enc:
        enc_p = {
            "enc_w1": jnp.zeros((fe, f), cdt),
            "enc_b1": jnp.zeros((f,), jnp.float32),
            "enc_w2": jnp.zeros((f, f), cdt),
            "enc_b2": jnp.zeros((f,), jnp.float32),
            "enc_ln_scale": jnp.ones((f,), jnp.float32),
            "enc_ln_bias": jnp.zeros((f,), jnp.float32),
        }
        e = jax.ShapeDtypeStruct((n, k, fe), jnp.float32)
    else:
        e = jax.ShapeDtypeStruct((n, k, f), cdt)
    hs = jax.ShapeDtypeStruct((n, k, f), cdt)
    hr = jax.ShapeDtypeStruct((n, f), cdt)
    h = jax.ShapeDtypeStruct((n, f), cdt)
    mask = jax.ShapeDtypeStruct((n, k), jnp.float32)

    def fn(e, hs, hr, h, mask):
        return fused_mp._launch_fused(
            e, hs, hr, h, mask, p, enc_p, tile, False
        )

    try:
        jax.jit(fn).lower(e, hs, hr, h, mask).compile()
        return "ok"
    except Exception as exc:  # noqa: BLE001
        msg = str(exc)
        if "vmem" in msg.lower() or "Scoped allocation" in msg:
            # extract the reported size if present
            import re

            m = re.search(r"size ([0-9.]+)M", msg)
            return f"VMEM OOM ({m.group(1)}M)" if m else "VMEM OOM"
        return f"other error: {msg[:120]}"


def main():
    if jax.default_backend() != "tpu":
        print("needs a TPU")
        return
    # note: _launch_fused re-picks the tile through _pick_tile, so pass
    # tiles at/below the current cap to see what the picker WOULD get,
    # and bypass the picker by monkeypatching for the raw boundary
    orig = fused_mp._pick_tile
    fused_mp._pick_tile = lambda n, k, tile, row_budget=4800: tile
    try:
        for n, k, tiles in [
            (150000, 36, (120, 112, 104, 96, 80)),
            (150000, 24, (176, 160, 144)),
            (64000, 36, (120, 104, 96)),
            (64000, 24, (200, 176)),
            (8000, 24, (200,)),
        ]:
            for t in tiles:
                print(f"n={n:7d} k={k:2d} tile={t:3d}: "
                      f"{try_point(n, k, t)}", flush=True)
    finally:
        fused_mp._pick_tile = orig


if __name__ == "__main__":
    main()
