"""Trace the fused-PaiNN forward (3.2k/2D bench config) and aggregate
device-op durations, plus device busy-time vs wall."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
from bench_models import make_case  # noqa: E402

from __graft_entry__ import _grid_positions  # noqa: E402
from lagrangebench_tpu.models import setup_model  # noqa: E402


def main():
    n, dim, isl, mp, latent = 3200, 2, 6, 5, 128
    n_iter = 20
    case, metadata, cfg_model = make_case(
        n, dim, isl, True, "painn", mp, latent, "bfloat16"
    )
    cfg_model.fused_processor = True
    stats = {
        "velocity": {"mean": jnp.zeros(dim), "std": jnp.ones(dim)},
        "acceleration": {"mean": jnp.zeros(dim), "std": jnp.ones(dim)},
    }
    _, init, apply = setup_model(cfg_model, metadata, normalization_stats=stats)
    pos = _grid_positions(n, dim, 1.0, isl)
    ptype = np.zeros(n, dtype=np.int32)
    features, _ = case.allocate_eval((pos[:, :isl], ptype))
    params, state = init(jax.random.PRNGKey(0), (features, ptype))
    ptype_j = jnp.asarray(ptype)

    @jax.jit
    def loop(salt0):
        def body(salt, _):
            f = {**features, "vel_hist": features["vel_hist"] + salt}
            out, _ = apply(params, {}, (f, ptype_j))
            return salt + jnp.sum(out["acc"]) * 1e-30, None

        salt, _ = jax.lax.scan(body, salt0, None, length=n_iter)
        return salt

    jax.block_until_ready(loop(jnp.float32(0.0)))

    trace_dir = "/tmp/painn_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    jax.block_until_ready(loop(jnp.float32(1e-32)))
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for fn in files:
        with gzip.open(fn, "rt") as f:
            data = json.load(f)
        dev_pids = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = ev.get("args", {}).get("name", "")
                if ("TPU" in nm or "Chip" in nm or "Core" in nm
                        or "device" in nm.lower()):
                    dev_pids.add(ev["pid"])
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                name = ev.get("name", "?")
                dur = ev.get("dur", 0) / 1e3
                agg[name] += dur
                cnt[name] += 1
                total += dur
    print(f"total device time: {total:.3f} ms over {n_iter} iters "
          f"({total / n_iter:.3f} ms/iter)", flush=True)
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:8.3f} ms  x{cnt[name]:<5} {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
