"""Trace one bench rollout and aggregate device-op durations."""
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

from bench import run_bench  # compiles everything once


def main():
    import time
    from __graft_entry__ import _grid_positions, _make_case_and_model

    n, dim, isl, n_steps = 8000, 3, 6, 20
    case, metadata, init_fn, apply_fn = _make_case_and_model(
        n, dim=dim, isl=isl, backend="pallas", nl_format="dense",
        compute_dtype="bfloat16", use_fused_processor=True,
    )
    pos = _grid_positions(n, dim, 1.0, isl)
    ptype = np.zeros(n, dtype=np.int32)
    features, neighbors = case.allocate_eval((pos[:, :isl], ptype))
    params, state = init_fn(jax.random.PRNGKey(0), (features, ptype))

    def one_step(params_, cur, ptype_, nbrs):
        f, nbrs = case.preprocess_eval((cur, ptype_), nbrs)
        out, _ = apply_fn(params_, {}, (f, ptype_))
        nxt = case.integrate(out, cur)
        cur = jnp.concatenate([cur[:, 1:], nxt[:, None]], axis=1)
        return cur, nbrs

    @jax.jit
    def rollout(params_, current, ptype_, nbrs):
        def step_fn(carry, _):
            cur, nbrs = carry
            cur, nbrs = one_step(params_, cur, ptype_, nbrs)
            return (cur, nbrs), None
        (cur, nbrs), _ = jax.lax.scan(step_fn, (current, nbrs), None, length=n_steps)
        return cur, nbrs

    current = jnp.asarray(pos[:, :isl], jnp.float32)
    ptype_j = jnp.asarray(ptype)
    out = rollout(params, current, ptype_j, neighbors)
    jax.block_until_ready(out)

    trace_dir = "/tmp/bench_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    out = rollout(params, current, ptype_j, neighbors)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for fn in files:
        with gzip.open(fn, "rt") as f:
            data = json.load(f)
        # find device pids (TensorCore)
        dev_pids = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = ev.get("args", {}).get("name", "")
                if "TPU" in nm or "Chip" in nm or "Core" in nm or "vm.trace" in nm or "device" in nm.lower():
                    dev_pids.add(ev["pid"])
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                name = ev.get("name", "?")
                dur = ev.get("dur", 0) / 1e3  # ms
                agg[name] += dur
                cnt[name] += 1
                total += dur
    print(f"total device time: {total:.3f} ms over {n_steps} steps "
          f"({total/n_steps:.3f} ms/step)", flush=True)
    items = sorted(agg.items(), key=lambda kv: -kv[1])[:35]
    for name, ms in items:
        print(f"{ms:8.3f} ms  x{cnt[name]:<5} {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
