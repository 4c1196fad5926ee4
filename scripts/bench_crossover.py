"""Single-chip crossover: XLA celllist fallback vs spatial slab pipeline.

Round-3 VERDICT weak #6: the 100k spatial row was only compared against the
64k celllist row. This measures BOTH paths at the same sizes so the
single-chip crossover (or its absence) is a table, not an extrapolation.

Usage (TPU):  python scripts/bench_crossover.py [sizes...]
Defaults: 64000 100000 150000. Writes BENCH_crossover.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def celllist_row(n: int) -> dict:
    from bench import run_bench

    r = run_bench(n_particles=n, backend="celllist", nl_multiplier=1.35)
    return {
        "path": "celllist",
        "n": n,
        "ms_per_step": r["detail"]["ms_per_rollout_step"],
        "particle_steps_per_sec": r["value"],
    }


def pallas_row(n: int) -> dict:
    """Pallas NL path at large N — the streamed scan kernel (stencil as a
    grid axis) keeps these sizes VMEM-admissible; before it, pallas fell
    back to celllist past ~27k particles (see the streamed-NL section of
    docs/performance.md)."""
    from bench import run_bench

    r = run_bench(n_particles=n, backend="pallas", nl_multiplier=1.35)
    return {
        "path": "pallas",
        "n": n,
        "ms_per_step": r["detail"]["ms_per_rollout_step"],
        "particle_steps_per_sec": r["value"],
    }


def spatial_row(n: int) -> dict:
    # run in a subprocess: the spatial pipeline builds its own mesh/state
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "bench_spatial.py"), str(n), "1", "20"],
        capture_output=True, text=True, timeout=1800,
    )
    ms = None
    for line in out.stdout.splitlines():
        if "rollout" in line and "ms/step" in line:
            # "rollout : <x> ms/step ..." format from bench_spatial
            toks = line.replace(":", " ").split()
            for i, t in enumerate(toks):
                if t == "ms/step" and i > 0:
                    ms = float(toks[i - 1])
    if ms is None:
        return {"path": "spatial", "n": n, "error": out.stdout[-500:]
                + out.stderr[-500:]}
    return {
        "path": "spatial",
        "n": n,
        "ms_per_step": ms,
        "particle_steps_per_sec": round(n / ms * 1e3, 1),
    }


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64000, 100000, 150000]
    # CROSSOVER_PATHS=pallas,celllist measures a subset (e.g. only the new
    # streamed-kernel rows) and merges into the existing table instead of
    # re-measuring rows that already have committed numbers.
    wanted = os.environ.get("CROSSOVER_PATHS", "pallas,celllist,spatial")
    wanted = {p.strip() for p in wanted.split(",") if p.strip()}
    fns = {"pallas": pallas_row, "celllist": celllist_row,
           "spatial": spatial_row}
    rows = []
    if os.path.exists("BENCH_crossover.json"):
        with open("BENCH_crossover.json") as f:
            rows = [r for r in json.load(f)
                    if not (r.get("path") in wanted and r.get("n") in sizes)]
    for n in sizes:
        for name in ("pallas", "celllist", "spatial"):
            if name not in wanted:
                continue
            try:
                row = fns[name](n)
            except Exception as e:  # noqa: BLE001 — record, keep measuring
                row = {"path": name, "n": n, "error": repr(e)[:500]}
            rows.append(row)
            print(json.dumps(row))
    rows.sort(key=lambda r: (r.get("n", 0), r.get("path", "")))
    with open("BENCH_crossover.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
