"""Generate a LagrangeBench-format SPH dataset end-to-end, in-repo.

Runs the framework's own WCSPH solver (``lagrangebench_tpu.data_gen.wcsph``)
over a 2D Taylor-Green vortex ensemble and converts the per-frame output
into ``train/valid/test.h5`` + ``metadata.json`` with
``lagrangebench_tpu.data_gen.jax_sph_converter`` — the same two-stage
pipeline the reference uses with jax-sph (reference
data_gen/lagrangebench_data/gen_dataset.py).

Defaults reproduce the reference 2D TGV scale: 2500 particles, 125-step
trajectories. Usage:

    python scripts/generate_sph_dataset.py \
        --sim_dir datasets/sims/2D_TGV_2500 \
        --dst_dir datasets/TGV_2500_gen \
        --n_trajs 70 --split 50_10_10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lagrangebench_tpu.data_gen.jax_sph_converter import convert_jax_sph_dir  # noqa: E402
from lagrangebench_tpu.data_gen.wcsph import generate_tgv_ensemble  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sim_dir", type=str, required=True,
                   help="scratch dir for per-frame solver output")
    p.add_argument("--dst_dir", type=str, required=True,
                   help="output dataset dir (train/valid/test.h5 + metadata)")
    p.add_argument("--n_side", type=int, default=50,
                   help="particles per side (n_side^2 total)")
    p.add_argument("--n_trajs", type=int, default=70)
    p.add_argument("--n_frames", type=int, default=126)
    p.add_argument("--write_every", type=int, default=40,
                   help="solver substeps per written frame")
    p.add_argument("--split", type=str, default="50_10_10")
    p.add_argument("--visc", type=float, default=0.01)
    p.add_argument("--rng_seed", type=int, default=0)
    p.add_argument("--skip_simulate", action="store_true",
                   help="reuse an existing --sim_dir, only convert")
    args = p.parse_args()

    if not args.skip_simulate:
        generate_tgv_ensemble(
            args.sim_dir,
            n_side=args.n_side,
            n_trajs=args.n_trajs,
            n_frames=args.n_frames,
            write_every=args.write_every,
            visc=args.visc,
            rng_seed=args.rng_seed,
        )
    convert_jax_sph_dir(args.sim_dir, args.dst_dir, split=args.split)
    print(f"dataset written to {args.dst_dir}")


if __name__ == "__main__":
    main()
