"""Generate a LagrangeBench-format SPH dataset end-to-end, in-repo.

Runs the framework's own WCSPH solver (``lagrangebench_tpu.data_gen.wcsph``)
over one of the reference's case families and converts the per-frame output
into ``train/valid/test.h5`` + ``metadata.json`` with
``lagrangebench_tpu.data_gen.jax_sph_converter`` — the same two-stage
pipeline the reference uses with jax-sph (reference
data_gen/lagrangebench_data/gen_dataset.py).

Cases (mirroring the reference dataset families, reference
lagrangebench/data/data.py:21-30):

* ``tgv2d`` — 2500 particles, periodic, unforced decay (default ensemble:
  70 trajectories, 126 frames);
* ``tgv3d`` — 8000 particles, periodic 3D; the last (test) trajectories
  are longer for long-horizon rollout evaluation;
* ``dam``  — 2D dam break: walls + gravity + free surface, non-periodic;
* ``rpf``  — 2D reverse Poiseuille flow: one long periodic trajectory
  driven by the band-reversal body force; the matching ``force.py`` is
  written next to the h5 splits (reference data.py:87-101 loads it);
* ``ldc``  — 2D lid-driven cavity: walls + moving lid, one long
  trajectory, non-periodic.

Usage:

    python scripts/generate_sph_dataset.py --case tgv2d \
        --sim_dir datasets/sims/2D_TGV_2500 \
        --dst_dir datasets/TGV_2500_gen --n_trajs 70
    python scripts/generate_sph_dataset.py --case dam \
        --sim_dir datasets/sims/2D_DAM --dst_dir datasets/DAM_2D_gen
    python scripts/generate_sph_dataset.py --case rpf \
        --sim_dir datasets/sims/2D_RPF --dst_dir datasets/RPF_2D_gen
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--platform" in sys.argv:
    # force the backend BEFORE first jax use; note the JAX_PLATFORMS env
    # var is not enough in images whose sitecustomize registers a TPU
    # plugin at interpreter startup
    import jax

    jax.config.update(
        "jax_platforms", sys.argv[sys.argv.index("--platform") + 1]
    )

from lagrangebench_tpu.data_gen.jax_sph_converter import convert_jax_sph_dir  # noqa: E402
from lagrangebench_tpu.data_gen import wcsph  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--case", type=str, default="tgv2d",
                   choices=["tgv2d", "tgv3d", "dam", "rpf", "ldc"])
    p.add_argument("--sim_dir", type=str, required=True,
                   help="scratch dir for per-frame solver output")
    p.add_argument("--dst_dir", type=str, required=True,
                   help="output dataset dir (train/valid/test.h5 + metadata)")
    p.add_argument("--n_side", type=int, default=None,
                   help="tgv: particles per side (n_side^dim total)")
    p.add_argument("--n_trajs", type=int, default=None)
    p.add_argument("--n_frames", type=int, default=None)
    p.add_argument("--n_frames_last", type=int, default=None,
                   help="tgv3d: frame count for the last --n_last "
                        "(test) trajectories")
    p.add_argument("--n_last", type=int, default=None)
    p.add_argument("--write_every", type=int, default=None,
                   help="solver substeps per written frame")
    p.add_argument("--warmup_steps", type=int, default=None,
                   help="rpf/ldc: substeps before frame 0")
    p.add_argument("--split", type=str, default=None)
    p.add_argument("--visc", type=float, default=None)
    p.add_argument("--rng_seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform override, e.g. 'cpu' to keep the "
                        "TPU free for a concurrent training run")
    p.add_argument("--skip_simulate", action="store_true",
                   help="reuse an existing --sim_dir, only convert")
    args = p.parse_args()

    def opts(**defaults):
        out = dict(defaults)
        for k in list(out):
            v = getattr(args, k, None)
            if v is not None:
                out[k] = v
        return out

    split = args.split
    if not args.skip_simulate:
        if args.case == "tgv2d":
            wcsph.generate_tgv_ensemble(
                args.sim_dir, dim=2,
                **opts(n_side=50, n_trajs=70, n_frames=126, write_every=40,
                       visc=0.01, rng_seed=0),
            )
            split = split or "50_10_10"
        elif args.case == "tgv3d":
            # 3D is the expensive case (K ~ 120 within the 3dx cutoff and
            # a celllist rebuild that the column-Pallas kernel cannot
            # admit at this box/cutoff ratio): a Verlet skin (rebuild
            # every 3 substeps) + tight capacity keep it ~1.5x faster,
            # and the ensemble is 20 trajectories (14/3/3 split) with the
            # last two test trajectories long for 400-step rollouts.
            # backend pinned: the fat SPH cutoff (3dx in a 6.7-cell box)
            # is outside the column-Pallas kernel's shape envelope; pinning
            # celllist avoids one failed ~40s pallas compile per-trajectory
            # allocation before the runtime VMEM fallback kicks in
            wcsph.generate_tgv_ensemble(
                args.sim_dir, dim=3, backend="celllist",
                nl_skin_h=0.25, capacity_multiplier=1.5,
                **opts(n_side=20, n_trajs=20, n_frames=126, write_every=40,
                       visc=0.01, rng_seed=0, n_frames_last=426, n_last=2),
            )
            split = split or "14_3_3"
        elif args.case == "dam":
            wcsph.generate_dam_ensemble(
                args.sim_dir,
                **opts(n_trajs=40, n_frames=126, write_every=50, visc=0.01,
                       rng_seed=0),
            )
            split = split or "28_6_6"
        elif args.case == "rpf":
            # c0 = 15 (Mach 0.078 at the ~1.2 terminal band speed; the
            # first c0=10 run sat at Mach ~0.12 and went NaN during
            # warmup on TPU) -> smaller CFL dt, so write_every/warmup
            # scale by 1.5x to keep the same physical frame spacing
            wcsph.generate_rpf_trajectory(
                args.sim_dir,
                **opts(n_frames=1260, write_every=60, warmup_steps=18000,
                       visc=0.1, rng_seed=0),
            )
            split = split or "80_10_10"
        elif args.case == "ldc":
            wcsph.generate_ldc_trajectory(
                args.sim_dir,
                **opts(n_frames=1260, write_every=40, warmup_steps=12000,
                       visc=0.01, rng_seed=0),
            )
            split = split or "80_10_10"

    convert_jax_sph_dir(
        args.sim_dir, args.dst_dir, split=split or "80_10_10", trim=False
    )
    if args.case == "rpf":
        force_path = os.path.join(args.dst_dir, "force.py")
        with open(force_path, "w") as f:
            f.write(wcsph.RPF_FORCE_PY)
        print(f"wrote {force_path}")
    print(f"dataset written to {args.dst_dir}")


if __name__ == "__main__":
    main()
