"""Scatter-plot one frame of a LagrangeBench h5 trajectory.

Counterpart of the reference's data_gen plotting helper. Usage:
    python scripts/plot_frame.py --file datasets/X/train.h5 --traj 0 --frame 0
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--file", required=True, help="path to a .h5 split file")
    p.add_argument("--traj", type=int, default=0)
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--out", default=None, help="output image path (png)")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with h5py.File(args.file, "r") as f:
        key = sorted(f.keys())[args.traj]
        pos = f[f"{key}/position"][args.frame]
        tag = f[f"{key}/particle_type"][:]

    fig = plt.figure(figsize=(6, 6))
    if pos.shape[1] == 3:
        ax = fig.add_subplot(projection="3d")
        ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c=tag, s=2, cmap="tab10")
    else:
        ax = fig.add_subplot()
        ax.scatter(pos[:, 0], pos[:, 1], c=tag, s=2, cmap="tab10")
        ax.set_aspect("equal")
    ax.set_title(f"traj {args.traj} frame {args.frame} (N={pos.shape[0]})")

    out = args.out or f"frame_{args.traj}_{args.frame}.png"
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
