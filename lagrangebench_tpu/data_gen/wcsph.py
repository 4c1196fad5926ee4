"""Weakly-compressible SPH solver on the framework's own primitives.

This is the in-repo dataset *generator*: the reference produced its seven
official datasets with jax-sph (reference data_gen/lagrangebench_data/
gen_dataset.py consumes jax-sph output directories); this module plays the
jax-sph role for self-contained dataset generation — the solver substrate
is the framework's own ``ops.neighbor_list`` / ``ops.periodic`` /
``ops.segment_sum``, so the generated physics exercises exactly the
machinery the learned models run on.

Scheme (textbook WCSPH, cf. Monaghan 2005):

* density by kernel summation (cubic spline),
* linear equation of state ``p = c0^2 (rho - rho0)``,
* symmetric pressure gradient ``-m (p_i/rho_i^2 + p_j/rho_j^2) grad W``,
* Morris viscosity,
* symplectic (semi-implicit) Euler integration,

with the whole inner loop a single ``lax.scan`` under ``jit`` — one device
dispatch per written frame.

Output layout matches what ``data_gen.jax_sph_converter`` consumes (the
jax-sph per-frame directory layout): ``<root>/<case>_<seed>/traj_NNNN.h5``
with ``r`` and ``tag`` datasets plus a ``config.yaml`` per trajectory.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import neighbor_list, periodic


def make_sph(
    dx: float,
    box: Sequence[float],
    rho0: float = 1.0,
    c0: float = 10.0,
    visc: float = 0.01,
    capacity_multiplier: float = 2.0,
    backend: str = "auto",
):
    """Build a WCSPH stepper for a fully periodic box.

    Returns ``(nl_fns, advance, dt)`` where ``advance(r, v, nbrs, steps)``
    runs ``steps`` solver substeps as one compiled ``lax.scan`` and ``dt``
    is the (CFL-limited) substep size ``0.2 h / c0``.

    The inner loop uses the DENSE (N, K) neighbor layout — the TPU fast
    path (scatter-free build and per-row aggregation; the sparse layout's
    edge-compaction sort costs ~17 ms/substep at 2.5k particles on a v5e
    vs ~1 ms dense). All pair terms are (N, K) elementwise ops + row
    sums: density by kernel summation (self-edge included ONCE — the
    neighbor list keeps self-edges), symmetric pressure gradient, Morris
    viscosity.
    """
    from ..defaults import resolve_backend

    dim = len(box)
    h = 1.5 * dx
    m = rho0 * dx**dim
    dt = 0.2 * h / c0
    disp, shift = periodic(jnp.asarray(box))
    nl_fns = neighbor_list(
        disp,
        box,
        2.0 * h,
        backend=resolve_backend(backend),
        capacity_multiplier=capacity_multiplier,
        format="dense",
        pbc=[True] * dim,
    )
    if dim == 2:
        sigma = 10.0 / (7.0 * np.pi * h * h)  # cubic spline, 2D
    elif dim == 3:
        sigma = 1.0 / (np.pi * h**3)  # cubic spline, 3D
    else:
        raise ValueError(f"dim must be 2 or 3, got {dim}")

    def kernel_w(q):
        return sigma * jnp.where(
            q < 1,
            1 - 1.5 * q**2 + 0.75 * q**3,
            jnp.where(q < 2, 0.25 * (2 - q) ** 3, 0.0),
        )

    def kernel_dw(q):
        return sigma * jnp.where(
            q < 1, -3 * q + 2.25 * q**2, jnp.where(q < 2, -0.75 * (2 - q) ** 2, 0.0)
        )

    box_j = jnp.asarray(box)

    def step(carry, _):
        r, v, nbrs = carry
        nbrs = nbrs.update(r)
        idx = nbrs.idx  # (N, K) senders per receiver, fill = N
        n = r.shape[0]
        mask = idx < n
        r_nb = jnp.concatenate([r, jnp.zeros((1, dim), r.dtype)])[idx]
        v_nb = jnp.concatenate([v, jnp.zeros((1, dim), v.dtype)])[idx]
        dr = r[:, None, :] - r_nb
        dr = dr - box_j * jnp.round(dr / box_j)  # min-image
        d = jnp.sqrt(jnp.sum(dr**2, -1) + 1e-16)
        q = d / h
        w = jnp.where(mask, kernel_w(q), 0.0)
        rho = m * jnp.sum(w, axis=1)  # (N,) self-edge included once
        p = c0**2 * (rho - rho0)  # linear EOS
        gradw = jnp.where(mask, kernel_dw(q) / (h * d), 0.0)[..., None] * dr
        pr = p / rho**2  # (N,)
        pr_nb = jnp.concatenate([pr, jnp.zeros((1,), pr.dtype)])[idx]
        pij = pr[:, None] + pr_nb  # (N, K)
        acc = -m * jnp.sum(pij[..., None] * gradw, axis=1)
        vij = v[:, None, :] - v_nb  # Morris viscosity
        lam = (2 * visc * m / rho0) * jnp.sum(dr * gradw, -1) / (
            d**2 + 0.01 * h * h
        )
        lam = jnp.where(mask, lam, 0.0)
        acc += jnp.sum(lam[..., None] * vij / rho0, axis=1)
        v2 = v + dt * acc
        r2 = jax.vmap(shift)(r, dt * v2)
        return (r2, v2, nbrs), None

    @partial(jax.jit, static_argnums=3)
    def advance(r, v, nbrs, steps):
        (r, v, nbrs), _ = jax.lax.scan(step, (r, v, nbrs), None, length=steps)
        return r, v, nbrs

    return nl_fns, advance, dt


def tgv_initial_state(n_side: int, rng: np.ndarray, jitter: float = 0.1, u0: float = 1.0):
    """Jittered particle lattice with the analytic 2D Taylor-Green field.

    The reference seeds each trajectory from a full SPH relaxation run; a
    jittered lattice is the cheap stand-in that still decorrelates
    trajectories (different seed -> different jitter realization).
    """
    dx = 1.0 / n_side
    xs = (np.arange(n_side) + 0.5) * dx
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    r = np.stack([X.ravel(), Y.ravel()], 1)
    r = np.mod(r + rng.normal(0, jitter * dx, r.shape), 1.0)
    v = u0 * np.stack(
        [
            np.sin(2 * np.pi * r[:, 0]) * np.cos(2 * np.pi * r[:, 1]),
            -np.cos(2 * np.pi * r[:, 0]) * np.sin(2 * np.pi * r[:, 1]),
        ],
        1,
    )
    return r, v


def generate_tgv_ensemble(
    root: str,
    n_side: int = 50,
    n_trajs: int = 70,
    n_frames: int = 126,
    write_every: int = 40,
    seed0: int = 100,
    rng_seed: int = 0,
    visc: float = 0.01,
    c0: float = 10.0,
    verbose: bool = True,
) -> List[str]:
    """Simulate a 2D Taylor-Green vortex ensemble to jax-sph layout.

    Defaults give ``n_side**2 = 2500`` particles (the reference 2D TGV
    scale, dataset ``2D_TGV_2500_10kevery100``) over ``n_frames`` written
    frames spaced ``write_every`` solver substeps apart (frame spacing
    ``write_every * 0.2 * 1.5 * dx / c0`` time units — the default is
    ~1.2 dx of travel at the initial peak speed, comparable to the
    reference's per-frame displacement scale).

    Returns the list of trajectory directories written.
    """
    import h5py
    import yaml

    dx, box = 1.0 / n_side, [1.0, 1.0]
    rng = np.random.default_rng(rng_seed)
    nl_fns, advance, dt = make_sph(dx, box, visc=visc, c0=c0)
    case_name = f"2D_TGV_{n_side * n_side}"

    dirs = []
    for i in range(n_trajs):
        d = os.path.join(root, f"{case_name}_{seed0 + i}")
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
        with open(os.path.join(d, "config.yaml"), "w") as f:
            yaml.safe_dump(
                {
                    "case": {
                        "name": "TGV",
                        "dx": dx,
                        "dim": 2,
                        "bounds": [[0.0, 1.0], [0.0, 1.0]],
                        "pbc": [True, True],
                        "viscosity": visc,
                    },
                    "solver": {"name": "WCSPH", "dt": float(dt), "c0": c0},
                    "io": {"write_every": write_every},
                },
                f,
            )

        r, v = tgv_initial_state(n_side, rng)
        tag = np.zeros(len(r), dtype=np.int32)  # all fluid
        r, v = jnp.asarray(r, jnp.float32), jnp.asarray(v, jnp.float32)
        nbrs = nl_fns.allocate(r)
        for k in range(n_frames):
            if k:
                r, v, nbrs = advance(r, v, nbrs, write_every)
            with h5py.File(os.path.join(d, f"traj_{k:04d}.h5"), "w") as f:
                f.create_dataset("r", data=np.asarray(r, np.float32))
                f.create_dataset("tag", data=tag)
        if bool(nbrs.did_buffer_overflow):
            raise RuntimeError(
                f"neighbor-list overflow in trajectory {i}; raise "
                f"capacity_multiplier in make_sph"
            )
        if verbose:
            ke = float(0.5 * jnp.mean(jnp.sum(v**2, -1)))
            print(
                f"[wcsph] traj {i + 1}/{n_trajs}: {n_frames} frames, "
                f"final mean KE {ke:.4e}",
                flush=True,
            )
    return dirs
