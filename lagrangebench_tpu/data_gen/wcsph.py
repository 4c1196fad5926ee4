"""Weakly-compressible SPH solver on the framework's own primitives.

This is the in-repo dataset *generator*: the reference produced its seven
official datasets with jax-sph (reference data_gen/lagrangebench_data/
gen_dataset.py consumes jax-sph output directories); this module plays the
jax-sph role for self-contained dataset generation — the solver substrate
is the framework's own ``ops.neighbor_list`` / ``ops.periodic`` /
``ops.segment_sum``, so the generated physics exercises exactly the
machinery the learned models run on.

Scheme (textbook WCSPH, cf. Monaghan 2005; Adami et al. 2012 for walls):

* density by kernel summation (cubic spline),
* linear equation of state ``p = c0^2 (rho - rho0)``,
* symmetric pressure gradient ``-m (p_i/rho_i^2 + p_j/rho_j^2) grad W``,
* Morris viscosity,
* static wall particles with Adami-style pressure extrapolation from
  their fluid neighbors (incl. the hydrostatic correction under gravity)
  and prescribed wall velocities in the viscous term (no-slip / moving
  lid),
* optional free-surface treatment (pressure clamped >= 0 so the
  density deficit at the surface does not produce tensile clumping),
* constant gravity and/or a per-particle body-force field (the RPF
  band-reversal force),

with the whole inner loop a single ``lax.scan`` under ``jit`` — one device
dispatch per written frame.

Cases provided (mirroring the reference's four dataset families,
reference lagrangebench/data/data.py:21-30):

* ``generate_tgv_ensemble`` — 2D/3D Taylor-Green vortex, fully periodic,
  unforced decay;
* ``generate_dam_ensemble`` — 2D dam break: free surface + gravity +
  static walls, non-periodic box;
* ``generate_rpf_trajectory`` — 2D reverse Poiseuille flow: fully
  periodic with a half-box band-reversal body force (the dataset dir
  additionally needs a ``force.py``, written by
  scripts/generate_sph_dataset.py);
* ``generate_ldc_trajectory`` — 2D lid-driven cavity: static walls +
  a moving-lid wall layer (MOVING_WALL tag), non-periodic box.

Output layout matches what ``data_gen.jax_sph_converter`` consumes (the
jax-sph per-frame directory layout): ``<root>/<case>_<seed>/traj_NNNN.h5``
with ``r`` and ``tag`` datasets plus a ``config.yaml`` per trajectory.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import free, neighbor_list, periodic

FLUID_TAG = 0
WALL_TAG = 1  # NodeType.SOLID_WALL
MOVING_WALL_TAG = 2  # NodeType.MOVING_WALL


def make_sph(
    dx: float,
    box: Sequence[float],
    rho0: float = 1.0,
    c0: float = 10.0,
    visc: float = 0.01,
    capacity_multiplier: float = 2.0,
    backend: str = "auto",
    pbc: Optional[Sequence[bool]] = None,
    g_ext: Optional[Sequence[float]] = None,
    force_fn: Optional[Callable] = None,
    wall_mask: Optional[np.ndarray] = None,
    free_surface: bool = False,
    nl_skin_h: float = 0.0,
    nl_every: Optional[int] = None,
):
    """Build a WCSPH stepper.

    Returns ``(nl_fns, advance, dt)`` where ``advance(r, v, nbrs, steps)``
    runs ``steps`` solver substeps as one compiled ``lax.scan`` and ``dt``
    is the (CFL-limited) substep size ``min(0.2 h / c0, 0.25 sqrt(h/|g|))``.

    The inner loop uses the DENSE (N, K) neighbor layout — the TPU fast
    path (scatter-free build and per-row aggregation; the sparse layout's
    edge-compaction sort costs ~17 ms/substep at 2.5k particles on a v5e
    vs ~1 ms dense). All pair terms are (N, K) elementwise ops + row
    sums: density by kernel summation (self-edge included ONCE — the
    neighbor list keeps self-edges), symmetric pressure gradient, Morris
    viscosity.

    Args:
        dx: particle spacing (smoothing length h = 1.5 dx, cutoff 2h).
        box: box side lengths; positions are expected in [0, box) for
            periodic dims and may slightly exceed the box in free dims
            (the cell grid clips them into edge cells).
        pbc: per-dim periodic flags; default all-periodic (the original
            TGV behavior). Non-periodic dims skip the min-image fold and
            the shift function is free (no wrapping).
        g_ext: constant body acceleration (e.g. ``[0, -1]`` gravity).
        force_fn: per-particle body acceleration ``r (dim,) -> (dim,)``
            evaluated at current positions (vmapped) — the same signature
            as a dataset ``force.py``'s ``force_fn``.
        wall_mask: static (N,) bool marking wall particles. Walls never
            integrate; their pressure/density is extrapolated from fluid
            neighbors (Adami et al. 2012 generalized wall BC) and their
            velocity entries in ``v`` act as the prescribed wall velocity
            in the viscous term (zeros = no-slip, a lid velocity = moving
            wall).
        free_surface: clamp fluid pressure to >= 0 (standard WCSPH
            free-surface treatment: the summation-density deficit at the
            surface would otherwise produce tensile attraction).
        nl_skin_h: Verlet-skin width as a multiple of h. The neighbor
            list is built with cutoff ``2h + skin`` and only rebuilt
            every ``nl_every`` substeps; every pair term already
            vanishes for q >= 2 (cubic spline support), so the extra
            skin neighbors contribute exactly zero and the physics is
            unchanged as long as no pair approaches by more than the
            skin between rebuilds. 0 (default) keeps the original
            rebuild-every-substep behavior bit-for-bit.
        nl_every: rebuild period in substeps. Default (None) derives the
            largest safe period from the CFL bound: pair closing speed
            <= 2 u_max with u_max = c0/5 (WCSPH targets Mach <= 0.1, so
            c0/5 is a 2x margin), giving
            ``floor(skin / (2 u_max dt))``.
    """
    from ..defaults import resolve_backend

    dim = len(box)
    h = 1.5 * dx
    m = rho0 * dx**dim
    dt = 0.2 * h / c0
    if g_ext is not None:
        g_norm = float(np.linalg.norm(np.asarray(g_ext, np.float64)))
        if g_norm > 0:
            dt = min(dt, 0.25 * float(np.sqrt(h / g_norm)))
    if pbc is None:
        pbc = [True] * dim
    pbc = [bool(p) for p in pbc]
    if all(pbc):
        disp, shift = periodic(jnp.asarray(box))
    else:
        disp, shift = free()
    skin = float(nl_skin_h) * h
    if skin > 0 and nl_every is None:
        u_max = c0 / 5.0
        nl_every = max(1, int(skin / (2.0 * u_max * dt)))
    elif nl_every is None:
        nl_every = 1
    nl_fns = neighbor_list(
        disp,
        box,
        2.0 * h + skin,
        backend=resolve_backend(backend),
        capacity_multiplier=capacity_multiplier,
        format="dense",
        pbc=pbc,
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
    pbc_j = jnp.asarray(pbc, jnp.float32)  # min-image only on periodic dims
    wall = None if wall_mask is None else jnp.asarray(wall_mask, bool)
    g_vec = None if g_ext is None else jnp.asarray(g_ext)

    def _pad_gather(a, idx):
        """Gather rows of ``a`` by the (N, K) dense index, fill -> 0."""
        zero = jnp.zeros((1,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, zero])[idx]

    def step(carry, _):
        r, v, nbrs, k = carry
        if nl_every == 1:
            nbrs = nbrs.update(r)
        else:
            # Verlet list: rebuild only on the period boundary. lax.cond
            # executes one branch at runtime, so off-period substeps skip
            # the (dominant) celllist rebuild entirely.
            nbrs = jax.lax.cond(
                k % nl_every == 0, lambda n: n.update(r), lambda n: n, nbrs
            )
        idx = nbrs.idx  # (N, K) senders per receiver, fill = N
        n = r.shape[0]
        mask = idx < n
        r_nb = _pad_gather(r, idx)
        v_nb = _pad_gather(v, idx)
        dr = r[:, None, :] - r_nb
        if any(pbc):
            dr = dr - box_j * jnp.round(dr / box_j) * pbc_j  # min-image
        d = jnp.sqrt(jnp.sum(dr**2, -1) + 1e-16)
        q = d / h
        w = jnp.where(mask, kernel_w(q), 0.0)
        gradw = jnp.where(mask, kernel_dw(q) / (h * d), 0.0)[..., None] * dr
        rho_sum = m * jnp.sum(w, axis=1)  # (N,) self-edge included once

        if wall is None:
            rho = rho_sum
            p = c0**2 * (rho - rho0)  # linear EOS
            if free_surface:
                p = jnp.maximum(p, 0.0)
        else:
            p_f = c0**2 * (rho_sum - rho0)
            if free_surface:
                p_f = jnp.maximum(p_f, 0.0)
            # Adami wall BC: wall pressure from FLUID neighbors only,
            # p_w = (sum_f p_f W + g . sum_f rho_f r_wf W) / sum_f W,
            # with r_wf = r_f - r_w = -dr; density from the inverted EOS.
            fluid_nb = mask & ~_pad_gather(wall, idx)
            wf = jnp.where(fluid_nb, kernel_w(q), 0.0)
            sw = jnp.sum(wf, axis=1)
            p_num = jnp.sum(_pad_gather(jnp.where(wall, 0.0, p_f), idx) * wf, 1)
            if g_vec is not None:
                rho_f_nb = _pad_gather(jnp.where(wall, 0.0, rho_sum), idx)
                p_num = p_num + jnp.sum(
                    rho_f_nb * wf * jnp.sum((-dr) * g_vec, -1), axis=1
                )
            p_w = jnp.where(sw > 1e-12, p_num / jnp.maximum(sw, 1e-12), 0.0)
            p = jnp.where(wall, p_w, p_f)
            rho = jnp.where(wall, p_w / c0**2 + rho0, rho_sum)
            if free_surface:
                # keep the p/rho^2 division well-behaved for surface
                # particles whose summation density is deficient
                rho = jnp.maximum(rho, 0.5 * rho0)

        pr = p / rho**2  # (N,)
        pij = pr[:, None] + _pad_gather(pr, idx)  # (N, K)
        acc = -m * jnp.sum(pij[..., None] * gradw, axis=1)
        vij = v[:, None, :] - v_nb  # Morris viscosity
        lam = (2 * visc * m / rho0) * jnp.sum(dr * gradw, -1) / (
            d**2 + 0.01 * h * h
        )
        lam = jnp.where(mask, lam, 0.0)
        acc += jnp.sum(lam[..., None] * vij / rho0, axis=1)
        if g_vec is not None:
            acc = acc + g_vec
        if force_fn is not None:
            acc = acc + jax.vmap(force_fn)(r)
        v2 = v + dt * acc
        r2 = jax.vmap(shift)(r, dt * v2)
        if wall is not None:
            v2 = jnp.where(wall[:, None], v, v2)  # prescribed wall velocity
            r2 = jnp.where(wall[:, None], r, r2)  # walls never move
        return (r2, v2, nbrs, k + 1), None

    @partial(jax.jit, static_argnums=3)
    def advance(r, v, nbrs, steps):
        # k resets each call: the first substep of every advance() always
        # rebuilds, so staleness never crosses a frame-write boundary.
        (r, v, nbrs, _), _ = jax.lax.scan(
            step, (r, v, nbrs, jnp.int32(0)), None, length=steps
        )
        return r, v, nbrs

    return nl_fns, advance, dt


# -- initial states ----------------------------------------------------------


def tgv_initial_state(
    n_side: int, rng: np.ndarray, jitter: float = 0.1, u0: float = 1.0, dim: int = 2
):
    """Jittered particle lattice with the analytic Taylor-Green field.

    2D: the classic vortex array; 3D: the Taylor-Green initial condition
    ``u = sin x cos y cos z, v = -cos x sin y cos z, w = 0`` (divergence
    free) mapped onto the unit box. The reference seeds each trajectory
    from a full SPH relaxation run; a jittered lattice is the cheap
    stand-in that still decorrelates trajectories (different seed ->
    different jitter realization).
    """
    dx = 1.0 / n_side
    xs = (np.arange(n_side) + 0.5) * dx
    grids = np.meshgrid(*([xs] * dim), indexing="ij")
    r = np.stack([g.ravel() for g in grids], 1)
    r = np.mod(r + rng.normal(0, jitter * dx, r.shape), 1.0)
    t = 2 * np.pi * r
    if dim == 2:
        v = u0 * np.stack(
            [
                np.sin(t[:, 0]) * np.cos(t[:, 1]),
                -np.cos(t[:, 0]) * np.sin(t[:, 1]),
            ],
            1,
        )
    else:
        v = u0 * np.stack(
            [
                np.sin(t[:, 0]) * np.cos(t[:, 1]) * np.cos(t[:, 2]),
                -np.cos(t[:, 0]) * np.sin(t[:, 1]) * np.cos(t[:, 2]),
                np.zeros(len(r)),
            ],
            1,
        )
    return r, v


def _lattice(lo, hi, dx):
    """Centered lattice covering [lo, hi) per dim at spacing dx."""
    axes = [np.arange(lo_d + 0.5 * dx, hi_d, dx) for lo_d, hi_d in zip(lo, hi)]
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.ravel() for g in grids], 1)


def dam_initial_state(
    dx: float,
    rng,
    tank: Sequence[float] = (5.366, 2.0),
    column: Sequence[float] = (2.0, 1.0),
    n_layers: int = 3,
    jitter: float = 0.08,
):
    """2D dam break: water column against the left wall of a walled tank.

    Geometry follows the reference's DAM 2D case (tank 5.366 x 2.0 — the
    domain constants in the reference's wall-trimming masks,
    data_gen/lagrangebench_data/gen_dataset.py:129-143): a ``column``-sized
    water block in the lower-left corner, ``n_layers`` static wall layers
    on the bottom and both sides, open top. Everything is shifted so wall
    particles sit at positive coordinates; the sim box is
    ``[L + 2 o, H + o]`` with ``o = n_layers * dx``.

    Returns ``(r, v, tag, box, wall_mask)``.
    """
    L, H = float(tank[0]), float(tank[1])
    W, Hc = float(column[0]), float(column[1])
    o = n_layers * dx
    fluid = _lattice([o, o], [o + W, o + Hc], dx)
    fluid = fluid + rng.normal(0, jitter * dx, fluid.shape)
    bottom = _lattice([0.0, 0.0], [L + 2 * o, o], dx)
    left = _lattice([0.0, o], [o, H + o], dx)
    right = _lattice([L + o, o], [L + 2 * o, H + o], dx)
    walls = np.concatenate([bottom, left, right])
    r = np.concatenate([fluid, walls]).astype(np.float64)
    v = np.zeros_like(r)
    tag = np.concatenate(
        [
            np.full(len(fluid), FLUID_TAG, np.int32),
            np.full(len(walls), WALL_TAG, np.int32),
        ]
    )
    box = [L + 2 * o, H + o]
    return r, v, tag, box, tag != FLUID_TAG


def rpf_initial_state(
    dx: float, rng, box: Sequence[float] = (1.0, 2.0), jitter: float = 0.1
):
    """2D reverse Poiseuille flow: jittered lattice at rest, periodic box.

    The flow is driven by the band-reversal body force (``rpf_force_fn``);
    the reference's RPF datasets ship the same force as a ``force.py``
    next to the h5 splits (reference lagrangebench/data/data.py:87-101).
    """
    r = _lattice([0.0, 0.0], list(box), dx)
    r = np.mod(r + rng.normal(0, jitter * dx, r.shape), np.asarray(box))
    v = np.zeros_like(r)
    tag = np.full(len(r), FLUID_TAG, np.int32)
    return r, v, tag


def rpf_force_fn(r):
    """Band-reversal body force: +x below mid-channel, -x above."""
    return jnp.where(r[1] > 1.0, -1.0, 1.0) * jnp.array([1.0, 0.0])


RPF_FORCE_PY = '''"""External force for the reverse Poiseuille flow dataset."""

import jax.numpy as jnp


def force_fn(r):
    """Band-reversal body force: +x below mid-channel, -x above."""
    return jnp.where(r[1] > 1.0, -1.0, 1.0) * jnp.array([1.0, 0.0])
'''


def ldc_initial_state(
    dx: float,
    rng,
    cavity: Sequence[float] = (1.0, 1.0),
    n_layers: int = 3,
    u_lid: float = 1.0,
    jitter: float = 0.05,
):
    """2D lid-driven cavity: walled unit box, moving lid on top.

    The lid is a MOVING_WALL (tag 2) layer with prescribed velocity
    ``(u_lid, 0)`` entering the viscous interaction (the standard
    conveyor-belt treatment: lid particles never move but drag the fluid).

    Returns ``(r, v, tag, box, wall_mask)``.
    """
    Lx, Ly = float(cavity[0]), float(cavity[1])
    o = n_layers * dx
    fluid = _lattice([o, o], [o + Lx, o + Ly], dx)
    fluid = fluid + rng.normal(0, jitter * dx, fluid.shape)
    bottom = _lattice([0.0, 0.0], [Lx + 2 * o, o], dx)
    left = _lattice([0.0, o], [o, Ly + o], dx)
    right = _lattice([Lx + o, o], [Lx + 2 * o, Ly + o], dx)
    lid = _lattice([0.0, Ly + o], [Lx + 2 * o, Ly + 2 * o], dx)
    r = np.concatenate([fluid, bottom, left, right, lid]).astype(np.float64)
    v = np.zeros_like(r)
    v[-len(lid):, 0] = u_lid
    tag = np.concatenate(
        [
            np.full(len(fluid), FLUID_TAG, np.int32),
            np.full(len(bottom) + len(left) + len(right), WALL_TAG, np.int32),
            np.full(len(lid), MOVING_WALL_TAG, np.int32),
        ]
    )
    box = [Lx + 2 * o, Ly + 2 * o]
    return r, v, tag, box, tag != FLUID_TAG


# -- ensemble generators -----------------------------------------------------


def _write_traj_config(
    d: str,
    name: str,
    dx: float,
    dim: int,
    bounds,
    pbc,
    visc: float,
    dt: float,
    c0: float,
    write_every: int,
):
    import yaml

    with open(os.path.join(d, "config.yaml"), "w") as f:
        yaml.safe_dump(
            {
                "case": {
                    "name": name,
                    "dx": dx,
                    "dim": dim,
                    "bounds": [[0.0, float(b)] for b in bounds],
                    "pbc": [bool(p) for p in pbc],
                    "viscosity": visc,
                },
                "solver": {"name": "WCSPH", "dt": float(dt), "c0": c0},
                "io": {"write_every": write_every},
            },
            f,
        )


def _simulate_trajectory(
    d: str,
    r,
    v,
    tag: np.ndarray,
    nl_fns,
    advance,
    n_frames: int,
    write_every: int,
    warmup_steps: int = 0,
    first_frame_index: int = 0,
):
    """Run one trajectory, writing per-frame h5 files into ``d``."""
    import h5py

    r, v = jnp.asarray(r, jnp.float32), jnp.asarray(v, jnp.float32)
    nbrs = nl_fns.allocate(r)
    if warmup_steps:
        r, v, nbrs = advance(r, v, nbrs, warmup_steps)
    for k in range(n_frames):
        if k:
            r, v, nbrs = advance(r, v, nbrs, write_every)
        with h5py.File(
            os.path.join(d, f"traj_{first_frame_index + k:04d}.h5"), "w"
        ) as f:
            f.create_dataset("r", data=np.asarray(r, np.float32))
            f.create_dataset("tag", data=tag)
    if bool(nbrs.did_buffer_overflow):
        raise RuntimeError(
            f"neighbor-list overflow in {d}; raise capacity_multiplier"
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
    dim: int = 2,
    n_frames_last: Optional[int] = None,
    n_last: int = 0,
    nl_skin_h: float = 0.0,
    capacity_multiplier: float = 2.0,
    backend: str = "celllist",
    verbose: bool = True,
) -> List[str]:
    """Simulate a Taylor-Green vortex ensemble to jax-sph layout.

    2D defaults give ``n_side**2 = 2500`` particles (the reference 2D TGV
    scale, dataset ``2D_TGV_2500_10kevery100``) over ``n_frames`` written
    frames spaced ``write_every`` solver substeps apart (frame spacing
    ``write_every * 0.2 * 1.5 * dx / c0`` time units — the default is
    ~1.2 dx of travel at the initial peak speed, comparable to the
    reference's per-frame displacement scale). ``dim=3`` with
    ``n_side=20`` gives the reference 3D TGV scale (8000 particles,
    dataset ``3D_TGV_8000_10kevery100``).

    The LAST ``n_last`` trajectories are written with ``n_frames_last``
    frames instead — the converter assigns trailing seeds to the test
    split, so this produces long test trajectories for long-horizon
    rollouts while keeping train windows cheap.

    Returns the list of trajectory directories written.
    """
    dx, box = 1.0 / n_side, [1.0] * dim
    rng = np.random.default_rng(rng_seed)
    nl_fns, advance, dt = make_sph(
        dx, box, visc=visc, c0=c0, nl_skin_h=nl_skin_h,
        capacity_multiplier=capacity_multiplier, backend=backend,
    )
    case_name = f"{dim}D_TGV_{n_side ** dim}"

    dirs = []
    for i in range(n_trajs):
        d = os.path.join(root, f"{case_name}_{seed0 + i}")
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
        frames = (
            n_frames_last
            if (n_last and i >= n_trajs - n_last and n_frames_last)
            else n_frames
        )
        _write_traj_config(
            d, "TGV", dx, dim, box, [True] * dim, visc, dt, c0, write_every
        )
        r, v = tgv_initial_state(n_side, rng, dim=dim)
        tag = np.zeros(len(r), dtype=np.int32)  # all fluid
        r, v = _simulate_trajectory(
            d, r, v, tag, nl_fns, advance, frames, write_every
        )
        if verbose:
            ke = float(0.5 * jnp.mean(jnp.sum(v**2, -1)))
            print(
                f"[wcsph] traj {i + 1}/{n_trajs}: {frames} frames, "
                f"final mean KE {ke:.4e}",
                flush=True,
            )
    return dirs


def generate_dam_ensemble(
    root: str,
    dx: float = 0.025,
    n_trajs: int = 40,
    n_frames: int = 126,
    write_every: int = 50,
    seed0: int = 100,
    rng_seed: int = 0,
    visc: float = 0.01,
    c0: float = 15.0,
    g: float = 1.0,
    backend: str = "celllist",
    verbose: bool = True,
) -> List[str]:
    """Simulate a 2D dam-break ensemble to jax-sph layout.

    Scaled units: water column 2 x 1, tank 5.366 x 2 (the reference DAM
    2D geometry), gravity 1 downward, c0 ~ 10x the surge speed
    ``sqrt(2 g H_c)``. Each trajectory differs by the fluid lattice
    jitter realization; walls are identical (so every trajectory has the
    same particle count — required for the fixed-shape training path).
    """
    rng_master = np.random.default_rng(rng_seed)
    # geometry is seed-independent: build once to create the stepper
    r0, v0, tag, box, wall_mask = dam_initial_state(
        dx, np.random.default_rng(0)
    )
    nl_fns, advance, dt = make_sph(
        dx,
        box,
        visc=visc,
        c0=c0,
        pbc=[False, False],
        g_ext=[0.0, -g],
        wall_mask=wall_mask,
        free_surface=True,
        backend=backend,
    )
    case_name = f"2D_DAM_{len(r0)}"

    dirs = []
    for i in range(n_trajs):
        d = os.path.join(root, f"{case_name}_{seed0 + i}")
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
        _write_traj_config(
            d, "DAM", dx, 2, box, [False, False], visc, dt, c0, write_every
        )
        r, v, tag, _, _ = dam_initial_state(
            dx, np.random.default_rng(rng_master.integers(2**31))
        )
        r, v = _simulate_trajectory(
            d, r, v, tag, nl_fns, advance, n_frames, write_every
        )
        if verbose:
            vf = np.asarray(v)[~wall_mask]
            print(
                f"[wcsph] dam traj {i + 1}/{n_trajs}: {n_frames} frames, "
                f"final max |v| {np.abs(vf).max():.3f}",
                flush=True,
            )
    return dirs


def generate_rpf_trajectory(
    root: str,
    dx: float = 0.025,
    n_frames: int = 1260,
    write_every: int = 40,
    warmup_steps: int = 12000,
    seed: int = 100,
    rng_seed: int = 0,
    visc: float = 0.1,
    c0: float = 15.0,
    backend: str = "celllist",
    verbose: bool = True,
) -> List[str]:
    """Simulate one long 2D reverse-Poiseuille trajectory to jax-sph layout.

    RPF is statistically stationary (force balances viscosity), so the
    reference builds its RPF datasets from a single long trajectory,
    time-split into train/valid/test — the converter does the same for a
    one-directory source. ``warmup_steps`` solver substeps bring the flow
    from rest to the steady band profile before frame 0 (startup time
    constant (w/pi)^2/nu ~ 1 time unit at the defaults).

    Defaults give 3200 particles in the [1, 2] box — the reference RPF 2D
    scale (dataset ``2D_RPF_3200_20kevery100``).
    """
    box = [1.0, 2.0]
    rng = np.random.default_rng(rng_seed)
    r, v, tag = rpf_initial_state(dx, rng, box=box)
    nl_fns, advance, dt = make_sph(
        dx, box, visc=visc, c0=c0, pbc=[True, True], force_fn=rpf_force_fn,
        backend=backend,
    )
    case_name = f"2D_RPF_{len(r)}"
    d = os.path.join(root, f"{case_name}_{seed}")
    os.makedirs(d, exist_ok=True)
    _write_traj_config(
        d, "RPF", dx, 2, box, [True, True], visc, dt, c0, write_every
    )
    r, v = _simulate_trajectory(
        d, r, v, tag, nl_fns, advance, n_frames, write_every,
        warmup_steps=warmup_steps,
    )
    if verbose:
        print(
            f"[wcsph] rpf: {n_frames} frames after {warmup_steps} warmup "
            f"substeps, final max |v| {float(jnp.abs(v).max()):.3f}",
            flush=True,
        )
    return [d]


def generate_ldc_trajectory(
    root: str,
    dx: float = 1.0 / 46.0,
    n_frames: int = 1260,
    write_every: int = 40,
    warmup_steps: int = 12000,
    seed: int = 100,
    rng_seed: int = 0,
    visc: float = 0.01,
    c0: float = 10.0,
    u_lid: float = 1.0,
    backend: str = "celllist",
    verbose: bool = True,
) -> List[str]:
    """Simulate one long 2D lid-driven-cavity trajectory to jax-sph layout.

    Like RPF, LDC is statistically stationary; one long trajectory is
    time-split. Defaults give a unit cavity at Re = u_lid / visc = 100
    with ~2116 fluid particles — the reference LDC 2D scale (dataset
    ``2D_LDC_2708_10kevery100``).
    """
    rng = np.random.default_rng(rng_seed)
    r, v, tag, box, wall_mask = ldc_initial_state(dx, rng, u_lid=u_lid)
    nl_fns, advance, dt = make_sph(
        dx,
        box,
        visc=visc,
        c0=c0,
        pbc=[False, False],
        wall_mask=wall_mask,
        free_surface=True,
        backend=backend,
    )
    case_name = f"2D_LDC_{len(r)}"
    d = os.path.join(root, f"{case_name}_{seed}")
    os.makedirs(d, exist_ok=True)
    _write_traj_config(
        d, "LDC", dx, 2, box, [False, False], visc, dt, c0, write_every
    )
    r, v = _simulate_trajectory(
        d, r, v, tag, nl_fns, advance, n_frames, write_every,
        warmup_steps=warmup_steps,
    )
    if verbose:
        vf = np.asarray(v)[~wall_mask]
        print(
            f"[wcsph] ldc: {n_frames} frames after {warmup_steps} warmup "
            f"substeps, final max fluid |v| {np.abs(vf).max():.3f}",
            flush=True,
        )
    return [d]
