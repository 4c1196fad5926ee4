"""Fused PaiNN message block as one Pallas TPU kernel (dense edge layout).

The PaiNN interaction's edge-level work is parameter-free elementwise math
plus masked in-row sums (models/painn.py dense path): with H=128 channels
it decomposes into ~20 small XLA ops per layer, and at LagrangeBench's 2D
scales (3.2k particles) the model is DISPATCH-bound (~28 us per kernel
launch on the remote-compiled runtime; measured device busy-time is under
half the wall time). One launch per layer computes, per receiver tile:

    msg  = W_ij * x_gathered          (filters pre-masked: padded slots 0)
    ds   = sum_K msg[:H]
    dv_d = sum_K (-dir_d * msg[H:2H] + v_gathered_d * msg[2H:3H])

``painn_message_reference`` is the pure-jax mirror (identical math, used
off-TPU and as the rematerialized backward of the custom VJP).

Layout notes: the gathered tensor packs [x (3H), v (dim*H)] — one wide
row gather in XLA (gathers are row-count-bound; width is nearly free) —
and the vector state stays per-axis 2D throughout ((t, K) direction
slices, (t, H) accumulators), so every block is lane-packed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mp import _mirror_precision, _pick_tile


def painn_message_reference(
    g: jnp.ndarray,        # (N, K, 3H + dim*H) packed gather [x, v]
    wij: jnp.ndarray,      # (N, K, 3H) filters, pre-masked
    neg_dir: jnp.ndarray,  # (N, K, dim) receiver->sender direction
    h: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-jax mirror; returns (ds (N, H), dv (N, dim*H)) in float32."""
    f32 = jnp.float32
    dim = neg_dir.shape[-1]
    msg = wij.astype(f32) * g[..., : 3 * h].astype(f32)
    ds = jnp.sum(msg[..., :h], axis=1)
    msg1 = msg[..., h: 2 * h]
    msg2 = msg[..., 2 * h: 3 * h]
    dvs = []
    for d in range(dim):
        vg = g[..., (3 + d) * h: (4 + d) * h].astype(f32)
        nd = neg_dir[..., d: d + 1].astype(f32)
        dvs.append(jnp.sum(nd * msg1 + vg * msg2, axis=1))
    return ds, jnp.concatenate(dvs, axis=-1)


def _msg_kernel(g_ref, wij_ref, nd_ref, ds_ref, dv_ref, *, h: int, dim: int):
    f32 = jnp.float32
    msg = wij_ref[...].astype(f32) * g_ref[..., : 3 * h].astype(f32)
    ds_ref[...] = jnp.sum(msg[..., :h], axis=1).astype(ds_ref.dtype)
    msg1 = msg[..., h: 2 * h]
    msg2 = msg[..., 2 * h: 3 * h]
    for d in range(dim):
        vg = g_ref[..., (3 + d) * h: (4 + d) * h].astype(f32)
        nd = nd_ref[..., d: d + 1].astype(f32)
        dv_d = jnp.sum(nd * msg1 + vg * msg2, axis=1)
        dv_ref[..., d * h: (d + 1) * h] = dv_d.astype(dv_ref.dtype)


def painn_message(
    g: jnp.ndarray,
    wij: jnp.ndarray,
    neg_dir: jnp.ndarray,
    h: int,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused PaiNN edge message + aggregation (differentiable).

    Off-TPU the mirror runs directly; on TPU the Pallas kernel runs forward
    and the custom VJP rematerializes the (elementwise) backward through
    the mirror.
    """
    if interpret is None:
        if jax.default_backend() != "tpu":
            return painn_message_reference(g, wij, neg_dir, h)
        interpret = False
    return _painn_message_vjp(g, wij, neg_dir, h, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _painn_message_vjp(g, wij, neg_dir, h, interpret):
    return _painn_message_pallas(g, wij, neg_dir, h, interpret)


def _painn_message_vjp_fwd(g, wij, neg_dir, h, interpret):
    out = _painn_message_pallas(g, wij, neg_dir, h, interpret)
    return out, (g, wij, neg_dir)


def _painn_message_vjp_bwd(h, interpret, residuals, cotangents):
    g, wij, neg_dir = residuals
    _, vjp = jax.vjp(
        lambda g_, w_, n_: painn_message_reference(g_, w_, n_, h),
        g, wij, neg_dir,
    )
    return vjp(cotangents)


_painn_message_vjp.defvjp(_painn_message_vjp_fwd, _painn_message_vjp_bwd)


def _painn_message_pallas(g, wij, neg_dir, h, interpret):
    n, k, gw = g.shape
    dim = neg_dir.shape[-1]
    # VMEM scales with K * (packed width) — budget in K-rows like the MP
    # kernel, corrected for the wider (3H + dim*H vs H) rows — BUT the
    # measured admissibility boundary is also tile-absolute: at h=128 the
    # compile probe OOMs at tile 128 for (n=2560, k=16: 16.38M) and even
    # (n=3200, k=12: 18.38M — cost is NOT row-proportional), while
    # tile<=96 passes everywhere probed up to n=8000 / k=24. Hence the
    # 96-row hard cap plus a 3072 eff-row budget (k=24 -> 64, probed ok).
    tile = _pick_tile(n, k * max(1, gw // 256), 96, row_budget=3072,
                      hard_cap=96)
    n_pad = -n % tile
    if n_pad:
        pad3 = ((0, n_pad), (0, 0), (0, 0))
        g = jnp.pad(g, pad3)
        wij = jnp.pad(wij, pad3)
        neg_dir = jnp.pad(neg_dir, pad3)
    n_tiles = (n + n_pad) // tile

    def spec3(width):
        return pl.BlockSpec(
            (tile, k, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def spec2(width):
        return pl.BlockSpec(
            (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    ds, dv = pl.pallas_call(
        partial(_msg_kernel, h=h, dim=dim),
        grid=(n_tiles,),
        in_specs=[spec3(gw), spec3(3 * h), spec3(dim)],
        out_specs=[spec2(h), spec2(dim * h)],
        out_shape=[
            jax.ShapeDtypeStruct((n + n_pad, h), jnp.float32),
            jax.ShapeDtypeStruct((n + n_pad, dim * h), jnp.float32),
        ],
        interpret=interpret,
    )(g, wij, neg_dir)

    if n_pad:
        ds = ds[:n]
        dv = dv[:n]
    return ds, dv


# ---------------------------------------------------------------------------
# full fused layer: message + aggregation + vector-mix + mixing context net
# ---------------------------------------------------------------------------
#
# The PaiNN model is dispatch-bound at LagrangeBench scales (~0.7 ms/layer
# of mostly launch overhead). This kernel runs everything after the
# interaction context-net (which must stay node-level in XLA: the edge
# gather needs sender x) in ONE launch per layer: the edge message block,
# the clipped residual adds, the per-axis vector-mixing matmul, the norm
# gate, the mixing context net and the final updates. Parameters arrive as
# flat arrays (the model's fused variant declares them raw; convert a
# standard tree with models.painn.painn_fused_params_from_standard).

LAYER_PARAM_NAMES = ("filt_w", "filt_b", "vmix_w", "mix_w1", "mix_b1",
                     "mix_w2", "mix_b2")


def painn_layer_reference(g, phi, neg_dir, s, v_flat, p, eps: float = 1e-8):
    """Pure-jax mirror of the fused layer.

    Arguments (dense edge layout; R radial-basis channels):
        g: (N, K, (2 + dim) * H) packed sender gather [x1, x2, u] where
            x1/x2 are the first two thirds of the interaction context and
            u_d = v_d * x3 is the third pre-multiplied into the vector
            state at NODE level (narrower gather than shipping x3 and v
            separately).
        phi: (N, K, R + 1) — raw radial-basis values with the per-edge
            scale (cosine cutoff x padding mask) in the LAST column. The
            filter matmul W_ij = (phi @ filt_w + filt_b) * scale runs
            inside the kernel: 20-wide basis reads replace the 3H-wide
            materialized filter tensor (reference painn.py:231-243 builds
            the full (E, 3H) filters in XLA).
        neg_dir: (N, K, dim) receiver->sender direction.
        s, v_flat: (N, H), (N, dim*H) node state.
        p: LAYER_PARAM_NAMES flat dict.
    """
    cdt = s.dtype
    # accumulate at >= f32; f64 inputs keep f64 (parity-mode exactness)
    f32 = jnp.float64 if cdt == jnp.float64 else jnp.float32
    h = s.shape[-1]
    dim = neg_dir.shape[-1]
    r = phi.shape[-1] - 1
    prec = _mirror_precision(cdt)

    wij = jnp.dot(phi[..., :r].astype(cdt), p["filt_w"].astype(cdt),
                  preferred_element_type=f32, precision=prec)
    wij = (wij + p["filt_b"].astype(f32)) * phi[..., r:].astype(f32)

    ds = jnp.sum(wij[..., :h] * g[..., :h].astype(f32), axis=1)
    msg1 = wij[..., h: 2 * h] * g[..., h: 2 * h].astype(f32)
    w3 = wij[..., 2 * h:]
    s1 = (s.astype(f32) + jnp.clip(ds, -1e2, 1e2)).astype(cdt)

    vls, vrs, v1s = [], [], []
    for d in range(dim):
        u_d = g[..., (2 + d) * h: (3 + d) * h].astype(f32)
        nd = neg_dir[..., d: d + 1].astype(f32)
        dv_d = jnp.sum(nd * msg1 + w3 * u_d, axis=1)
        v1_d = (
            v_flat[..., d * h:(d + 1) * h].astype(f32)
            + jnp.clip(dv_d, -1e2, 1e2)
        ).astype(cdt)
        v1s.append(v1_d)
        vm = jnp.dot(v1_d, p["vmix_w"].astype(cdt),
                     preferred_element_type=f32, precision=prec)
        vls.append(vm[..., :h])
        vrs.append(vm[..., h:])

    v_norm = jnp.sqrt(sum(vr * vr for vr in vrs) + eps)
    ts = jnp.concatenate([s1.astype(f32), v_norm], axis=-1).astype(cdt)
    z = jnp.dot(ts, p["mix_w1"].astype(cdt), preferred_element_type=f32,
                precision=prec)
    z = z + p["mix_b1"].astype(f32)
    z = (z * jax.nn.sigmoid(z)).astype(cdt)  # silu
    m = jnp.dot(z, p["mix_w2"].astype(cdt), preferred_element_type=f32,
                precision=prec)
    m = m + p["mix_b2"].astype(f32)
    ds2 = m[..., :h]
    dv2 = m[..., h:2 * h]
    dsv = m[..., 2 * h:] * sum(vr * vl for vr, vl in zip(vrs, vls))
    s_out = (s1.astype(f32) + jnp.clip(ds2 + dsv, -1e2, 1e2)).astype(cdt)
    v_out = jnp.concatenate(
        [
            (v1s[d].astype(f32)
             + jnp.clip(vls[d] * dv2, -1e2, 1e2)).astype(cdt)
            for d in range(dim)
        ],
        axis=-1,
    )
    return s_out, v_out


def _layer_kernel(g_ref, phi_ref, nd_ref, s_ref, v_ref,
                  fw_ref, fb_ref, vmix_ref, mw1_ref, mb1_ref, mw2_ref,
                  mb2_ref, s_out_ref, v_out_ref, *, h: int, dim: int,
                  r: int, eps: float = 1e-8):
    f32 = jnp.float32
    cdt = s_ref.dtype
    t, k, _ = phi_ref.shape

    # ---- in-VMEM filters from the radial basis
    phi = phi_ref[..., :r].reshape(t * k, r).astype(cdt)
    scale = phi_ref[..., r:r + 1].astype(f32)  # (t, k, 1)
    wij = jnp.dot(phi, fw_ref[...], preferred_element_type=f32)
    wij = (wij + fb_ref[...].astype(f32)).reshape(t, k, 3 * h) * scale

    # ---- edge message + aggregation
    ds = jnp.sum(wij[..., :h] * g_ref[..., :h].astype(f32), axis=1)
    msg1 = wij[..., h: 2 * h] * g_ref[..., h: 2 * h].astype(f32)
    w3 = wij[..., 2 * h:]
    s1 = (s_ref[...].astype(f32) + jnp.clip(ds, -1e2, 1e2)).astype(cdt)

    vls, vrs, v1s = [], [], []
    for d in range(dim):
        u_d = g_ref[..., (2 + d) * h: (3 + d) * h].astype(f32)
        nd = nd_ref[..., d: d + 1].astype(f32)
        dv_d = jnp.sum(nd * msg1 + w3 * u_d, axis=1)
        v1_d = (
            v_ref[..., d * h:(d + 1) * h].astype(f32)
            + jnp.clip(dv_d, -1e2, 1e2)
        ).astype(cdt)
        v1s.append(v1_d)
        vm = jnp.dot(v1_d, vmix_ref[...], preferred_element_type=f32)
        vls.append(vm[..., :h])
        vrs.append(vm[..., h:])

    v_norm = jnp.sqrt(sum(vr * vr for vr in vrs) + eps)
    ts = jnp.concatenate([s1.astype(f32), v_norm], axis=-1).astype(cdt)
    z = jnp.dot(ts, mw1_ref[...], preferred_element_type=f32)
    z = z + mb1_ref[...].astype(f32)
    z = (z * jax.nn.sigmoid(z)).astype(cdt)
    m = jnp.dot(z, mw2_ref[...], preferred_element_type=f32)
    m = m + mb2_ref[...].astype(f32)
    ds2 = m[..., :h]
    dv2 = m[..., h:2 * h]
    dsv = m[..., 2 * h:] * sum(vr * vl for vr, vl in zip(vrs, vls))
    s_out_ref[...] = (
        s1.astype(f32) + jnp.clip(ds2 + dsv, -1e2, 1e2)
    ).astype(cdt)
    for d in range(dim):
        v_out_ref[..., d * h:(d + 1) * h] = (
            v1s[d].astype(f32) + jnp.clip(vls[d] * dv2, -1e2, 1e2)
        ).astype(cdt)


def painn_layer(g, phi, neg_dir, s, v_flat, p,
                interpret: Optional[bool] = None):
    """Run one fused PaiNN layer (differentiable; backward through the
    mirror). See :func:`painn_layer_reference` for the argument contract."""
    if interpret is None:
        if jax.default_backend() != "tpu":
            return painn_layer_reference(g, phi, neg_dir, s, v_flat, p)
        interpret = False
    return _painn_layer_vjp(g, phi, neg_dir, s, v_flat, p, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _painn_layer_vjp(g, phi, neg_dir, s, v_flat, p, interpret):
    return _painn_layer_pallas(g, phi, neg_dir, s, v_flat, p, interpret)


def _painn_layer_vjp_fwd(g, phi, neg_dir, s, v_flat, p, interpret):
    out = _painn_layer_pallas(g, phi, neg_dir, s, v_flat, p, interpret)
    return out, (g, phi, neg_dir, s, v_flat, p)


def _painn_layer_vjp_bwd(interpret, residuals, cotangents):
    g, phi, neg_dir, s, v_flat, p = residuals
    _, vjp = jax.vjp(
        lambda g_, ph_, n_, s_, v_, p_: painn_layer_reference(
            g_, ph_, n_, s_, v_, p_
        ),
        g, phi, neg_dir, s, v_flat, p,
    )
    return vjp(cotangents)


_painn_layer_vjp.defvjp(_painn_layer_vjp_fwd, _painn_layer_vjp_bwd)


def _painn_layer_pallas(g, phi, neg_dir, s, v_flat, p, interpret):
    n, k, gw = g.shape
    h = s.shape[-1]
    dim = neg_dir.shape[-1]
    r = phi.shape[-1] - 1
    cdt = s.dtype
    tile = _pick_tile(n, k * max(1, gw // 256), 128, row_budget=2400)
    n_pad = -n % tile
    if n_pad:
        pad3 = ((0, n_pad), (0, 0), (0, 0))
        pad2 = ((0, n_pad), (0, 0))
        g = jnp.pad(g, pad3)
        phi = jnp.pad(phi, pad3)
        neg_dir = jnp.pad(neg_dir, pad3)
        s = jnp.pad(s, pad2)
        v_flat = jnp.pad(v_flat, pad2)
    n_tiles = (n + n_pad) // tile

    def spec3(width):
        return pl.BlockSpec(
            (tile, k, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    def spec2(width):
        return pl.BlockSpec(
            (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def full_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    params = [
        p["filt_w"].astype(cdt),
        p["filt_b"].reshape(1, -1).astype(jnp.float32),
        p["vmix_w"].astype(cdt),
        p["mix_w1"].astype(cdt),
        p["mix_b1"].reshape(1, -1).astype(jnp.float32),
        p["mix_w2"].astype(cdt),
        p["mix_b2"].reshape(1, -1).astype(jnp.float32),
    ]
    s_out, v_out = pl.pallas_call(
        partial(_layer_kernel, h=h, dim=dim, r=r),
        grid=(n_tiles,),
        in_specs=[spec3(gw), spec3(r + 1), spec3(dim), spec2(h),
                  spec2(dim * h)]
        + [full_spec(q) for q in params],
        out_specs=[spec2(h), spec2(dim * h)],
        out_shape=[
            jax.ShapeDtypeStruct((n + n_pad, h), cdt),
            jax.ShapeDtypeStruct((n + n_pad, dim * h), cdt),
        ],
        interpret=interpret,
    )(g, phi, neg_dir, s, v_flat, *params)
    if n_pad:
        s_out = s_out[:n]
        v_out = v_out[:n]
    return s_out, v_out
