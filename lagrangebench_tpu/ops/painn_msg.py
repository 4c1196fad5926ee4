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

from .fused_mp import _pick_tile


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
    # VMEM scales with K * (packed width): budget in K-rows like the MP
    # kernel but corrected for the wider (3H + dim*H vs H) rows
    tile = _pick_tile(n, k * max(1, gw // 256), 128)
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
