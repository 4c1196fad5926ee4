"""Fused GNS message-passing step as one Pallas TPU kernel.

One launch computes, per receiver tile, everything between two message
passing states (dense (N, K) edge layout):

    first    = e @ We + hs_proj[senders] + hr_proj (broadcast) + b1
    messages = LayerNorm(relu(first) @ W2 + b2)
    e'       = e + messages
    agg      = sum_K (messages * mask)
    h'       = h + LayerNorm(relu(h @ Wnh + agg @ Wna + bn1) @ Wn2 + bn2)

The sender projection is gathered OUTSIDE the kernel (one node-level matmul
+ one gather in XLA); everything edge-shaped stays in VMEM. This collapses
~15 XLA kernels per step into ~4, which matters doubly on runtimes with
high per-kernel launch overhead (measured ~28us/kernel here).

``gns_mp_step_reference`` is the pure-jax mirror used for parity tests and
as the non-TPU fallback; both consume the same flat parameter dict.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PARAM_NAMES = (
    "w_s", "w_r",  # node-level sender/receiver projections (applied outside)
    "w_e", "b1", "w2", "b2", "ln1_scale", "ln1_bias",
    "w_nh", "w_na", "bn1", "wn2", "bn2", "ln2_scale", "ln2_bias",
)


def _layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def gns_mp_step_reference(
    e: jnp.ndarray,  # (N, K, F) edge latents
    hs_gath: jnp.ndarray,  # (N, K, F) gathered sender projection
    hr_proj: jnp.ndarray,  # (N, F) receiver projection
    h: jnp.ndarray,  # (N, F) node latents
    mask: jnp.ndarray,  # (N, K) validity
    p: Dict[str, jnp.ndarray],
):
    """Pure-jax mirror of the fused kernel (same math, same params)."""
    f32 = jnp.float32
    first = (
        jnp.dot(e, p["w_e"].astype(e.dtype), preferred_element_type=f32)
        + hs_gath.astype(f32)
        + hr_proj.astype(f32)[:, None, :]
        + p["b1"]
    )
    x = jnp.maximum(first, 0.0)
    x = jnp.dot(x.astype(e.dtype), p["w2"].astype(e.dtype),
                preferred_element_type=f32) + p["b2"]
    messages = _layernorm(x, p["ln1_scale"], p["ln1_bias"])
    e_out = e.astype(f32) + messages

    agg = jnp.sum(messages * mask[..., None].astype(f32), axis=1)
    node_first = (
        jnp.dot(h, p["w_nh"].astype(h.dtype), preferred_element_type=f32)
        + jnp.dot(agg.astype(h.dtype), p["w_na"].astype(h.dtype),
                  preferred_element_type=f32)
        + p["bn1"]
    )
    y = jnp.maximum(node_first, 0.0)
    y = jnp.dot(y.astype(h.dtype), p["wn2"].astype(h.dtype),
                preferred_element_type=f32) + p["bn2"]
    h_out = h.astype(f32) + _layernorm(y, p["ln2_scale"], p["ln2_bias"])
    return e_out.astype(e.dtype), h_out.astype(h.dtype)


def _fused_kernel(
    e_ref, hs_ref, hr_ref, h_ref, mask_ref,
    w_e_ref, b1_ref, w2_ref, b2_ref, g1_ref, be1_ref,
    wnh_ref, wna_ref, bn1_ref, wn2_ref, bn2_ref, g2_ref, be2_ref,
    e_out_ref, h_out_ref,
):
    t, k, f = e_ref.shape
    f32 = jnp.float32
    cdt = e_ref.dtype

    e2 = e_ref[...].reshape(t * k, f)
    first = jnp.dot(e2, w_e_ref[...], preferred_element_type=f32)
    first += hs_ref[...].reshape(t * k, f).astype(f32)
    # receiver broadcast: repeat each row K times
    hr = hr_ref[...].astype(f32)  # (t, f)
    first = first.reshape(t, k, f) + hr[:, None, :] + b1_ref[...].astype(f32)

    x = jnp.maximum(first, 0.0).reshape(t * k, f).astype(cdt)
    x = jnp.dot(x, w2_ref[...], preferred_element_type=f32)
    x += b2_ref[...].astype(f32)
    messages = _layernorm(x, g1_ref[...].astype(f32), be1_ref[...].astype(f32))
    messages = messages.reshape(t, k, f)

    e_out_ref[...] = (e_ref[...].astype(f32) + messages).astype(cdt)

    m = mask_ref[...].astype(f32)  # (t, k)
    agg = jnp.sum(messages * m[..., None], axis=1)  # (t, f)

    node_first = jnp.dot(h_ref[...], wnh_ref[...], preferred_element_type=f32)
    node_first += jnp.dot(
        agg.astype(cdt), wna_ref[...], preferred_element_type=f32
    )
    node_first += bn1_ref[...].astype(f32)
    y = jnp.maximum(node_first, 0.0).astype(cdt)
    y = jnp.dot(y, wn2_ref[...], preferred_element_type=f32)
    y += bn2_ref[...].astype(f32)
    h_new = _layernorm(y, g2_ref[...].astype(f32), be2_ref[...].astype(f32))
    h_out_ref[...] = (h_ref[...].astype(f32) + h_new).astype(h_ref.dtype)


def gns_mp_step(
    e: jnp.ndarray,
    hs_gath: jnp.ndarray,
    hr_proj: jnp.ndarray,
    h: jnp.ndarray,
    mask: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    tile: int = 128,
    interpret: Optional[bool] = None,
):
    """Run the fused MP step (differentiable).

    Off-TPU the pure-jax mirror runs directly (natively differentiable). On
    TPU the Pallas kernel runs forward and a custom VJP rematerializes the
    backward through the mirror — so the fused processor is trainable, with
    the forward on the fast path.
    """
    if interpret is None:
        if jax.default_backend() != "tpu":
            return gns_mp_step_reference(e, hs_gath, hr_proj, h, mask, p)
        interpret = False
    mask = mask.astype(jnp.float32)  # custom_vjp needs float cotangents
    return _gns_mp_step_vjp(e, hs_gath, hr_proj, h, mask, p, tile, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _gns_mp_step_vjp(e, hs_gath, hr_proj, h, mask, p, tile, interpret):
    return _gns_mp_step_pallas(e, hs_gath, hr_proj, h, mask, p, tile, interpret)


def _gns_mp_step_vjp_fwd(e, hs_gath, hr_proj, h, mask, p, tile, interpret):
    out = _gns_mp_step_pallas(e, hs_gath, hr_proj, h, mask, p, tile, interpret)
    return out, (e, hs_gath, hr_proj, h, mask, p)


def _gns_mp_step_vjp_bwd(tile, interpret, residuals, cotangents):
    e, hs_gath, hr_proj, h, mask, p = residuals
    _, vjp = jax.vjp(
        lambda e_, hs_, hr_, h_, p_: gns_mp_step_reference(
            e_, hs_, hr_, h_, mask, p_
        ),
        e, hs_gath, hr_proj, h, p,
    )
    de, dhs, dhr, dh, dp = vjp(cotangents)
    return de, dhs, dhr, dh, jnp.zeros_like(mask), dp


_gns_mp_step_vjp.defvjp(_gns_mp_step_vjp_fwd, _gns_mp_step_vjp_bwd)


def _gns_mp_step_pallas(e, hs_gath, hr_proj, h, mask, p, tile, interpret):
    """Forward Pallas launch (see module docstring for the math)."""
    n, k, f = e.shape
    tile = min(tile, n)
    if n % tile:
        # prefer a tile that divides N exactly: padding 5 input tensors
        # costs ~0.5 ms/step in pad kernels at bench scale
        for cand in range(min(tile * 2, 512), 7, -8):
            if n % cand == 0:
                tile = cand
                break
    n_pad = -n % tile
    if n_pad:
        pad3 = ((0, n_pad), (0, 0), (0, 0))
        pad2 = ((0, n_pad), (0, 0))
        e = jnp.pad(e, pad3)
        hs_gath = jnp.pad(hs_gath, pad3)
        hr_proj = jnp.pad(hr_proj, pad2)
        h = jnp.pad(h, pad2)
        mask = jnp.pad(mask, pad2)
    n_tiles = (n + n_pad) // tile

    cdt = e.dtype
    params = [
        p["w_e"].astype(cdt), p["b1"].reshape(1, f).astype(jnp.float32),
        p["w2"].astype(cdt), p["b2"].reshape(1, f).astype(jnp.float32),
        p["ln1_scale"].reshape(1, f).astype(jnp.float32),
        p["ln1_bias"].reshape(1, f).astype(jnp.float32),
        p["w_nh"].astype(cdt), p["w_na"].astype(cdt),
        p["bn1"].reshape(1, f).astype(jnp.float32),
        p["wn2"].astype(cdt), p["bn2"].reshape(1, f).astype(jnp.float32),
        p["ln2_scale"].reshape(1, f).astype(jnp.float32),
        p["ln2_bias"].reshape(1, f).astype(jnp.float32),
    ]

    tile_spec3 = pl.BlockSpec(
        (tile, k, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    tile_spec2 = pl.BlockSpec(
        (tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec(
        (tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def full_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    e_out, h_out = pl.pallas_call(
        _fused_kernel,
        grid=(n_tiles,),
        in_specs=[tile_spec3, tile_spec3, tile_spec2, tile_spec2, mask_spec]
        + [full_spec(q) for q in params],
        out_specs=[tile_spec3, tile_spec2],
        out_shape=[
            jax.ShapeDtypeStruct(e.shape, cdt),
            jax.ShapeDtypeStruct(h.shape, h.dtype),
        ],
        interpret=interpret,
    )(e, hs_gath, hr_proj, h, mask, *params)

    if n_pad:
        e_out = e_out[:n]
        h_out = h_out[:n]
    return e_out, h_out


def init_step_params(key, f: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """LeCun-normal initialized parameter dict for one fused MP step."""
    keys = jax.random.split(key, 7)
    init = jax.nn.initializers.lecun_normal()
    return {
        "w_s": init(keys[5], (f, f), dtype),
        "w_r": init(keys[6], (f, f), dtype),
        "w_e": init(keys[0], (f, f), dtype),
        "b1": jnp.zeros((f,), dtype),
        "w2": init(keys[1], (f, f), dtype),
        "b2": jnp.zeros((f,), dtype),
        "ln1_scale": jnp.ones((f,), dtype),
        "ln1_bias": jnp.zeros((f,), dtype),
        "w_nh": init(keys[2], (f, f), dtype),
        "w_na": init(keys[3], (f, f), dtype),
        "bn1": jnp.zeros((f,), dtype),
        "wn2": init(keys[4], (f, f), dtype),
        "bn2": jnp.zeros((f,), dtype),
        "ln2_scale": jnp.ones((f,), dtype),
        "ln2_bias": jnp.zeros((f,), dtype),
    }
