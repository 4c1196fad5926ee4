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

On the first MP step the edge-encoder MLP optionally folds into the same
launch (``enc``): it runs in VMEM on the raw (N, K, Fe) features, skipping
one full (N, K, F) HBM round trip. Two further folds were measured and
rejected — the kernel is critical-path-bound, and extra in-kernel stages
cost more than the XLA ops they replace:

* decoder fold into the last step: neutral-to-slightly-negative at both
  bench scales (the decoder's XLA cost is already small);
* edge-GEOMETRY fold (computing rel_disp/rel_dist from positions in VMEM):
  +0.13 ms at 8k/3D and +0.8 ms at 3.2k/2D — (t, K, dim) blocks lane-pad
  dim->128 in VMEM and the per-axis min-image arithmetic runs at ~2% lane
  utilization; XLA's fused gather+wrap chain (after the receiver-broadcast
  fix in case/features.py) is cheaper.

``gns_mp_step_reference`` is the pure-jax mirror used for parity tests and
as the non-TPU fallback; both consume the same flat parameter dicts.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PARAM_NAMES = (
    "w_s", "w_r",  # node-level sender/receiver projections (applied outside)
    "w_e", "b1", "w2", "b2", "ln1_scale", "ln1_bias",
    "w_nh", "w_na", "bn1", "wn2", "bn2", "ln2_scale", "ln2_bias",
)

ENC_PARAM_NAMES = ("enc_w1", "enc_b1", "enc_w2", "enc_b2",
                   "enc_ln_scale", "enc_ln_bias")


def _mirror_precision(cdt):
    """Matmul precision for the pure-jax mirrors (same rule as
    models.utils.matmul_precision, duplicated to avoid an import cycle):
    float32 parity mode must request "highest" or XLA's DEFAULT truncates
    the MXU operands to bfloat16 — which would make the custom-VJP
    backward rematerialize the edge encoder at lower precision than the
    fused forward kernel ran at."""
    return None if jnp.dtype(cdt) == jnp.bfloat16 else "highest"


def _layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def encode_edges_reference(raw: jnp.ndarray, enc: Dict[str, jnp.ndarray],
                           cdt) -> jnp.ndarray:
    """Edge-encoder MLP (2-layer + LayerNorm) on raw edge features.

    Mirror of the in-kernel edge encoder: e = LN(relu(raw@W1+b1)@W2+b2).
    """
    f32 = jnp.float64 if jnp.dtype(cdt) == jnp.float64 else jnp.float32
    prec = _mirror_precision(cdt)
    x = jnp.dot(raw.astype(cdt), enc["enc_w1"].astype(cdt),
                preferred_element_type=f32, precision=prec) + enc["enc_b1"]
    x = jnp.maximum(x, 0.0)
    x = jnp.dot(x.astype(cdt), enc["enc_w2"].astype(cdt),
                preferred_element_type=f32, precision=prec) + enc["enc_b2"]
    return _layernorm(x, enc["enc_ln_scale"], enc["enc_ln_bias"]).astype(cdt)


def gns_mp_step_reference(
    e: jnp.ndarray,  # (N, K, F) edge latents — or (N, K, Fe) raw if enc
    hs_gath: jnp.ndarray,  # (N, K, F) gathered sender projection
    hr_proj: jnp.ndarray,  # (N, F) receiver projection
    h: jnp.ndarray,  # (N, F) node latents
    mask: jnp.ndarray,  # (N, K) validity
    p: Dict[str, jnp.ndarray],
    enc: Optional[Dict[str, jnp.ndarray]] = None,
):
    """Pure-jax mirror of the fused kernel (same math, same params)."""
    if enc is not None:
        e = encode_edges_reference(e, enc, hs_gath.dtype)
    # accumulate in f64 when running the float64 parity mode (the kernel
    # itself is f32-accumulating; f64 runs only through this mirror)
    f32 = jnp.float64 if e.dtype == jnp.float64 else jnp.float32
    prec = _mirror_precision(e.dtype)
    first = (
        jnp.dot(e, p["w_e"].astype(e.dtype), preferred_element_type=f32,
                precision=prec)
        + hs_gath.astype(f32)
        + hr_proj.astype(f32)[:, None, :]
        + p["b1"]
    )
    x = jnp.maximum(first, 0.0)
    x = jnp.dot(x.astype(e.dtype), p["w2"].astype(e.dtype),
                preferred_element_type=f32, precision=prec) + p["b2"]
    messages = _layernorm(x, p["ln1_scale"], p["ln1_bias"])
    e_out = e.astype(f32) + messages

    agg = jnp.sum(messages * mask[..., None].astype(f32), axis=1)
    node_first = (
        jnp.dot(h, p["w_nh"].astype(h.dtype), preferred_element_type=f32,
                precision=prec)
        + jnp.dot(agg.astype(h.dtype), p["w_na"].astype(h.dtype),
                  preferred_element_type=f32, precision=prec)
        + p["bn1"]
    )
    y = jnp.maximum(node_first, 0.0)
    y = jnp.dot(y.astype(h.dtype), p["wn2"].astype(h.dtype),
                preferred_element_type=f32, precision=prec) + p["bn2"]
    h_out = h.astype(f32) + _layernorm(y, p["ln2_scale"], p["ln2_bias"])
    return e_out.astype(e.dtype), h_out.astype(h.dtype)


def _mp_math(
    e2, hs, hr_ref, h_ref, mask,
    w_e_ref, b1_ref, w2_ref, b2_ref, g1_ref, be1_ref,
    wnh_ref, wna_ref, bn1_ref, wn2_ref, bn2_ref, g2_ref, be2_ref,
    e_out_ref,
):
    """Shared MP-step body: ``e2`` is the (t*k, f) edge latent value (read
    from HBM or encoded in VMEM), ``hs`` the (t*k, f) float32 gathered
    sender projection, ``mask`` the (t, k) float32 validity; writes e_out,
    returns the h_out value."""
    t, k = mask.shape
    f = e2.shape[-1]
    f32 = jnp.float32
    cdt = e2.dtype

    first = jnp.dot(e2, w_e_ref[...], preferred_element_type=f32)
    first += hs
    # receiver broadcast: repeat each row K times
    hr = hr_ref[...].astype(f32)  # (t, f)
    first = first.reshape(t, k, f) + hr[:, None, :] + b1_ref[...].astype(f32)

    x = jnp.maximum(first, 0.0).reshape(t * k, f).astype(cdt)
    x = jnp.dot(x, w2_ref[...], preferred_element_type=f32)
    x += b2_ref[...].astype(f32)
    messages = _layernorm(x, g1_ref[...].astype(f32), be1_ref[...].astype(f32))
    messages = messages.reshape(t, k, f)

    e_out_ref[...] = (
        e2.reshape(t, k, f).astype(f32) + messages
    ).astype(cdt)

    agg = jnp.sum(messages * mask[..., None], axis=1)  # (t, f)

    node_first = jnp.dot(h_ref[...], wnh_ref[...], preferred_element_type=f32)
    node_first += jnp.dot(
        agg.astype(cdt), wna_ref[...], preferred_element_type=f32
    )
    node_first += bn1_ref[...].astype(f32)
    y = jnp.maximum(node_first, 0.0).astype(cdt)
    y = jnp.dot(y, wn2_ref[...], preferred_element_type=f32)
    y += bn2_ref[...].astype(f32)
    h_new = _layernorm(y, g2_ref[...].astype(f32), be2_ref[...].astype(f32))
    return (h_ref[...].astype(f32) + h_new).astype(h_ref.dtype)


def _make_fused_kernel(has_enc: bool):
    """Kernel factory: optional in-VMEM edge-encoder stage."""

    def kernel(*args):
        e_ref, hs_ref, hr_ref, h_ref, mask_ref = args[:5]
        i = 5
        if has_enc:
            ew1_ref, eb1_ref, ew2_ref, eb2_ref, eg_ref, ebe_ref = args[i:i + 6]
            i += 6
        p_refs = args[i:i + 13]
        i += 13
        e_out_ref, h_out_ref = args[i:i + 2]

        f32 = jnp.float32
        cdt = hs_ref.dtype
        t, k, _ = e_ref.shape

        if has_enc:
            fe = e_ref.shape[-1]
            raw2 = e_ref[...].reshape(t * k, fe).astype(cdt)
            x = jnp.dot(raw2, ew1_ref[...], preferred_element_type=f32)
            x += eb1_ref[...].astype(f32)
            x = jnp.maximum(x, 0.0).astype(cdt)
            x = jnp.dot(x, ew2_ref[...], preferred_element_type=f32)
            x += eb2_ref[...].astype(f32)
            e2 = _layernorm(
                x, eg_ref[...].astype(f32), ebe_ref[...].astype(f32)
            ).astype(cdt)
        else:
            f = e_ref.shape[-1]
            e2 = e_ref[...].reshape(t * k, f)

        fl = hs_ref.shape[-1]
        hs = hs_ref[...].reshape(t * k, fl).astype(f32)
        h_out_ref[...] = _mp_math(e2, hs, hr_ref, h_ref,
                                  mask_ref[...].astype(f32),
                                  *p_refs, e_out_ref)

    return kernel


def _pick_tile(n: int, k: int, tile: int, row_budget: int = 4800,
               affine_cap: bool = False,
               hard_cap: Optional[int] = None) -> int:
    """Receiver-tile size bounded by VMEM: tile*K edge rows per launch.

    ``row_budget`` is calibrated against the default 16 MiB scoped-VMEM
    limit (tile=200 x K=24 is the largest measured-good forward
    configuration on v5e) and scales linearly if the limit is raised —
    see ops.device. Prefers a tile that divides N exactly — padding 5
    input tensors costs ~0.5 ms/step at bench scale.

    ``affine_cap`` applies the measured enc-variant admissibility
    boundary (scripts/experiments/fused_tile_vmem_probe.py): the raw
    edge-feature buffer lane-pads fe->128 in f32, so per-row cost grows
    FASTER than 1/k and a pure row budget over-admits at large k —
    k=36 at the row-budget tile 120 compiles to 17.86M scoped VMEM
    (limit 16M). The affine fit tile <= 5184/k - 40 reproduces the
    probed boundary: k=24 -> 176 (ok; 200 OOMs at 64k+ rows),
    k=36 -> 104 (ok; 112 OOMs at 16.45M), k=48 -> 64 (80 measured ok,
    so conservative there).
    """
    from .device import scale_budget

    row_budget = scale_budget(row_budget)
    cap = max((row_budget // max(k, 1)) // 8 * 8, 8)
    if affine_cap:
        cap_a = int(scale_budget(5184) / max(k, 1)) - 40
        cap = max(min(cap, cap_a // 8 * 8), 8)
    if hard_cap is not None:
        # caller-measured absolute tile ceiling (kernels whose VMEM cost
        # is not row-proportional — see ops/painn_msg.py)
        cap = max(min(cap, hard_cap // 8 * 8), 8)
    # always take the largest in-budget divisor: fewer grid steps amortize
    # per-tile overheads (a smaller dividing tile is NOT preferred — at
    # 16k rows, tile 128 vs 200 costs ~1 ms/step across 10 MP launches)
    hi = min(max(tile * 2, 8), 512, cap, n)
    for cand in range(hi - hi % 8, 7, -8):
        if n % cand == 0:
            return cand
    return min(tile, n, cap)


def _row_params(p: Dict[str, jnp.ndarray], names, f: int, cdt):
    """Parameter arrays for the kernel: weights in compute dtype, vectors
    as (1, f) float32 rows."""
    out = []
    for name in names:
        arr = p[name]
        if arr.ndim == 2:
            out.append(arr.astype(cdt))
        else:
            out.append(arr.reshape(1, -1).astype(jnp.float32))
    return out


_MP_KERNEL_PARAMS = (
    "w_e", "b1", "w2", "b2", "ln1_scale", "ln1_bias",
    "w_nh", "w_na", "bn1", "wn2", "bn2", "ln2_scale", "ln2_bias",
)


def _launch_fused(e, hs_gath, hr_proj, h, mask, p, enc, tile, interpret):
    """Forward Pallas launch (see module docstring for the math)."""
    n, k, fe = e.shape
    f = hs_gath.shape[-1]
    cdt = hs_gath.dtype
    # the enc variant carries the raw-feature buffer + encoder
    # intermediates on top of the plain kernel's state: tile=200 x K=24
    # measures 16.27M scoped VMEM at 64k rows (0.27M over), so it gets a
    # smaller budget
    tile = _pick_tile(n, k, tile, row_budget=4400 if enc else 4800,
                      affine_cap=bool(enc))
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

    params = _row_params(p, _MP_KERNEL_PARAMS, f, cdt)
    enc_params = _row_params(enc, ENC_PARAM_NAMES, f, cdt) if enc else []

    in_tile_spec = pl.BlockSpec(
        (tile, k, fe), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
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
        _make_fused_kernel(bool(enc)),
        grid=(n_tiles,),
        in_specs=[in_tile_spec, tile_spec3, tile_spec2, tile_spec2, mask_spec]
        + [full_spec(q) for q in enc_params]
        + [full_spec(q) for q in params],
        out_specs=[tile_spec3, tile_spec2],
        out_shape=[
            jax.ShapeDtypeStruct((n + n_pad, k, f), cdt),
            jax.ShapeDtypeStruct(h.shape, h.dtype),
        ],
        interpret=interpret,
    )(e, hs_gath, hr_proj, h, mask, *enc_params, *params)

    if n_pad:
        e_out = e_out[:n]
        h_out = h_out[:n]
    return e_out, h_out


def gns_mp_step(
    e: jnp.ndarray,
    hs_gath: jnp.ndarray,
    hr_proj: jnp.ndarray,
    h: jnp.ndarray,
    mask: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    tile: int = 128,
    interpret: Optional[bool] = None,
    enc: Optional[Dict[str, jnp.ndarray]] = None,
):
    """Run the fused MP step (differentiable).

    Off-TPU the pure-jax mirror runs directly (natively differentiable). On
    TPU the Pallas kernel runs forward and a custom VJP runs the fused
    Pallas backward — so the fused processor is trainable, with the forward
    on the fast path.

    With ``enc`` (edge-encoder params, ``ENC_PARAM_NAMES``), ``e`` is the
    RAW (N, K, Fe) edge-feature tensor and the encoder MLP runs inside the
    kernel, skipping one full (N, K, F) HBM round trip per forward.
    """
    if interpret is None:
        if jax.default_backend() != "tpu":
            return gns_mp_step_reference(e, hs_gath, hr_proj, h, mask, p, enc)
        interpret = False
    mask = mask.astype(jnp.float32)  # custom_vjp needs float cotangents
    return _gns_mp_step_vjp(e, hs_gath, hr_proj, h, mask, p, enc, tile,
                            interpret)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _gns_mp_step_vjp(e, hs_gath, hr_proj, h, mask, p, enc, tile, interpret):
    return _launch_fused(e, hs_gath, hr_proj, h, mask, p, enc, tile,
                         interpret)


def _gns_mp_step_vjp_fwd(e, hs_gath, hr_proj, h, mask, p, enc, tile,
                         interpret):
    out = _launch_fused(e, hs_gath, hr_proj, h, mask, p, enc, tile,
                        interpret)
    return out, (e, hs_gath, hr_proj, h, mask, p, enc)


def _gns_mp_step_vjp_bwd(tile, interpret, residuals, cotangents):
    """Composed backward: the fused Pallas MP backward does the edge-shaped
    work; the optional encoder stage backprops through its cheap XLA
    mirror (one extra edge-MLP forward rematerializes the encoded e)."""
    e, hs_gath, hr_proj, h, mask, p, enc = residuals
    cdt = hs_gath.dtype
    denc = None
    if enc is not None:
        raw = e
        e, enc_vjp = jax.vjp(
            lambda r, en: encode_edges_reference(r, en, cdt), raw, enc
        )
    de, dhs, dhr, dh, dp = _gns_mp_step_bwd_pallas(
        e, hs_gath, hr_proj, h, mask, p, cotangents, interpret
    )
    if enc is not None:
        de, denc = enc_vjp(de.astype(e.dtype))
    return de, dhs, dhr, dh, jnp.zeros_like(mask), dp, denc


_gns_mp_step_vjp.defvjp(_gns_mp_step_vjp_fwd, _gns_mp_step_vjp_bwd)


# ---------------------------------------------------------------------------
# fused backward kernel
# ---------------------------------------------------------------------------

# weight-gradient output order of the backward kernel (all accumulated
# across receiver tiles in float32)
_BWD_PARAM_ORDER = (
    "w_e", "b1", "w2", "b2", "ln1_scale", "ln1_bias",
    "w_nh", "w_na", "bn1", "wn2", "bn2", "ln2_scale", "ln2_bias",
)


def _dot_t(a, b):
    """a @ b.T without materializing the transpose (contract on dim 1)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_g(a, b):
    """a.T @ b — weight-gradient contraction (contract on dim 0)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ln_bwd(dy, xhat, inv, scale):
    """LayerNorm input gradient given normalized activations."""
    dxhat = dy * scale
    mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return inv * (dxhat - mean1 - xhat * mean2)


def _fused_bwd_kernel(
    e_ref, hs_ref, hr_ref, h_ref, mask_ref, ge_ref, gh_ref,
    w_e_ref, b1_ref, w2_ref, b2_ref, g1_ref, be1_ref,
    wnh_ref, wna_ref, bn1_ref, wn2_ref, bn2_ref, g2_ref, be2_ref,
    de_ref, dhs_ref, dhr_ref, dh_ref,
    dw_e_ref, db1_ref, dw2_ref, db2_ref, dg1_ref, dbe1_ref,
    dwnh_ref, dwna_ref, dbn1_ref, dwn2_ref, dbn2_ref, dg2_ref, dbe2_ref,
):
    """One receiver tile of the fused-MP backward (forward rematerialized).

    The forward intermediates are recomputed in VMEM from the inputs (remat
    costs two extra edge matmuls but avoids spilling (t*k, f) float32
    activations to HBM); weight gradients accumulate across grid steps into
    constant-index float32 output blocks.
    """
    t, k, f = e_ref.shape
    f32 = jnp.float32
    cdt = e_ref.dtype
    eps = 1e-5

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in (
            dw_e_ref, db1_ref, dw2_ref, db2_ref, dg1_ref, dbe1_ref,
            dwnh_ref, dwna_ref, dbn1_ref, dwn2_ref, dbn2_ref, dg2_ref,
            dbe2_ref,
        ):
            r[...] = jnp.zeros_like(r)

    # ---- forward rematerialization -------------------------------------
    e2 = e_ref[...].reshape(t * k, f)
    first = jnp.dot(e2, w_e_ref[...], preferred_element_type=f32)
    first += hs_ref[...].reshape(t * k, f).astype(f32)
    hr = hr_ref[...].astype(f32)
    first = (
        first.reshape(t, k, f) + hr[:, None, :] + b1_ref[...].astype(f32)
    ).reshape(t * k, f)
    r1 = jnp.maximum(first, 0.0)
    r1c = r1.astype(cdt)
    x1 = jnp.dot(r1c, w2_ref[...], preferred_element_type=f32)
    x1 += b2_ref[...].astype(f32)
    mu1 = jnp.mean(x1, axis=-1, keepdims=True)
    var1 = jnp.mean((x1 - mu1) ** 2, axis=-1, keepdims=True)
    inv1 = jax.lax.rsqrt(var1 + eps)
    xhat1 = (x1 - mu1) * inv1
    g1 = g1_ref[...].astype(f32)
    m = xhat1 * g1 + be1_ref[...].astype(f32)

    maskf = mask_ref[...].astype(f32)  # (t, k)
    agg = jnp.sum(m.reshape(t, k, f) * maskf[..., None], axis=1)  # (t, f)
    aggc = agg.astype(cdt)

    h_in = h_ref[...]
    nf = jnp.dot(h_in, wnh_ref[...], preferred_element_type=f32)
    nf += jnp.dot(aggc, wna_ref[...], preferred_element_type=f32)
    nf += bn1_ref[...].astype(f32)
    r2 = jnp.maximum(nf, 0.0)
    r2c = r2.astype(cdt)
    y1 = jnp.dot(r2c, wn2_ref[...], preferred_element_type=f32)
    y1 += bn2_ref[...].astype(f32)
    mu2 = jnp.mean(y1, axis=-1, keepdims=True)
    var2 = jnp.mean((y1 - mu2) ** 2, axis=-1, keepdims=True)
    inv2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = (y1 - mu2) * inv2

    # ---- node-path backward ---------------------------------------------
    gh = gh_ref[...].astype(f32)  # (t, f) = d h_out
    dg2_ref[...] += jnp.sum(gh * xhat2, axis=0, keepdims=True)
    dbe2_ref[...] += jnp.sum(gh, axis=0, keepdims=True)
    dy1 = _ln_bwd(gh, xhat2, inv2, g2_ref[...].astype(f32))
    dy1c = dy1.astype(cdt)
    dwn2_ref[...] += _dot_g(r2c, dy1c)
    dbn2_ref[...] += jnp.sum(dy1, axis=0, keepdims=True)
    dnf = _dot_t(dy1c, wn2_ref[...]) * (r2 > 0.0).astype(f32)
    dnfc = dnf.astype(cdt)
    dwnh_ref[...] += _dot_g(h_in, dnfc)
    dwna_ref[...] += _dot_g(aggc, dnfc)
    dbn1_ref[...] += jnp.sum(dnf, axis=0, keepdims=True)
    dh_ref[...] = (gh + _dot_t(dnfc, wnh_ref[...])).astype(dh_ref.dtype)
    dagg = _dot_t(dnfc, wna_ref[...])  # (t, f) f32

    # ---- edge-path backward ---------------------------------------------
    ge = ge_ref[...].astype(f32).reshape(t, k, f)  # d e_out
    dm = (ge + dagg[:, None, :] * maskf[..., None]).reshape(t * k, f)
    dg1_ref[...] += jnp.sum(dm * xhat1, axis=0, keepdims=True)
    dbe1_ref[...] += jnp.sum(dm, axis=0, keepdims=True)
    dx1 = _ln_bwd(dm, xhat1, inv1, g1)
    dx1c = dx1.astype(cdt)
    dw2_ref[...] += _dot_g(r1c, dx1c)
    db2_ref[...] += jnp.sum(dx1, axis=0, keepdims=True)
    dfirst = _dot_t(dx1c, w2_ref[...]) * (r1 > 0.0).astype(f32)
    dfirstc = dfirst.astype(cdt)
    dw_e_ref[...] += _dot_g(e2, dfirstc)
    db1_ref[...] += jnp.sum(dfirst, axis=0, keepdims=True)
    de_ref[...] = (
        ge.reshape(t * k, f) + _dot_t(dfirstc, w_e_ref[...])
    ).astype(cdt).reshape(t, k, f)
    dhs_ref[...] = dfirstc.reshape(t, k, f).astype(dhs_ref.dtype)
    dhr_ref[...] = (
        jnp.sum(dfirst.reshape(t, k, f), axis=1).astype(dhr_ref.dtype)
    )


def _gns_mp_step_bwd_pallas(e, hs_gath, hr_proj, h, mask, p, cotangents,
                            interpret, tile: int = 64):
    """Pallas backward launch; returns (de, dhs, dhr, dh, dp)."""
    ge, gh = cotangents
    n, k, f = e.shape
    # the backward keeps ~3x the forward's live state per row (remat
    # intermediates + cotangents), hence the smaller budget
    tile = _pick_tile(n, k, tile, row_budget=1600)
    n_pad = -n % tile
    if n_pad:
        pad3 = ((0, n_pad), (0, 0), (0, 0))
        pad2 = ((0, n_pad), (0, 0))
        e = jnp.pad(e, pad3)
        hs_gath = jnp.pad(hs_gath, pad3)
        ge = jnp.pad(ge, pad3)
        hr_proj = jnp.pad(hr_proj, pad2)
        h = jnp.pad(h, pad2)
        gh = jnp.pad(gh, pad2)
        mask = jnp.pad(mask, pad2)
    n_tiles = (n + n_pad) // tile

    cdt = e.dtype
    params = _row_params(p, _BWD_PARAM_ORDER, f, cdt)

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

    def acc_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    acc_shapes = {
        "w_e": (f, f), "b1": (1, f), "w2": (f, f), "b2": (1, f),
        "ln1_scale": (1, f), "ln1_bias": (1, f),
        "w_nh": (f, f), "w_na": (f, f), "bn1": (1, f),
        "wn2": (f, f), "bn2": (1, f), "ln2_scale": (1, f),
        "ln2_bias": (1, f),
    }

    outs = pl.pallas_call(
        _fused_bwd_kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_spec3, tile_spec3, tile_spec2, tile_spec2, mask_spec,
            tile_spec3, tile_spec2,
        ]
        + [full_spec(q) for q in params],
        out_specs=[tile_spec3, tile_spec3, tile_spec2, tile_spec2]
        + [acc_spec(acc_shapes[name]) for name in _BWD_PARAM_ORDER],
        out_shape=[
            jax.ShapeDtypeStruct(e.shape, cdt),
            jax.ShapeDtypeStruct(hs_gath.shape, hs_gath.dtype),
            jax.ShapeDtypeStruct(hr_proj.shape, hr_proj.dtype),
            jax.ShapeDtypeStruct(h.shape, h.dtype),
        ]
        + [
            jax.ShapeDtypeStruct(acc_shapes[name], jnp.float32)
            for name in _BWD_PARAM_ORDER
        ],
        interpret=interpret,
    )(e, hs_gath, hr_proj, h, mask, ge, gh, *params)

    de, dhs, dhr, dh = outs[:4]
    if n_pad:
        de, dhs, dhr, dh = de[:n], dhs[:n], dhr[:n], dh[:n]
    dp = {
        name: grad.reshape(p[name].shape).astype(p[name].dtype)
        for name, grad in zip(_BWD_PARAM_ORDER, outs[4:])
    }
    # the node-level sender/receiver projections differentiate outside the
    # kernel (their inputs are node-level matmuls in XLA)
    dp["w_s"] = jnp.zeros_like(p["w_s"])
    dp["w_r"] = jnp.zeros_like(p["w_r"])
    return de, dhs, dhr, dh, dp


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


# ---------------------------------------------------------------------------
# slot-space fused MP step (cell-sorted execution)
# ---------------------------------------------------------------------------
#
# All node/edge state lives in column-slot order (ops/neighbors_pallas.
# make_slot_edges_fn): receivers of column t occupy rows [t*C, (t+1)*C), and
# a receiver's senders can only live in the S stencil columns of t. The
# kernel therefore reads the sender projection from S scalar-prefetched
# (C, F) column slabs and selects per-edge rows in VMEM with a one-hot MXU
# contraction — the (N, K, F) gathered tensor of the particle-order path
# never exists in HBM. This removes the dominant remaining rollout cost
# (10 x ~0.23 ms of XLA h[senders] gathers at bench scale, docs/performance).


def slot_gather_reference(hs_ext: jnp.ndarray, cand: jnp.ndarray,
                          bases: jnp.ndarray) -> jnp.ndarray:
    """XLA mirror of the in-kernel stencil-slab select.

    hs_ext: ((n_cols+1)*C, F) slot-ordered rows (sentinel column last);
    cand: (n_ext, K) stencil-candidate ids (fill S*C); bases: (n_cols, S).
    Returns the gathered (n_ext, K, F) tensor (zeros on padded slots).
    """
    n_cols, s = bases.shape
    n_ext, f = hs_ext.shape
    c = n_ext // (n_cols + 1)
    k = cand.shape[-1]
    cw = s * c
    slabs = hs_ext.reshape(n_cols + 1, c, f)[bases]  # (n_cols, S, C, F)
    slabs = slabs.reshape(n_cols, cw, f)
    cand_i = cand[: n_cols * c].reshape(n_cols, c * k)
    safe = jnp.minimum(cand_i, cw - 1)
    g = jnp.take_along_axis(slabs, safe[..., None], axis=1)
    g = jnp.where((cand_i < cw)[..., None], g, 0.0)
    g = g.reshape(n_cols * c, k, f)
    return jnp.concatenate([g, jnp.zeros((c, k, f), g.dtype)], axis=0)


def gns_mp_step_slot_reference(e, cand, bases, hs_ext, hr, h, p, enc=None):
    """Pure-jax mirror of the slot kernel (parity tests, non-TPU fallback,
    and the custom-VJP backward)."""
    n_cols = bases.shape[0]
    c = hs_ext.shape[0] // (n_cols + 1)
    cw = bases.shape[1] * c
    mask = cand < cw
    hs_gath = slot_gather_reference(hs_ext, cand, bases)
    return gns_mp_step_reference(e, hs_gath, hr, h, mask, p, enc)


def _make_slot_kernel(has_enc: bool, n_steps: int):
    """Slot kernel factory: per-column tile with in-VMEM stencil select."""

    def kernel(*args):
        # scalar prefetch (bases) first, then inputs, then outputs
        e_ref, cand_ref, hr_ref, h_ref = args[1:5]
        i = 5
        hs_refs = args[i : i + n_steps]
        i += n_steps
        if has_enc:
            ew1_ref, eb1_ref, ew2_ref, eb2_ref, eg_ref, ebe_ref = args[i:i + 6]
            i += 6
        p_refs = args[i : i + 13]
        i += 13
        e_out_ref, h_out_ref = args[i : i + 2]

        f32 = jnp.float32
        cdt = hr_ref.dtype
        t, k, _ = e_ref.shape  # t == C rows per column

        if has_enc:
            fe = e_ref.shape[-1]
            raw2 = e_ref[...].reshape(t * k, fe).astype(cdt)
            x = jnp.dot(raw2, ew1_ref[...], preferred_element_type=f32)
            x += eb1_ref[...].astype(f32)
            x = jnp.maximum(x, 0.0).astype(cdt)
            x = jnp.dot(x, ew2_ref[...], preferred_element_type=f32)
            x += eb2_ref[...].astype(f32)
            e2 = _layernorm(
                x, eg_ref[...].astype(f32), ebe_ref[...].astype(f32)
            ).astype(cdt)
        else:
            f = e_ref.shape[-1]
            e2 = e_ref[...].reshape(t * k, f)

        # stencil-slab select: one-hot over the S*C candidate axis. The
        # one-hot has <= 1 nonzero per row, so a bf16 MXU contraction is
        # exact; padded slots (cand == S*C) match nothing and yield zero.
        cand = cand_ref[...]  # (C, K) int32
        cw = n_steps * t
        hs_all = jnp.concatenate([r[...] for r in hs_refs], axis=0)  # (cw, F)
        sel = (
            cand.reshape(t * k, 1)
            == jax.lax.broadcasted_iota(jnp.int32, (t * k, cw), 1)
        ).astype(cdt)
        hs = jnp.dot(sel, hs_all.astype(cdt), preferred_element_type=f32)
        mask = (cand < cw).astype(f32)

        h_out_ref[...] = _mp_math(e2, hs, hr_ref, h_ref, mask,
                                  *p_refs, e_out_ref)

    return kernel


def _launch_fused_slot(e, cand, bases, hs_ext, hr, h, p, enc, interpret):
    n_ext, k, fe = e.shape
    f = hs_ext.shape[-1]
    cdt = hs_ext.dtype
    n_cols, n_steps = bases.shape
    c = n_ext // (n_cols + 1)
    assert (n_cols + 1) * c == n_ext, (n_ext, n_cols, c)

    # VMEM admissibility: the dominant live blocks per program
    cw = n_steps * c
    live = (
        c * k * max(fe, f) * 4  # e tile (+ encoder intermediate)
        + 3 * c * k * f * 4  # first/messages float32 temporaries
        + c * k * cw * 2  # one-hot select
        + cw * f * 2  # stencil slabs
    )
    from .device import scale_budget

    assert live < scale_budget(12 * 1024 * 1024), (
        f"slot MP kernel: column capacity {c} x K {k} exceeds the VMEM "
        "budget; use the particle-order fused path"
    )

    params = _row_params(p, _MP_KERNEL_PARAMS, f, cdt)
    enc_params = _row_params(enc, ENC_PARAM_NAMES, f, cdt) if enc else []

    # the sentinel tile (last) reads its own column's slabs; its candidates
    # are all-fill so nothing is selected
    bases_ext = jnp.concatenate(
        [bases, jnp.full((1, n_steps), n_cols, bases.dtype)], axis=0
    )

    e_spec = pl.BlockSpec(
        (c, k, fe), lambda t, b: (t, 0, 0), memory_space=pltpu.VMEM
    )
    eo_spec = pl.BlockSpec(
        (c, k, f), lambda t, b: (t, 0, 0), memory_space=pltpu.VMEM
    )
    cand_spec = pl.BlockSpec(
        (c, k), lambda t, b: (t, 0), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (c, f), lambda t, b: (t, 0), memory_space=pltpu.VMEM
    )

    def slab_spec(j):
        return pl.BlockSpec(
            (c, f), lambda t, b, j=j: (b[t, j], 0), memory_space=pltpu.VMEM
        )

    def full_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda t, b: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_cols + 1,),
        in_specs=[e_spec, cand_spec, row_spec, row_spec]
        + [slab_spec(j) for j in range(n_steps)]
        + [full_spec(q) for q in enc_params]
        + [full_spec(q) for q in params],
        out_specs=[eo_spec, row_spec],
    )

    e_out, h_out = pl.pallas_call(
        _make_slot_kernel(bool(enc), n_steps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_ext, k, f), cdt),
            jax.ShapeDtypeStruct(h.shape, h.dtype),
        ],
        interpret=interpret,
    )(bases_ext, e, cand, hr, h, *([hs_ext] * n_steps), *enc_params, *params)
    return e_out, h_out


def gns_mp_step_slot(
    e: jnp.ndarray,  # (n_ext, K, F) edge latents — or (n_ext, K, Fe) raw
    cand: jnp.ndarray,  # (n_ext, K) int32 stencil-candidate ids
    bases: jnp.ndarray,  # (n_cols, S) int32 stencil column table
    hs_ext: jnp.ndarray,  # (n_ext, F) sender projection, slot order
    hr: jnp.ndarray,  # (n_ext, F) receiver projection
    h: jnp.ndarray,  # (n_ext, F) node latents
    p: Dict[str, jnp.ndarray],
    enc: Optional[Dict[str, jnp.ndarray]] = None,
    interpret: Optional[bool] = None,
):
    """Run one fused MP step in slot space (differentiable; the backward
    runs through the XLA mirror — training-grade but not the fast path)."""
    if interpret is None:
        if jax.default_backend() != "tpu":
            return gns_mp_step_slot_reference(e, cand, bases, hs_ext, hr, h,
                                              p, enc)
        interpret = False
    return _gns_mp_slot_vjp(e, cand, bases, hs_ext, hr, h, p, enc, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(8,))
def _gns_mp_slot_vjp(e, cand, bases, hs_ext, hr, h, p, enc, interpret):
    return _launch_fused_slot(e, cand, bases, hs_ext, hr, h, p, enc,
                              interpret)


def _gns_mp_slot_vjp_fwd(e, cand, bases, hs_ext, hr, h, p, enc, interpret):
    out = _launch_fused_slot(e, cand, bases, hs_ext, hr, h, p, enc, interpret)
    return out, (e, cand, bases, hs_ext, hr, h, p, enc)


def _gns_mp_slot_vjp_bwd(interpret, residuals, cotangents):
    e, cand, bases, hs_ext, hr, h, p, enc = residuals
    import numpy as _np

    def fwd(e_, hs_, hr_, h_, p_, enc_):
        return gns_mp_step_slot_reference(e_, cand, bases, hs_, hr_, h_,
                                          p_, enc_)

    _, vjp = jax.vjp(fwd, e, hs_ext, hr, h, p, enc)
    de, dhs, dhr, dh, dp, denc = vjp(cotangents)
    f0 = lambda a: _np.zeros(a.shape, dtype=jax.dtypes.float0)
    return de, f0(cand), f0(bases), dhs, dhr, dh, dp, denc


_gns_mp_slot_vjp.defvjp(_gns_mp_slot_vjp_fwd, _gns_mp_slot_vjp_bwd)
