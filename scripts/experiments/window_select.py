"""Experiment: windowed stencil-select fused MP step vs gather + fused step.

Round-3 follow-up to the slot-space v1 finding (padded column slots are
VMEM-inadmissible and inflate edge traffic at bench scale): keep rows
COMPACT but cell-sorted — sort key (x-slab at the NL column granularity,
y at ~cutoff/4 granularity) — and give the fused MP kernel per-sub-tile
dynamic sender windows: 3 slab windows DMA'd per receiver tile, sub-tile
selects as narrow one-hot MXU contractions over dynamic VMEM slices.

Measures, at bench dims (8k particles / 3D / K=24 / F=128, real sorted
positions): per-MP-step time of
  (a) the production path: XLA hs[senders] gather + fused MP kernel;
  (b) the windowed kernel (no HBM-materialized gathered tensor).

Run ON TPU: python scripts/experiments/window_select.py
"""

import math
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from __graft_entry__ import _grid_positions
from lagrangebench_tpu.ops import fused_mp

N, DIM, K, F = 8000, 3, 24, 128
CUTOFF = 1.45 * 0.05
NCX = math.floor(1.0 / CUTOFF)  # 13 x-slabs (NL column granularity)
YF = 4 * NCX  # fine y bins (cutoff/4)
T = 128  # receiver rows per program
SUB = 32  # rows per sub-select
MULT = 1.25


def build_structure(seed=0):
    """Sorted order, windows, and a real radius graph in sorted space."""
    rng = np.random.default_rng(seed)
    pos = _grid_positions(N, DIM, 1.0, 6)[:, 5] + rng.normal(
        scale=0.002, size=(N, DIM)
    )
    pos %= 1.0

    xs = np.clip((pos[:, 0] * NCX).astype(int), 0, NCX - 1)
    yf = np.clip((pos[:, 1] * YF).astype(int), 0, YF - 1)
    key = xs * YF + yf
    order = np.argsort(key, kind="stable")
    pos_s = pos[order]
    xs_s, yf_s = xs[order], yf[order]

    # slab-aligned padded rows
    slab_occ = np.bincount(xs_s, minlength=NCX)
    slab_pad = ((slab_occ + T - 1) // T) * T
    sstart = np.concatenate([[0], np.cumsum(slab_pad)])
    n_rows = int(sstart[-1])
    row_of_sorted = np.empty(N, int)
    ptr = 0
    for s in range(NCX):
        idx = np.where(xs_s == s)[0]
        row_of_sorted[idx] = sstart[s] + np.arange(len(idx))
    # fine-bin prefix sums per slab (absolute padded rows)
    finestart = np.full((NCX, YF + 1), 0, int)
    for s in range(NCX):
        occ = np.bincount(yf_s[xs_s == s], minlength=YF)
        finestart[s, :] = sstart[s] + np.concatenate([[0], np.cumsum(occ)])

    # radius graph in sorted-row space (dense K per receiver)
    cell = np.clip((pos_s * NCX).astype(int), 0, NCX - 1)
    cid = (cell[:, 0] * NCX + cell[:, 1]) * NCX + cell[:, 2]
    buckets = {}
    for i, c in enumerate(cid):
        buckets.setdefault(c, []).append(i)
    senders = np.full((n_rows, K), -1, int)
    counts = np.zeros(n_rows, int)
    maxk = 0
    for i in range(N):
        ci = cell[i]
        cands = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    cc = ((ci[0] + dx) % NCX * NCX + (ci[1] + dy) % NCX) * NCX + (
                        ci[2] + dz
                    ) % NCX
                    cands.extend(buckets.get(cc, []))
        d = pos_s[cands] - pos_s[i]
        d -= np.round(d)
        good = np.where((d * d).sum(1) <= CUTOFF * CUTOFF)[0]
        maxk = max(maxk, len(good))
        r = row_of_sorted[i]
        for k, g in enumerate(good[:K]):
            senders[r, k] = row_of_sorted[cands[g]]
        counts[r] = min(len(good), K)
    print(f"max neighbors: {maxk} (K={K})")
    assert maxk <= K

    # ghost-extended row layout: per slab [pre ghost = rows of the last
    # GB y-bins][slab content][post ghost = rows of the first GB y-bins],
    # so y-periodic windows never wrap. Ghost segments are padded to a
    # static cap; ext rows are built per MP step by one cheap gather.
    GB = 4  # ghost y-bins = ceil(cutoff / fine-bin)
    fine_occ = finestart[:, 1:] - finestart[:, :-1]  # (NCX, YF)
    gc = max(
        int(fine_occ[:, :GB].sum(1).max()), int(fine_occ[:, -GB:].sum(1).max())
    )
    GC = -(-int(gc * 1.15) // 8) * 8
    estart = np.arange(NCX) * (0)  # filled below
    slab_ext = slab_pad + 2 * GC
    estart = np.concatenate([[0], np.cumsum(slab_ext)])
    n_ext = int(estart[-1])
    ext_idx = np.zeros(n_ext, np.int64)  # ext row -> compact row (clamped)
    for s in range(NCX):
        base = estart[s]
        pre_rows = finestart[s, YF] - finestart[s, YF - GB]
        # pre ghost: rows of the last GB bins, packed at the END of the
        # pre segment so they abut the content start
        a = finestart[s, YF - GB]
        ext_idx[base + GC - pre_rows : base + GC] = np.arange(a, finestart[s, YF])
        ext_idx[base : base + GC - pre_rows] = 0
        # content
        ext_idx[base + GC : base + GC + slab_occ[s]] = np.arange(
            sstart[s], sstart[s] + slab_occ[s]
        )
        ext_idx[base + GC + slab_occ[s] : base + GC + slab_pad[s]] = 0
        # post ghost: rows of the first GB bins
        post0 = base + GC + slab_occ[s]
        b = finestart[s, GB] - finestart[s, 0]
        ext_idx[post0 : post0 + b] = np.arange(finestart[s, 0], finestart[s, GB])
        ext_idx[post0 + b : base + slab_ext[s]] = 0

    def ext_of_bin(s, j):
        """ext row of the first row of fine-bin j (j in [-GB, YF+GB))."""
        base = estart[s]
        if j < 0:
            pre_rows = finestart[s, YF] - finestart[s, YF - GB]
            return base + GC - pre_rows + (
                finestart[s, YF + j] - finestart[s, YF - GB]
            )
        if j >= YF:
            post0 = base + GC + slab_occ[s]
            return post0 + (finestart[s, j - YF] - finestart[s, 0])
        return base + GC + (finestart[s, j] - sstart[s])

    def ext_of_row(s, row):
        """ext row of compact row `row` (content segment of slab s)."""
        return estart[s] + GC + (row - sstart[s])

    n_tiles = n_rows // T
    nsub = T // SUB
    yf_of_row = np.full(n_rows, -1, int)
    yf_of_row[row_of_sorted] = yf_s
    xs_of_tile = np.searchsorted(sstart, np.arange(n_tiles) * T, side="right") - 1

    WSUB = 0
    spans = []
    sub_bins = np.zeros((n_tiles, nsub, 2), int)
    subw = np.zeros((n_tiles, nsub, 3, 2), int)
    for t in range(n_tiles):
        s = xs_of_tile[t]
        for u in range(nsub):
            rows = yf_of_row[t * T + u * SUB : t * T + (u + 1) * SUB]
            rows = rows[rows >= 0]
            if len(rows) == 0:
                lo, hi = 0, 1
            else:
                lo, hi = int(rows.min()) - GB, int(rows.max()) + GB
            sub_bins[t, u] = (lo, hi)
            for j, dxs in enumerate((-1, 0, 1)):
                s2 = (s + dxs) % NCX
                a = ext_of_bin(s2, lo)
                b = ext_of_bin(s2, hi) + fine_occ[s2, hi % YF]
                a8 = a // 8 * 8
                subw[t, u, j] = (a8, b)
                spans.append(b - a8)
    WSUB = -(-max(b - a for a, b in subw.reshape(-1, 2)) // 8) * 8
    # absolute 8-aligned window starts, clamped so the window stays inside
    # the ext array; stored in 8-row units so the kernel's DMA offsets are
    # provably 8-aligned
    w0s = np.minimum(subw[..., 0], (n_ext - WSUB) // 8 * 8).astype(np.int32)
    assert (w0s % 8 == 0).all()
    w0s_rows = w0s.copy()
    w0s = w0s // 8
    print(f"n_rows={n_rows} n_ext={n_ext} tiles={n_tiles} WSUB={WSUB} "
          f"p99 sub-span={int(np.percentile(spans, 99))}")

    # encode cand: sx*WSUB + (sender_ext - w0s[t,u,sx]); fill = 3*WSUB.
    # A sender reached across the y-wrap encodes at its GHOST image: pick
    # the periodic bin image that falls inside the sub-tile's bin window.
    cand = np.full((n_rows, K), 3 * WSUB, np.int32)
    for t in range(n_tiles):
        s = xs_of_tile[t]
        for u in range(nsub):
            lo, hi = sub_bins[t, u]
            for r in range(t * T + u * SUB, t * T + (u + 1) * SUB):
                for k in range(counts[r]):
                    srow = senders[r, k]
                    sslab = np.searchsorted(sstart, srow, side="right") - 1
                    dxs = (sslab - s) % NCX
                    sx = {NCX - 1: 0, 0: 1, 1: 2}.get(dxs)
                    assert sx is not None, (dxs,)
                    yfs = yf_of_row[srow]
                    rank = srow - finestart[sslab, yfs]
                    for v in (yfs, yfs - YF, yfs + YF):
                        if lo <= v <= hi:
                            break
                    else:
                        raise AssertionError((t, u, r, k, yfs, lo, hi))
                    sext = ext_of_bin(sslab, v) + rank
                    local = sext - w0s_rows[t, u, sx]
                    assert 0 <= local < WSUB, (
                        srow, sext, w0s_rows[t, u, sx], WSUB
                    )
                    cand[r, k] = sx * WSUB + local
    return (n_rows, n_ext, np.asarray(ext_idx), cand, w0s, w0s_rows, WSUB)


def make_window_kernel(n_rows, WSUB, n_tiles, nsub):
    def kernel(w0s_ref, e_ref, cand_ref, mask_ref, hr_ref, h_ref,
               hs_hbm, *rest):
        p_refs = rest[:13]
        e_out_ref, h_out_ref = rest[13:15]
        scratch, sem = rest[15:17]
        t = pl.program_id(0)
        cdt = hr_ref.dtype
        f32 = jnp.float32

        cps = []
        for u in range(nsub):
            for sx in range(3):
                cp = pltpu.make_async_copy(
                    hs_hbm.at[pl.ds(w0s_ref[t, u, sx] * 8, WSUB)],
                    scratch.at[pl.ds((u * 3 + sx) * WSUB, WSUB)],
                    sem,
                )
                cp.start()
                cps.append(cp)

        cand = cand_ref[...]  # (T*K, 1) int32 — pre-flattened outside
        hs_parts = []
        for u in range(nsub):
            # wait only this sub's windows: later DMAs overlap the matmuls
            for cp in cps[u * 3 : (u + 1) * 3]:
                cp.wait()
            win = scratch[u * 3 * WSUB : (u + 1) * 3 * WSUB]  # (3*WSUB, F)
            cu = cand[u * SUB * K : (u + 1) * SUB * K]  # (SUB*K, 1)
            sel = (
                cu == jax.lax.broadcasted_iota(jnp.int32, (SUB * K, 3 * WSUB), 1)
            ).astype(cdt)
            hs_parts.append(
                jnp.dot(sel, win.astype(cdt), preferred_element_type=f32)
            )
        hs = jnp.concatenate(hs_parts, axis=0)  # (T*K, F) f32
        mask = mask_ref[...].astype(f32)  # (T, K)

        f = e_ref.shape[-1]
        e2 = e_ref[...].reshape(T * K, f)
        h_out_ref[...] = fused_mp._mp_math(
            e2, hs, hr_ref, h_ref, mask, *p_refs, e_out_ref
        )

    return kernel


def main():
    n_rows, n_ext, ext_idx, cand, w0s, w0s_rows, WSUB = build_structure()
    n_tiles = n_rows // T
    nsub = T // SUB
    rng = np.random.default_rng(1)
    cdt = jnp.bfloat16
    ext_idx_j = jnp.asarray(ext_idx)

    e = jnp.asarray(rng.normal(size=(n_rows, K, F)), cdt)
    h = jnp.asarray(rng.normal(size=(n_rows, F)), cdt)
    hr = jnp.asarray(rng.normal(size=(n_rows, F)), cdt)
    hs = jnp.asarray(rng.normal(size=(n_rows, F)), cdt)
    p = fused_mp.init_step_params(jax.random.PRNGKey(0), F)
    params = fused_mp._row_params(p, fused_mp._MP_KERNEL_PARAMS, F, cdt)
    cand_j = jnp.asarray(cand).reshape(n_rows * K, 1)
    mask_j2 = jnp.asarray((cand < 3 * WSUB).astype(np.float32))
    w0s_j = jnp.asarray(w0s)

    kernel = make_window_kernel(n_rows, WSUB, n_tiles, nsub)

    tile3 = pl.BlockSpec((T, K, F), lambda t, a: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    tile2 = pl.BlockSpec((T, F), lambda t, a: (t, 0),
                         memory_space=pltpu.VMEM)
    candsp = pl.BlockSpec((T * K, 1), lambda t, a: (t, 0),
                          memory_space=pltpu.VMEM)
    masksp = pl.BlockSpec((T, K), lambda t, a: (t, 0),
                          memory_space=pltpu.VMEM)

    def full_spec(arr):
        return pl.BlockSpec(arr.shape, lambda t, a: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[tile3, candsp, masksp, tile2, tile2,
                  pl.BlockSpec(memory_space=pltpu.ANY)]
        + [full_spec(q) for q in params],
        out_specs=[tile3, tile2],
        scratch_shapes=[pltpu.VMEM((nsub * 3 * WSUB, F), cdt),
                        pltpu.SemaphoreType.DMA],
    )

    @jax.jit
    def window_steps(e, h, hr, hs):
        def body(carry, _):
            e, h = carry
            hs_ext = hs[ext_idx_j]  # ghost-extended layout, built per step
            e2, h2 = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((n_rows, K, F), cdt),
                    jax.ShapeDtypeStruct((n_rows, F), cdt),
                ],
            )(w0s_j, e, cand_j, mask_j2, hr, h, hs_ext, *params)
            return (e2, h2), None
        (e, h), _ = jax.lax.scan(body, (e, h), None, length=50)
        return e, h

    # production path: decode cand back to compact rows for the gather
    senders_abs = np.full((n_rows, K), n_rows, np.int32)
    for t in range(n_tiles):
        for u in range(nsub):
            rows = slice(t * T + u * SUB, t * T + (u + 1) * SUB)
            c = cand[rows]
            valid = c < 3 * WSUB
            sx = np.clip(c // WSUB, 0, 2)
            extrow = w0s_rows[t, u][sx] + c % WSUB
            senders_abs[rows] = np.where(
                valid, ext_idx[np.clip(extrow, 0, n_ext - 1)], n_rows
            )
    senders_j = jnp.asarray(senders_abs)
    mask_j = jnp.asarray((senders_abs < n_rows).astype(np.float32))

    @jax.jit
    def gather_steps(e, h, hr, hs):
        def body(carry, _):
            e, h = carry
            hs_g = hs[jnp.minimum(senders_j, n_rows - 1)]
            e2, h2 = fused_mp.gns_mp_step(e, hs_g, hr, h, mask_j, p)
            return (e2, h2), None
        (e, h), _ = jax.lax.scan(body, (e, h), None, length=50)
        return e, h

    def bench(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 3 / 50 * 1e3  # ms per step

    t_win = bench(window_steps, e, h, hr, hs)
    t_gat = bench(gather_steps, e, h, hr, hs)
    print(f"window kernel: {t_win:.3f} ms/step")
    print(f"gather+fused : {t_gat:.3f} ms/step")

    # numerical check (one step, window vs mirror on same graph)
    e1, h1 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_rows, K, F), cdt),
                   jax.ShapeDtypeStruct((n_rows, F), cdt)],
    )(w0s_j, e, cand_j, mask_j2, hr, h, hs[ext_idx_j], *params)
    hs_g = hs[jnp.minimum(senders_j, n_rows - 1)] * mask_j[..., None].astype(cdt)
    e2, h2 = fused_mp.gns_mp_step_reference(e, hs_g, hr, h, mask_j, p)
    print("max |e| diff:", float(jnp.max(jnp.abs(e1.astype(jnp.float32) - e2.astype(jnp.float32)))))
    print("max |h| diff:", float(jnp.max(jnp.abs(h1.astype(jnp.float32) - h2.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
