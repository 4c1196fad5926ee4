"""Fused parametrized tensor product and gated nonlinearity.

The SEGNN workhorse (reference lagrangebench/models/segnn.py:44-181 builds it
from e3nn tensor_product + Linear): here the Clebsch-Gordan contraction and
the per-path linear mixing fuse into one einsum per (input-pair, output)
path, which XLA maps onto the MXU as batched matmuls — no intermediate
full-tensor-product materialization.

Normalization follows the "element" scheme: every output group divides by
sqrt(total fan-in) where fan-in counts mul_x * mul_y over all contributing
paths (+1 for the bias); weights init as standard normal.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils import matmul_precision
from .basis import clebsch_gordan
from .irreps import Irrep, Irreps, IrrepsArray, MulIrrep


def _enumerate_paths(
    irreps_x: Irreps, irreps_y: Irreps, ir_out: Irrep
) -> List[Tuple[int, int]]:
    """Indices of (x-group, y-group) pairs that can reach ir_out."""
    paths = []
    for i, gx in enumerate(irreps_x):
        for j, gy in enumerate(irreps_y):
            if ir_out in gx.ir * gy.ir:
                paths.append((i, j))
    return paths


class O3TensorProduct(nn.Module):
    """Linear parametrized tensor product x (x)_CG^W y -> output_irreps.

    With y=None it degenerates to an equivariant linear layer (y = scalar 1).
    Biases apply to scalar (0e) outputs only. ``compute_dtype="bfloat16"``
    runs the CG/weight contractions on the MXU fast path with float32
    accumulation (params stay float32).
    """

    output_irreps: Irreps
    biases: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self, x: IrrepsArray, y: Optional[IrrepsArray] = None
    ) -> IrrepsArray:
        if y is None:
            y = IrrepsArray(
                Irreps("1x0e"), jnp.ones(x.array.shape[:-1] + (1,), x.array.dtype)
            )
        output_irreps = Irreps(self.output_irreps)

        x_groups = list(x.groups())
        y_groups = list(y.groups())

        chunks = []
        for k_out, g_out in enumerate(output_irreps):
            paths = _enumerate_paths(x.irreps, y.irreps, g_out.ir)
            use_bias = self.biases and g_out.ir == Irrep(0, 1)
            fan_in = sum(
                x.irreps[i].mul * y.irreps[j].mul for i, j in paths
            ) + int(use_bias)
            if fan_in == 0:
                # unreachable output: zeros (mirrors the reference's warning
                # + drop behavior)
                chunks.append(
                    jnp.zeros(x.array.shape[:-1] + (g_out.dim,), x.array.dtype)
                )
                continue

            cdt = jnp.dtype(self.compute_dtype)
            prec = matmul_precision(cdt)
            alpha = 1.0 / np.sqrt(fan_in)
            tps = []
            ws = []
            for i, j in paths:
                gx, ax = x_groups[i]  # ax: (..., mul_x, 2l1+1)
                gy, ay = y_groups[j]
                C = jnp.asarray(
                    clebsch_gordan(gx.ir.l, gy.ir.l, g_out.ir.l), dtype=cdt
                )
                w = self.param(
                    f"w_{k_out}_{i}_{j}",
                    nn.initializers.normal(stddev=1.0),
                    (gx.mul * gy.mul, g_out.mul),
                    jnp.float32,
                )
                # m-major layouts: ax (..., m, u); ay (..., n, v)
                if gy.mul == 1:
                    # attribute-style right operand: pre-contract y with the
                    # CG tensor. The (y, C) contraction is independent of x,
                    # so XLA CSE reuses it across every layer/block that
                    # shares the attributes.
                    T = jnp.einsum(
                        "...n,mnp->...mp",
                        ay[..., 0].astype(cdt),
                        C,
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                    tp = jnp.einsum(
                        "...mu,...mp->...pu",
                        ax.astype(cdt),
                        T.astype(cdt),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )  # (..., p, u): channel order u (v == 1)
                else:
                    tp = jnp.einsum(
                        "...mu,...nv,mnp->...puv",
                        ax.astype(cdt),
                        ay.astype(cdt),
                        C,
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                    tp = tp.reshape(
                        tp.shape[:-2] + (gx.mul * gy.mul,)
                    )  # (..., p, u*v): channel order matches w rows
                tps.append(tp)
                ws.append(w)

            # one channel-batched weight matmul per output group instead of
            # one per path: fewer launches, better MXU utilization
            tp_all = tps[0] if len(tps) == 1 else jnp.concatenate(tps, axis=-1)
            w_all = ws[0] if len(ws) == 1 else jnp.concatenate(ws, axis=0)
            out = jnp.einsum(
                "...pk,ko->...po",
                tp_all.astype(cdt),
                w_all.astype(cdt),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

            out = out * alpha
            if use_bias:
                b = self.param(
                    f"b_{k_out}",
                    nn.initializers.zeros_init(),
                    (g_out.mul,),
                    x.array.dtype,
                )
                out = out + b  # (..., p=1, o) + (o,)
            chunks.append(out.reshape(out.shape[:-2] + (g_out.dim,)))

        return IrrepsArray(output_irreps, jnp.concatenate(chunks, axis=-1))


def gate(
    z: IrrepsArray,
    n_gates: int,
    scalar_activation: Callable = nn.silu,
    gate_activation: Callable = nn.sigmoid,
) -> IrrepsArray:
    """Gated nonlinearity (Weiler et al. 2018).

    Layout convention: the FIRST group of `z` holds the `n_gates` gating
    scalars (one per non-scalar irrep channel, in group order); remaining
    scalar groups pass through `scalar_activation`; each non-scalar channel
    is multiplied by its activated gate.
    """
    groups = list(z.groups())
    first, a_first = groups[0]
    assert first.ir == Irrep(0, 1) and first.mul == n_gates, (
        f"first group must hold the {n_gates} gates, got {first}"
    )
    # m-major: a_first is (..., 1, n_gates)
    gates = gate_activation(a_first[..., 0, :])  # (..., n_gates)

    out_groups = []
    out_irreps = []
    used = 0
    for g, a in groups[1:]:  # a: (..., 2l+1, mul)
        if g.ir.l == 0:
            out = scalar_activation(a)
        else:
            gsel = gates[..., used : used + g.mul]
            used += g.mul
            out = a * gsel[..., None, :]
        out_groups.append(out.reshape(out.shape[:-2] + (g.dim,)))
        out_irreps.append(g)
    assert used == n_gates, f"gate count mismatch: used {used} of {n_gates}"
    return IrrepsArray(Irreps(out_irreps), jnp.concatenate(out_groups, axis=-1))


class O3TensorProductGate(nn.Module):
    """Gated tensor product: TP to (gates + output), then gate."""

    output_irreps: Irreps
    biases: bool = True
    scalar_activation: Callable = nn.silu
    gate_activation: Callable = nn.sigmoid
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self, x: IrrepsArray, y: Optional[IrrepsArray] = None
    ) -> IrrepsArray:
        output_irreps = Irreps(self.output_irreps)
        n_gates = sum(g.mul for g in output_irreps if g.ir.l > 0)
        if n_gates == 0:  # all-scalar output: plain activation
            z = O3TensorProduct(
                output_irreps, biases=self.biases,
                compute_dtype=self.compute_dtype,
            )(x, y)
            return IrrepsArray(z.irreps, self.scalar_activation(z.array))
        tp_irreps = Irreps([MulIrrep(n_gates, Irrep(0, 1))]) + output_irreps
        z = O3TensorProduct(
            tp_irreps, biases=self.biases, compute_dtype=self.compute_dtype
        )(x, y)
        return gate(z, n_gates, self.scalar_activation, self.gate_activation)
