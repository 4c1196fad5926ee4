"""Fused parametrized tensor product and gated nonlinearity.

The SEGNN workhorse (reference lagrangebench/models/segnn.py:44-181 builds it
from e3nn tensor_product + Linear): the Clebsch-Gordan contraction and the
per-path linear mixing fuse into per-output-component arithmetic that maps
cleanly onto the TPU:

* the CG contraction **unrolls over its nonzero entries** into elementwise
  FMAs on lane-packed ``(..., mul)`` parts (the m-axes are 3-7 long —
  keeping them as tensor dimensions forces (8, 128) tile padding and
  relayout copies on every op; measured ~1/3 of SEGNN runtime);
* the per-path weight mixing batches into ONE full-width matmul per output
  component (channels concatenated over paths, contraction >= mul).

The unrolled path requires the right operand's multiplicities to be 1 —
true for every SEGNN tensor product (y is always the spherical-harmonic
attributes or a scalar 1). A stacked-einsum fallback covers general y.

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


# When True, O3TensorProduct sows its (x, y, out) irreps signature into a
# "site_spec" variable collection at init. Off by default: the sown strings
# are not jittable, and importers (compat.segnn_site_specs) are the only
# consumer — they flip this around an un-jitted model.init.
_CAPTURE_SITE_SPECS = False


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
    runs the weight contractions on the MXU fast path with float32
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
                Irreps("1x0e"), jnp.ones(x.shape[:-1] + (1,), jnp.float32)
            )
        output_irreps = Irreps(self.output_irreps)

        if _CAPTURE_SITE_SPECS and self.is_initializing():
            # record the site signature for checkpoint importers
            # (compat.haiku_segnn_to_flax): the (x, y, out) irreps fully
            # determine this site's path enumeration and weight layout
            self.sow(
                "site_spec",
                "irreps",
                (str(x.irreps), str(y.irreps), str(output_irreps)),
                init_fn=lambda: None,
                reduce_fn=lambda prev, cur: cur,
            )

        x_parts = x.parts()
        y_parts = y.parts()
        cdt = jnp.dtype(self.compute_dtype)
        prec = matmul_precision(cdt)

        out_parts: List[List[jnp.ndarray]] = []
        for k_out, g_out in enumerate(output_irreps):
            d3 = g_out.ir.dim
            paths = _enumerate_paths(x.irreps, y.irreps, g_out.ir)
            use_bias = self.biases and g_out.ir == Irrep(0, 1)
            fan_in = sum(
                x.irreps[i].mul * y.irreps[j].mul for i, j in paths
            ) + int(use_bias)
            if fan_in == 0:
                # unreachable output: zeros (mirrors the reference's warning
                # + drop behavior)
                out_parts.append([
                    jnp.zeros(x.shape[:-1] + (g_out.mul,), jnp.float32)
                    for _ in range(d3)
                ])
                continue

            alpha = 1.0 / np.sqrt(fan_in)
            # per output component p: list of per-path channel blocks
            per_p: List[List[jnp.ndarray]] = [[] for _ in range(d3)]
            ws = []
            for i, j in paths:
                gx = x.irreps[i]
                gy = y.irreps[j]
                C = clebsch_gordan(gx.ir.l, gy.ir.l, g_out.ir.l)  # numpy
                w = self.param(
                    f"w_{k_out}_{i}_{j}",
                    nn.initializers.normal(stddev=1.0),
                    (gx.mul * gy.mul, g_out.mul),
                    jnp.float32,
                )
                ws.append(w)
                if gy.mul == 1:
                    # unrolled CG: elementwise FMAs on (..., mul_x) parts;
                    # (channel order: u, matching the w rows)
                    for p in range(d3):
                        acc = None
                        for m in range(gx.ir.dim):
                            for nn_ in range(gy.ir.dim):
                                c = float(C[m, nn_, p])
                                if c == 0.0:
                                    continue
                                term = x_parts[i][m] * (
                                    c * y_parts[j][nn_]
                                )
                                acc = term if acc is None else acc + term
                        if acc is None:
                            acc = jnp.zeros_like(x_parts[i][0])
                        per_p[p].append(acc)
                else:
                    # general fallback: stacked einsum (not on the SEGNN
                    # path — y there is attributes with mul == 1)
                    ax = jnp.stack(x_parts[i], axis=-2)  # (..., d1, u)
                    ay = jnp.stack(y_parts[j], axis=-2)  # (..., d2, v)
                    tp = jnp.einsum(
                        "...mu,...nv,mnp->...puv",
                        ax.astype(cdt),
                        ay.astype(cdt),
                        jnp.asarray(C, cdt),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
                    tp = tp.reshape(tp.shape[:-2] + (gx.mul * gy.mul,))
                    for p in range(d3):
                        per_p[p].append(tp[..., p, :])

            # one channel-batched weight matmul per output component:
            # full-width contraction on the MXU, no tiny m-axes
            w_all = ws[0] if len(ws) == 1 else jnp.concatenate(ws, axis=0)
            w_all = w_all.astype(cdt)
            b = None
            if use_bias:
                b = self.param(
                    f"b_{k_out}",
                    nn.initializers.zeros_init(),
                    (g_out.mul,),
                    jnp.float32,
                )
            group = []
            for p in range(d3):
                tp_all = (
                    per_p[p][0]
                    if len(per_p[p]) == 1
                    else jnp.concatenate(per_p[p], axis=-1)
                )
                o = jnp.dot(
                    tp_all.astype(cdt), w_all,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                o = o * alpha
                if b is not None:
                    o = o + b
                group.append(o)
            out_parts.append(group)

        return IrrepsArray.from_parts(output_irreps, out_parts)


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
    parts = z.parts()
    first = z.irreps[0]
    assert first.ir == Irrep(0, 1) and first.mul == n_gates, (
        f"first group must hold the {n_gates} gates, got {first}"
    )
    gates = gate_activation(parts[0][0])  # (..., n_gates)

    out_parts = []
    out_irreps = []
    used = 0
    for g, ps in zip(z.irreps[1:], parts[1:]):
        if g.ir.l == 0:
            out_parts.append([scalar_activation(ps[0])])
        else:
            gsel = gates[..., used: used + g.mul]
            used += g.mul
            out_parts.append([p * gsel for p in ps])
        out_irreps.append(g)
    assert used == n_gates, f"gate count mismatch: used {used} of {n_gates}"
    return IrrepsArray.from_parts(Irreps(out_irreps), out_parts)


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
            return IrrepsArray.from_parts(
                z.irreps,
                [[self.scalar_activation(p) for p in ps] for ps in z.parts()],
            )
        tp_irreps = Irreps([MulIrrep(n_gates, Irrep(0, 1))]) + output_irreps
        z = O3TensorProduct(
            tp_irreps, biases=self.biases, compute_dtype=self.compute_dtype
        )(x, y)
        return gate(z, n_gates, self.scalar_activation, self.gate_activation)
