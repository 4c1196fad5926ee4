"""Minimal O(3) irreducible-representation bookkeeping.

A self-contained replacement for the slice of e3nn-jax the SEGNN stack needs
(reference lagrangebench/models/segnn.py uses e3nn Irreps/IrrepsArray):
parsing "2x1o + 1x0e" strings, dimensions, slices, and a thin array
container. Basis convention: l=1 components are ordered (x, y, z); l=2 as
[xy, yz, 3z^2-1, xz, x^2-y^2] (see basis.py). Groups keep their declared
order — no automatic sorting.
"""

from __future__ import annotations

import re
from typing import Iterator, List, NamedTuple, Sequence, Tuple, Union

import jax.numpy as jnp


class Irrep(NamedTuple):
    """One irreducible representation: degree l and parity p (+1/-1)."""

    l: int
    p: int

    @property
    def dim(self) -> int:
        return 2 * self.l + 1

    def __str__(self) -> str:
        return f"{self.l}{'e' if self.p == 1 else 'o'}"

    @classmethod
    def parse(cls, s: str) -> "Irrep":
        m = re.fullmatch(r"(\d+)([eo])", s.strip())
        assert m, f"Cannot parse irrep {s!r}"
        return cls(int(m.group(1)), 1 if m.group(2) == "e" else -1)

    def __mul__(self, other: "Irrep") -> List["Irrep"]:
        """Selection rule of the tensor product."""
        return [
            Irrep(l, self.p * other.p)
            for l in range(abs(self.l - other.l), self.l + other.l + 1)
        ]


class MulIrrep(NamedTuple):
    mul: int
    ir: Irrep

    @property
    def dim(self) -> int:
        return self.mul * self.ir.dim

    def __str__(self) -> str:
        return f"{self.mul}x{self.ir}"


class Irreps(tuple):
    """An ordered tuple of (multiplicity, Irrep) groups."""

    def __new__(cls, value: Union[str, Sequence, "Irreps"]) -> "Irreps":
        if isinstance(value, Irreps):
            return super().__new__(cls, value)
        groups = []
        if isinstance(value, str):
            for tok in value.split("+"):
                tok = tok.strip()
                if not tok:
                    continue
                if "x" in tok:
                    mul, ir = tok.split("x")
                    groups.append(MulIrrep(int(mul), Irrep.parse(ir)))
                else:
                    groups.append(MulIrrep(1, Irrep.parse(tok)))
        else:
            for item in value:
                if isinstance(item, MulIrrep):
                    groups.append(item)
                else:
                    mul, ir = item
                    if not isinstance(ir, Irrep):
                        ir = Irrep.parse(ir) if isinstance(ir, str) else Irrep(*ir)
                    groups.append(MulIrrep(int(mul), ir))
        return super().__new__(cls, groups)

    # -- properties -------------------------------------------------------
    @property
    def dim(self) -> int:
        return sum(g.dim for g in self)

    @property
    def num_irreps(self) -> int:
        return sum(g.mul for g in self)

    @property
    def lmax(self) -> int:
        return max((g.ir.l for g in self), default=0)

    def count(self, ir: Union[str, Irrep]) -> int:
        if isinstance(ir, str):
            ir = Irrep.parse(ir)
        return sum(g.mul for g in self if g.ir == ir)

    def slices(self) -> List[slice]:
        out, start = [], 0
        for g in self:
            out.append(slice(start, start + g.dim))
            start += g.dim
        return out

    def simplify(self) -> "Irreps":
        """Merge consecutive groups with the same irrep; drop empty ones."""
        groups: List[MulIrrep] = []
        for g in self:
            if g.mul == 0:
                continue
            if groups and groups[-1].ir == g.ir:
                groups[-1] = MulIrrep(groups[-1].mul + g.mul, g.ir)
            else:
                groups.append(g)
        return Irreps(groups)

    def sort(self) -> "Irreps":
        """Stable sort groups by (l, p)."""
        return Irreps(sorted(self, key=lambda g: (g.ir.l, -g.ir.p)))

    def regroup(self) -> "Irreps":
        return self.sort().simplify()

    def __add__(self, other) -> "Irreps":
        return Irreps(tuple(self) + tuple(Irreps(other)))

    def __mul__(self, n: int) -> "Irreps":
        return Irreps([MulIrrep(g.mul * n, g.ir) for g in self])

    __rmul__ = __mul__

    def __repr__(self) -> str:
        return "+".join(str(g) for g in self) or "Irreps()"

    @staticmethod
    def spherical_harmonics(lmax: int) -> "Irreps":
        """0e + 1o + 2e + ... up to lmax (parity (-1)^l)."""
        return Irreps([(1, Irrep(l, (-1) ** l)) for l in range(lmax + 1)])


class IrrepsArray:
    """An array whose trailing axis is laid out according to `irreps`.

    Storage convention is **m-major**: each group's flat chunk is the
    row-major flattening of ``(2l+1, mul)``. On TPU this puts the (usually
    large) multiplicity on the fastest-varying axis, so grouped views pad
    lanes by ~mul/128 instead of ~(2l+1)/128 — the difference between 2.8x
    and 42x wasted bandwidth for l=1 hidden features.

    Internally the data lives as **per-m parts**: for each group, a list of
    ``2l+1`` arrays shaped ``(..., mul)``. Flat storage forced XLA to emit
    ~60 relayout copies per SEGNN layer (slice/concat), and stacked
    ``(..., 2l+1, mul)`` chunks tile as (8, 128) with a 2l+1 sublane pad on
    EVERY op; per-m parts keep each array lane-packed 2D/3D, so tensor
    products unroll into clean elementwise FMAs + full-width matmuls. The
    flat ``.array`` view materializes lazily at the few real boundaries
    (model output, external features) and is cached.

    Use ``from_mul_major`` to ingest externally-built features laid out as
    (mul, 2l+1) runs (e.g. a stacked velocity history).
    """

    def __init__(self, irreps: Union[str, Irreps], array: jnp.ndarray = None,
                 parts: List[List[jnp.ndarray]] = None):
        self.irreps = Irreps(irreps)
        assert (array is None) != (parts is None), (
            "exactly one of array / parts required"
        )
        if array is not None:
            assert array.shape[-1] == self.irreps.dim, (
                f"array last dim {array.shape[-1]} != irreps dim "
                f"{self.irreps.dim} ({self.irreps})"
            )
        else:
            assert len(parts) == len(self.irreps)
            for g, ps in zip(self.irreps, parts):
                assert len(ps) == g.ir.dim and all(
                    p.shape[-1] == g.mul for p in ps
                ), f"parts do not match {g}"
        self._array = array
        self._parts = parts

    @classmethod
    def from_parts(cls, irreps, parts: List[List[jnp.ndarray]]):
        return cls(irreps, parts=parts)

    @classmethod
    def from_chunks(cls, irreps, chunks: List[jnp.ndarray]) -> "IrrepsArray":
        """chunks: per group (..., 2l+1, mul) stacked arrays."""
        irreps = Irreps(irreps)
        parts = [
            [c[..., m, :] for m in range(g.ir.dim)]
            for g, c in zip(irreps, chunks)
        ]
        return cls(irreps, parts=parts)

    @property
    def array(self) -> jnp.ndarray:
        if self._array is None:
            # m-major group flat = [m0 muls..., m1 muls, ...] == part concat
            flat = [p for ps in self._parts for p in ps]
            self._array = (
                flat[0] if len(flat) == 1 else jnp.concatenate(flat, axis=-1)
            )
        return self._array

    def parts(self) -> List[List[jnp.ndarray]]:
        if self._parts is None:
            out = []
            for g, sl in zip(self.irreps, self.irreps.slices()):
                c = self._array[..., sl]
                out.append([
                    c[..., m * g.mul:(m + 1) * g.mul]
                    for m in range(g.ir.dim)
                ])
            self._parts = out
        return self._parts

    def chunks(self) -> List[jnp.ndarray]:
        """Per-group stacked (..., 2l+1, mul) views (materialized)."""
        return [jnp.stack(ps, axis=-2) for ps in self.parts()]

    @property
    def shape(self):
        if self._array is not None:
            return self._array.shape
        p = self._parts[0][0]
        return p.shape[:-1] + (self.irreps.dim,)

    def groups(self) -> Iterator[Tuple[MulIrrep, jnp.ndarray]]:
        """Yield (group, chunk shaped (..., 2l+1, mul))."""
        yield from zip(self.irreps, self.chunks())

    def indexed(self, idx) -> "IrrepsArray":
        """Gather along the leading axis, part-wise."""
        return IrrepsArray.from_parts(
            self.irreps, [[p[idx] for p in ps] for ps in self.parts()]
        )

    def broadcast_edges(self, k: int) -> "IrrepsArray":
        """(N, ...) node data -> (N, K, ...) per-edge receiver view (dense
        layout): a broadcast, never a gather."""
        return IrrepsArray.from_parts(
            self.irreps,
            [
                [
                    jnp.broadcast_to(p[:, None], (p.shape[0], k) + p.shape[1:])
                    for p in ps
                ]
                for ps in self.parts()
            ],
        )

    def __add__(self, other: "IrrepsArray") -> "IrrepsArray":
        assert self.irreps == other.irreps, (
            f"cannot add {self.irreps} and {other.irreps}"
        )
        return IrrepsArray.from_parts(
            self.irreps,
            [
                [a + b for a, b in zip(pa, pb)]
                for pa, pb in zip(self.parts(), other.parts())
            ],
        )

    def __repr__(self):
        return f"IrrepsArray({self.irreps}, shape={self.shape})"


def from_mul_major(irreps: Union[str, Irreps], array: jnp.ndarray) -> IrrepsArray:
    """Build an IrrepsArray from a mul-major flat array.

    External features are naturally (mul, 2l+1)-flattened (e.g. K stacked
    3-vectors); this transposes each group chunk into the engine's m-major
    storage. Groups with mul == 1 or l == 0 are layout-invariant.
    """
    irreps = Irreps(irreps)
    parts = []
    for g, sl in zip(irreps, irreps.slices()):
        chunk = array[..., sl]
        chunk = chunk.reshape(chunk.shape[:-1] + (g.mul, g.ir.dim))
        parts.append([chunk[..., m] for m in range(g.ir.dim)])
    return IrrepsArray.from_parts(irreps, parts)


def concatenate(arrays: List[IrrepsArray]) -> IrrepsArray:
    """Concatenate IrrepsArrays along the feature axis (group order kept).

    With parts storage this is a list concatenation — no data movement.
    """
    irreps = Irreps([g for a in arrays for g in a.irreps])
    return IrrepsArray.from_parts(
        irreps, [ps for a in arrays for ps in a.parts()]
    )
