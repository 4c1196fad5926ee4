"""Device-capability queries for kernel tile sizing.

The Pallas kernels bound their per-launch VMEM footprint. The binding
constraint on current TPUs is XLA's *scoped VMEM limit* (compiler flag
``xla_tpu_scoped_vmem_limit_kib``, default 16 MiB across v4/v5e/v5p/v6e),
not the physical VMEM size — round-2 calibration on v5e measured kernels
rejected at 16.27 MiB scoped VMEM, i.e. exactly the default limit. Tile
budgets calibrated on v5e therefore transfer to other generations as long
as the default limit applies, and scale proportionally when a user raises
it via ``XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=...`` or the
``LBT_VMEM_LIMIT_MIB`` env var.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

#: the scoped-VMEM limit the v5e tile budgets were calibrated against
CALIBRATION_BYTES = 16 * 1024 * 1024


@lru_cache(maxsize=1)
def scoped_vmem_limit_bytes() -> int:
    """The scoped VMEM budget Pallas kernels must fit into, in bytes."""
    env = os.environ.get("LBT_VMEM_LIMIT_MIB")
    if env:
        return int(float(env) * 1024 * 1024)
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"xla_tpu_scoped_vmem_limit_kib=(\d+)", flags)
    if m:
        return int(m.group(1)) * 1024
    return CALIBRATION_BYTES


def scale_budget(v5e_calibrated: int) -> int:
    """Scale a v5e-calibrated size linearly with the scoped-VMEM limit."""
    limit = scoped_vmem_limit_bytes()
    if limit == CALIBRATION_BYTES:
        return v5e_calibrated
    return max(int(v5e_calibrated * (limit / CALIBRATION_BYTES)), 1)
