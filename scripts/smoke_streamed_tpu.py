"""On-TPU smoke for the streamed large-N NL kernel.

CPU interpret-mode parity is covered by
tests/test_neighbors_pallas.py::test_streamed_kernel_matches_bruteforce;
this checks the real Mosaic compile + execution path at a size where the
monolithic kernel is VMEM-inadmissible (the old celllist-fallback regime)
and cross-validates the edge set against the XLA celllist backend.

Run ON TPU:  python scripts/smoke_streamed_tpu.py [n]
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    import jax.numpy as jnp

    from lagrangebench_tpu.ops import neighbor_list, periodic
    from lagrangebench_tpu.ops import neighbors_pallas as nlp

    rng = np.random.default_rng(0)
    dim, box = 3, 1.0
    per_side = max(round(n ** (1 / 3)), 2)
    cutoff = 1.45 * box / per_side
    pos = rng.uniform(0, box, size=(n, dim)).astype(np.float32)

    disp, _ = periodic(box)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fns = neighbor_list(
            disp, [box] * dim, cutoff, backend="pallas", format="dense",
            pbc=[True] * dim, capacity_multiplier=1.35,
        )
        nbrs = fns.allocate(jnp.asarray(pos))
        fell_back = any("VMEM budget" in str(r.message) for r in rec)
    print(f"n={n} cutoff={cutoff:.4f} K={nbrs.idx.shape[1]} "
          f"fell_back={fell_back} overflow={bool(nbrs.did_buffer_overflow)}")

    ref_fns = neighbor_list(
        disp, [box] * dim, cutoff, backend="celllist", format="dense",
        pbc=[True] * dim, capacity_multiplier=1.35,
    )
    ref = ref_fns.allocate(jnp.asarray(pos))

    a = np.asarray(nbrs.idx)
    b = np.asarray(ref.idx)
    bad = 0
    rows = range(0, n, max(n // 200, 1))
    for row in rows:
        sa = set(a[row][a[row] < n])
        sb = set(b[row][b[row] < n])
        if sa != sb:
            bad += 1
            if bad <= 3:
                print(f"row {row}: pallas-only={sa - sb} celllist-only={sb - sa}")
    print(f"checked {len(list(rows))} rows, {bad} mismatches")
    assert bad == 0, "edge mismatch vs celllist"
    assert not fell_back, "expected the streamed pallas path, got celllist"
    print("OK: streamed kernel compiles and matches celllist on TPU")


if __name__ == "__main__":
    main()
