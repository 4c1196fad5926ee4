"""Checkpointing: path-keyed array archives + JSON metadata + best-model dir.

Dependency-light replacement for the reference's save/load_haiku
(reference lagrangebench/utils.py:50-128). Parameter/state pytrees are
stored as ``.npz`` archives keyed by the '/'-joined tree path of each leaf
— no pickled treedef, so checkpoints survive jax/flax upgrades (nested
dicts reconstruct from the paths alone). The optimizer state is stored the
same way; its (version-dependent) tree structure is NOT serialized — the
loader rebuilds it from ``opt_init(params)`` and refills the array leaves.
The best model (by validation loss) is mirrored into ``<ckp_dir>/best``
exactly like the reference, so downstream tooling finds the same layout.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Optional, Tuple

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _save_pytree(ckp_dir: str, pytree, name: str) -> None:
    flat = jax.tree_util.tree_flatten_with_path(pytree)[0]
    arrays = {_path_str(path): np.asarray(x) for path, x in flat}
    assert len(arrays) == len(flat), "duplicate leaf paths in pytree"
    np.savez(os.path.join(ckp_dir, f"{name}.npz"), **arrays)


def _unflatten_paths(flat: dict):
    out: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def _load_pytree(ckp_dir: str, name: str):
    legacy_tree = os.path.join(ckp_dir, f"{name}_tree.pkl")
    with np.load(os.path.join(ckp_dir, f"{name}.npz")) as data:
        if os.path.exists(legacy_tree):  # round-1 layout: leaf_i + treedef
            with open(legacy_tree, "rb") as f:
                treedef = pickle.load(f)
            leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
            return jax.tree.unflatten(treedef, leaves)
        return _unflatten_paths({k: data[k] for k in data.files})


class OptStateLeaves:
    """Array leaves of a saved optimizer state, awaiting a tree skeleton.

    ``restore(opt_init(params))`` refills the freshly-built optax state with
    the saved arrays — robust to optax moving/renaming its state classes.
    """

    def __init__(self, leaves):
        self.leaves = list(leaves)

    def restore(self, opt_state_skeleton):
        treedef = jax.tree.structure(opt_state_skeleton)
        assert treedef.num_leaves == len(self.leaves), (
            f"optimizer state has {treedef.num_leaves} leaves, checkpoint "
            f"stored {len(self.leaves)} — optimizer config changed?"
        )
        skel = jax.tree.leaves(opt_state_skeleton)
        leaves = []
        for i, (saved, ref) in enumerate(zip(self.leaves, skel)):
            ref = np.asarray(ref)
            saved = np.asarray(saved, dtype=ref.dtype)
            assert saved.shape == ref.shape, (
                f"optimizer-state leaf {i} has shape {saved.shape}, the "
                f"rebuilt skeleton expects {ref.shape} — parameter layout "
                f"changed since the checkpoint?"
            )
            leaves.append(saved)
        return jax.tree.unflatten(treedef, leaves)


def save_checkpoint(ckp_dir: str, params, state, opt_state, metadata_ckp) -> None:
    """Save params/state/opt_state + metadata; track the best model."""
    os.makedirs(ckp_dir, exist_ok=True)
    params = jax.device_get(params)
    state = jax.device_get(state)
    opt_state = jax.device_get(opt_state)

    _save_pytree(ckp_dir, params, "params")
    _save_pytree(ckp_dir, state, "state")
    if opt_state is not None:
        leaves = jax.tree.leaves(opt_state)
        np.savez(
            os.path.join(ckp_dir, "opt_state.npz"),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
    with open(os.path.join(ckp_dir, "metadata_ckp.json"), "w") as f:
        json.dump(metadata_ckp, f)

    if os.path.basename(os.path.normpath(ckp_dir)) == "best":
        return

    # best-model shadow directory, updated when the validation loss improves
    best_dir = os.path.join(ckp_dir, "best")
    best_meta_path = os.path.join(best_dir, "metadata_ckp.json")
    tag = ""
    if os.path.exists(best_meta_path):
        with open(best_meta_path, "r") as f:
            best_meta = json.loads(f.read())
        if (
            metadata_ckp.get("loss") is not None
            and best_meta.get("loss") is not None
            and metadata_ckp["loss"] < best_meta["loss"]
        ):
            save_checkpoint(best_dir, params, state, opt_state, metadata_ckp)
            tag = " (best so far)"
    else:
        save_checkpoint(best_dir, params, state, opt_state, metadata_ckp)

    print(
        f"saved model to {ckp_dir} at step {metadata_ckp['step']}"
        f" with loss {metadata_ckp.get('loss')}{tag}"
    )


def load_checkpoint(
    ckp_dir: str,
) -> Tuple[dict, dict, Optional[OptStateLeaves], int]:
    """Load (params, state, opt_state, step) from a checkpoint directory.

    ``opt_state`` comes back as :class:`OptStateLeaves` (call
    ``.restore(opt_init(params))``), a legacy pickled optax state for
    round-1 checkpoints, or ``None`` if the checkpoint has no optimizer.
    """
    params = _load_pytree(ckp_dir, "params")
    state = _load_pytree(ckp_dir, "state")
    opt_state = None
    opt_npz = os.path.join(ckp_dir, "opt_state.npz")
    opt_pkl = os.path.join(ckp_dir, "opt_state.pkl")
    if os.path.exists(opt_npz):
        with np.load(opt_npz) as data:
            opt_state = OptStateLeaves(
                data[f"leaf_{i}"] for i in range(len(data.files))
            )
    elif os.path.exists(opt_pkl):  # round-1 layout
        with open(opt_pkl, "rb") as f:
            opt_state = pickle.load(f)
    with open(os.path.join(ckp_dir, "metadata_ckp.json"), "r") as f:
        metadata_ckp = json.loads(f.read())
    print(f"Loaded model from {ckp_dir} at step {metadata_ckp['step']}")
    return params, state, opt_state, metadata_ckp["step"]
