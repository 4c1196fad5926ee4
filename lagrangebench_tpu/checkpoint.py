"""Checkpointing: flat-array streams + JSON metadata + best-model shadow dir.

Dependency-light replacement for the reference's save/load_haiku
(reference lagrangebench/utils.py:50-128): parameter/state pytrees are stored
as ``.npz`` leaf archives with a pickled treedef, the optimizer state with
standard pickle (optax states are module-level NamedTuples). The best model
(by validation loss) is mirrored into ``<ckp_dir>/best`` exactly like the
reference, so downstream tooling finds the same layout.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Tuple

import jax
import numpy as np


def _save_pytree(ckp_dir: str, pytree, name: str) -> None:
    leaves, treedef = jax.tree.flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(os.path.join(ckp_dir, f"{name}.npz"), **arrays)
    with open(os.path.join(ckp_dir, f"{name}_tree.pkl"), "wb") as f:
        pickle.dump(treedef, f)


def _load_pytree(ckp_dir: str, name: str):
    with open(os.path.join(ckp_dir, f"{name}_tree.pkl"), "rb") as f:
        treedef = pickle.load(f)
    with np.load(os.path.join(ckp_dir, f"{name}.npz")) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    return jax.tree.unflatten(treedef, leaves)


def save_checkpoint(ckp_dir: str, params, state, opt_state, metadata_ckp) -> None:
    """Save params/state/opt_state + metadata; track the best model."""
    os.makedirs(ckp_dir, exist_ok=True)
    params = jax.device_get(params)
    state = jax.device_get(state)
    opt_state = jax.device_get(opt_state)

    _save_pytree(ckp_dir, params, "params")
    _save_pytree(ckp_dir, state, "state")
    with open(os.path.join(ckp_dir, "opt_state.pkl"), "wb") as f:
        pickle.dump(opt_state, f)
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


def load_checkpoint(ckp_dir: str) -> Tuple[dict, dict, object, int]:
    """Load (params, state, opt_state, step) from a checkpoint directory."""
    params = _load_pytree(ckp_dir, "params")
    state = _load_pytree(ckp_dir, "state")
    opt_path = os.path.join(ckp_dir, "opt_state.pkl")
    opt_state = None
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = pickle.load(f)
    with open(os.path.join(ckp_dir, "metadata_ckp.json"), "r") as f:
        metadata_ckp = json.loads(f.read())
    print(f"Loaded model from {ckp_dir} at step {metadata_ckp['step']}")
    return params, state, opt_state, metadata_ckp["step"]
