"""HDF5 trajectory datasets.

Torch-free re-implementation of the reference data layer (reference
lagrangebench/data/data.py). The on-disk format is identical — a directory
with ``train.h5 / valid.h5 / test.h5`` (groups ``"00000"``.. each holding
``position`` of shape (num_steps, num_particles, dim) and ``particle_type``),
``metadata.json``, and optionally ``force.py`` defining an external force —
so all published LagrangeBench datasets load unchanged.

Train mode yields sliding windows of shape
``(num_particles, input_seq_length + 1 + extra_seq_length, dim)``; eval mode
splits each trajectory into ``seq_len // subseq_length`` chunks.

Padding to ``num_particles_max`` is applied for EVERY backend (the reference
only pads for matscipy) — static shapes are a hard requirement on TPU.
"""

from __future__ import annotations

import bisect
import importlib.util
import json
import os
import os.path as osp
import re
import warnings
import zipfile
from typing import Optional, Tuple

import h5py
import numpy as np

from ..utils import NodeType

ZENODO_PREFIX = "https://zenodo.org/records/10491868/files/"
URLS = {
    "tgv2d": f"{ZENODO_PREFIX}2D_TGV_2500_10kevery100.zip",
    "rpf2d": f"{ZENODO_PREFIX}2D_RPF_3200_20kevery100.zip",
    "ldc2d": f"{ZENODO_PREFIX}2D_LDC_2708_10kevery100.zip",
    "dam2d": f"{ZENODO_PREFIX}2D_DAM_5740_20kevery100.zip",
    "tgv3d": f"{ZENODO_PREFIX}3D_TGV_8000_10kevery100.zip",
    "rpf3d": f"{ZENODO_PREFIX}3D_RPF_8000_10kevery100.zip",
    "ldc3d": f"{ZENODO_PREFIX}3D_LDC_8160_10kevery100.zip",
}


def get_dataset_name_from_path(path: str) -> str:
    """Infer dataset short name from a LagrangeBench-convention directory."""
    dirname = osp.basename(osp.normpath(path))
    m = re.search(r"(?:2D|3D)_[A-Z]{3}", dirname)
    if m is not None:
        token = m.group(0)
        dims, case = token.split("_")
        return f"{case}{dims}".lower()
    warnings.warn(
        f"Dataset directory {dirname} does not follow the lagrangebench "
        "convention {2D|3D}_{TGV|RPF|LDC|DAM}; using the directory name."
    )
    return dirname


class H5Dataset:
    """Lazily-windowed HDF5 trajectory dataset.

    Args:
        split: "train", "valid" or "test".
        dataset_path: directory holding ``<split>.h5`` + ``metadata.json``.
            Downloaded from Zenodo if missing and the name is known.
        name: dataset short name; inferred from the path if None.
        input_seq_length: number of past positions the model sees. Train
            windows carry one extra frame for the target acceleration.
        extra_seq_length: max pushforward unrolls (train) or eval horizon.
        pad_to_max: pad particles to metadata["num_particles_max"] with
            NodeType.PAD_VALUE types (always recommended on TPU).
    """

    def __init__(
        self,
        split: str,
        dataset_path: str,
        name: Optional[str] = None,
        input_seq_length: int = 6,
        extra_seq_length: int = 0,
        pad_to_max: bool = True,
        nl_backend: str = "celllist",  # accepted for reference API compat
    ):
        dataset_path = osp.normpath(dataset_path)
        self.name = name if name is not None else get_dataset_name_from_path(dataset_path)

        if not osp.exists(dataset_path):
            dataset_path = self.download(self.name, dataset_path)

        assert split in ("train", "valid", "test")
        assert input_seq_length > 1, "input_seq_length must be >= 2 (one past velocity)"
        self.split = split
        self.dataset_path = dataset_path
        self.file_path = osp.join(dataset_path, split + ".h5")
        self.input_seq_length = input_seq_length
        self.nl_backend = nl_backend
        self.pad_to_max = pad_to_max

        self.external_force_fn = self._load_force_fn(dataset_path)

        with open(osp.join(dataset_path, "metadata.json"), "r") as f:
            self.metadata = json.loads(f.read())

        self._file: Optional[h5py.File] = None

        with h5py.File(self.file_path, "r") as f:
            self.traj_keys = sorted(f.keys())
            first = self.traj_keys[0]
            # (num_steps, num_particles, dim)
            self.sequence_length = f[f"{first}/position"].shape[0]

        if split == "train":
            # input window + 1 target frame + pushforward margin
            self.subseq_length = input_seq_length + 1 + extra_seq_length
            samples_per_traj = self.sequence_length - self.subseq_length + 1
            keylens = [samples_per_traj] * len(self.traj_keys)
            self._keylen_cumulative = list(np.cumsum(keylens))
            self.num_samples = int(sum(keylens))
            self.getter = self.get_window
        else:
            assert extra_seq_length > 0, (
                "extra_seq_length must be > 0 for validation and testing."
            )
            self.subseq_length = input_seq_length + extra_seq_length
            self._split_valid_traj_into_n = self.sequence_length // self.subseq_length
            self.num_samples = self._split_valid_traj_into_n * len(self.traj_keys)
            self.getter = self.get_trajectory

        assert self.sequence_length >= self.subseq_length, (
            f"trajectory length ({self.sequence_length}) must be >= subsequence "
            f"length ({self.subseq_length})"
        )

    # -- IO ------------------------------------------------------------------

    @staticmethod
    def _load_force_fn(dataset_path: str):
        """Load the dataset's external force function from force.py if any."""
        force_fn_path = osp.join(dataset_path, "force.py")
        if not osp.exists(force_fn_path):
            return None
        spec = importlib.util.spec_from_file_location("force_module", force_fn_path)
        force_module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(force_module)
        return force_module.force_fn

    def download(self, name: str, path: str) -> str:
        """Download and unzip a published dataset from Zenodo."""
        assert name in URLS, f"Dataset {name} not available for download."
        import urllib.request

        url = URLS[name]
        path = path.rstrip("/")
        path_root = osp.split(path)[0] or "."
        os.makedirs(path_root, exist_ok=True)
        filename = osp.join(path_root, osp.basename(url))
        print(f"Downloading {url} -> {filename}")
        urllib.request.urlretrieve(url, filename)
        zipfile.ZipFile(filename, "r").extractall(path_root)
        os.remove(filename)
        return path

    def _h5(self) -> h5py.File:
        if self._file is None:
            self._file = h5py.File(self.file_path, "r")
        return self._file

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None

    # -- sampling ------------------------------------------------------------

    def _pad(self, pos: np.ndarray, ptype: np.ndarray):
        n_max = self.metadata["num_particles_max"]
        padding = n_max - pos.shape[0]
        if padding <= 0:
            return pos, ptype
        pos = np.pad(pos, ((0, padding), (0, 0), (0, 0)), constant_values=0.0)
        ptype = np.pad(ptype, (0, padding), constant_values=NodeType.PAD_VALUE)
        return pos, ptype

    def get_trajectory(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Eval sample: one subsequence chunk, shape (N, subseq_length, dim)."""
        f = self._h5()
        if self._split_valid_traj_into_n > 1:
            traj_idx = idx // self._split_valid_traj_into_n
            slice_from = (idx % self._split_valid_traj_into_n) * self.subseq_length
            slice_to = slice_from + self.subseq_length
        else:
            traj_idx = idx
            slice_from, slice_to = 0, self.sequence_length

        traj = f[self.traj_keys[traj_idx]]
        pos = traj["position"][slice_from:slice_to].transpose((1, 0, 2))
        ptype = traj["particle_type"][:]
        if self.pad_to_max:
            pos, ptype = self._pad(pos, ptype)
        return pos, ptype

    def get_window(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Train sample: window of positions, shape (N, subseq_length, dim)."""
        traj_idx = bisect.bisect(self._keylen_cumulative, idx)
        el_idx = idx - (self._keylen_cumulative[traj_idx - 1] if traj_idx else 0)
        assert el_idx >= 0

        f = self._h5()
        traj = f[self.traj_keys[traj_idx]]
        pos = traj["position"][el_idx : el_idx + self.subseq_length]
        pos = pos.transpose((1, 0, 2))
        ptype = traj["particle_type"][:]
        if self.pad_to_max:
            pos, ptype = self._pad(pos, ptype)
        return pos, ptype

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.getter(idx)

    def __len__(self) -> int:
        return self.num_samples


def _named(name: str, default_dir: str):
    """Build a named dataset subclass bound to its default directory."""

    class _Named(H5Dataset):
        def __init__(
            self,
            split: str,
            dataset_path: str = default_dir,
            input_seq_length: int = 6,
            extra_seq_length: int = 0,
            pad_to_max: bool = True,
            nl_backend: str = "celllist",
        ):
            super().__init__(
                split,
                dataset_path,
                name=name,
                input_seq_length=input_seq_length,
                extra_seq_length=extra_seq_length,
                pad_to_max=pad_to_max,
                nl_backend=nl_backend,
            )

    _Named.__name__ = name.upper()
    _Named.__qualname__ = name.upper()
    return _Named


TGV2D = _named("tgv2d", "datasets/2D_TGV_2500_10kevery100")
TGV3D = _named("tgv3d", "datasets/3D_TGV_8000_10kevery100")
RPF2D = _named("rpf2d", "datasets/2D_RPF_3200_20kevery100")
RPF3D = _named("rpf3d", "datasets/3D_RPF_8000_10kevery100")
LDC2D = _named("ldc2d", "datasets/2D_LDC_2500_10kevery100")
LDC3D = _named("ldc3d", "datasets/3D_LDC_8160_10kevery100")
DAM2D = _named("dam2d", "datasets/2D_DB_5740_20kevery100")

TGV2D.__doc__ = "Taylor-Green Vortex 2D dataset (2.5K particles)."
TGV3D.__doc__ = "Taylor-Green Vortex 3D dataset (8K particles)."
RPF2D.__doc__ = "Reverse Poiseuille Flow 2D dataset (3.2K particles)."
RPF3D.__doc__ = "Reverse Poiseuille Flow 3D dataset (8K particles)."
LDC2D.__doc__ = "Lid-Driven Cavity 2D dataset (2.5K particles)."
LDC3D.__doc__ = "Lid-Driven Cavity 3D dataset (8.2K particles)."
DAM2D.__doc__ = "Dam break 2D dataset (5.7K particles)."
