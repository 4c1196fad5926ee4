"""Data layer: windowing, eval splitting, loader batching and shuffling."""

import numpy as np
import pytest

from lagrangebench_tpu.data import DataLoader, H5Dataset, cycle
from lagrangebench_tpu.data.dataset import get_dataset_name_from_path

from .fixtures import make_dataset


@pytest.fixture(scope="module")
def dataset_path(tmp_path_factory):
    return make_dataset(
        str(tmp_path_factory.mktemp("data")), seq_len_train=60, seq_len_eval=30
    )


def test_train_windows(dataset_path):
    isl, extra = 3, 1
    data = H5Dataset("train", dataset_path, input_seq_length=isl, extra_seq_length=extra)
    subseq = isl + 1 + extra
    assert data.subseq_length == subseq
    # 2 trajectories of length 60
    assert len(data) == 2 * (60 - subseq + 1)
    pos, ptype = data[0]
    assert pos.shape == (3, subseq, 3)
    assert ptype.shape == (3,)

    # windows slide by one step within a trajectory
    pos1, _ = data[1]
    np.testing.assert_allclose(pos[:, 1:], pos1[:, :-1])

    # second trajectory starts at index (60 - subseq + 1)
    pos_t2, _ = data[60 - subseq + 1]
    assert not np.allclose(pos[:, 0], pos_t2[:, 0])


def test_eval_chunks(dataset_path):
    isl, extra = 3, 7
    data = H5Dataset("valid", dataset_path, input_seq_length=isl, extra_seq_length=extra)
    assert data.subseq_length == 10
    assert len(data) == 2 * (30 // 10)
    pos, _ = data[0]
    assert pos.shape == (3, 10, 3)


def test_eval_requires_extra(dataset_path):
    with pytest.raises(AssertionError):
        H5Dataset("valid", dataset_path, input_seq_length=3, extra_seq_length=0)


def test_loader_batches(dataset_path):
    data = H5Dataset("train", dataset_path, input_seq_length=3, extra_seq_length=0)
    loader = DataLoader(data, batch_size=4, shuffle=True, drop_last=True,
                        rng=np.random.default_rng(0))
    batches = list(loader)
    assert len(batches) == len(data) // 4
    pos, ptype = batches[0]
    assert pos.shape == (4, 3, 4, 3)
    assert ptype.shape == (4, 3)

    # shuffling changes order between epochs
    first_epoch = np.asarray(batches[0][0])
    second_epoch = np.asarray(next(iter(loader))[0])
    assert not np.allclose(first_epoch, second_epoch)


def test_loader_cycle(dataset_path):
    data = H5Dataset("train", dataset_path, input_seq_length=3, extra_seq_length=0)
    loader = DataLoader(data, batch_size=16, drop_last=True)
    it = cycle(loader)
    for _ in range(2 * len(loader) + 1):
        batch = next(it)
    assert batch[0].shape[0] == 16


def test_name_inference():
    assert get_dataset_name_from_path("/x/2D_TGV_2500_10kevery100") == "tgv2d"
    assert get_dataset_name_from_path("datasets/3D_RPF_8000_10kevery100/") == "rpf3d"
    with pytest.warns(UserWarning):
        assert get_dataset_name_from_path("/x/custom_data") == "custom_data"


def test_zenodo_download_flow(tmp_path, monkeypatch):
    """A missing dataset dir triggers the Zenodo download+unzip flow
    (reference lagrangebench/data/data.py:150-175). Offline env: the URL
    fetch is mocked with a zip of the synthetic fixture; everything after
    the network call is real (zip extract, metadata read, windowing)."""
    import io
    import os
    import urllib.request
    import zipfile

    from lagrangebench_tpu.data.synthetic import make_synthetic_dataset
    import lagrangebench_tpu.data.dataset as dsmod

    src = make_synthetic_dataset(
        str(tmp_path / "src"), n_particles=8, dim=2, box=1.0,
        seq_len_train=12, seq_len_eval=10, n_trajs=2, name="TGV",
    )
    dirname = os.path.basename(src)

    def fake_retrieve(url, filename):
        assert url.startswith("https://zenodo.org/")
        with zipfile.ZipFile(filename, "w") as z:
            for f in os.listdir(src):
                z.write(os.path.join(src, f), arcname=f"{dirname}/{f}")

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    target = tmp_path / "dst" / dirname
    ds = dsmod.H5Dataset(
        "train", dataset_path=str(target), name="tgv2d", input_seq_length=3
    )
    assert len(ds) > 0
    pos, ptype = ds[0]
    assert pos.shape[0] == 8 and np.isfinite(np.asarray(pos)).all()
