"""Execute the LMDB branches end-to-end through the in-tree fake backend
(VERDICT r04 missing #2 / next #2).

The production code paths under test are UNMODIFIED — ``data/lrhr.py``'s lmdb
branch (reference data/LRHR_dataset.py:18-27,52-86) and ``data/prepare.py``'s
``--lmdb`` sink (reference data/prepare_data.py:74-92) resolve ``import
lmdb`` from sys.modules, where these tests install ``sr3_tpu.data.fake_lmdb``
(the exact API surface: open/begin/get/put/stat, transactional commit).

Covered, per the verdict's list: the key scheme ``hr_{r}_{idx:05d}`` /
``sr_{l}_{r}_{idx:05d}`` / ``lr_{l}_{idx:05d}``, the ``length`` key,
resample-on-missing-key, ``data_len`` truncation, and the full
prepare --lmdb -> LRHRDataset -> loader round trip.
"""

import os
import random
import sys

import numpy as np
import pytest
from PIL import Image

from sr3_tpu.data import LRHRDataset, create_dataloader
from sr3_tpu.data import fake_lmdb
from sr3_tpu.data.prepare import prepare

pytestmark = pytest.mark.quick

L, R, N = 8, 16, 3


@pytest.fixture(autouse=True)
def inject_lmdb(monkeypatch):
    monkeypatch.setitem(sys.modules, "lmdb", fake_lmdb)


@pytest.fixture()
def lmdb_root(tmp_path):
    """prepare --lmdb over N tiny PNGs -> lmdb directory path."""
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(7)
    for i in range(N):
        arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(src / f"{i}.png")
    out = tmp_path / "celeba_lmdb"
    prepare(str(src), str(out), sizes=(L, R), lmdb_save=True)
    return str(out)


def test_prepare_lmdb_key_scheme(lmdb_root):
    env = fake_lmdb.open(lmdb_root, readonly=True)
    with env.begin(write=False) as txn:
        assert txn.get(b"length") == str(N).encode()
        for i in range(N):
            idx = str(i).zfill(5)
            for key in (f"hr_{R}_{idx}", f"sr_{L}_{R}_{idx}", f"lr_{L}_{idx}"):
                blob = txn.get(key.encode())
                assert blob is not None, key
                assert blob[:8] == b"\x89PNG\r\n\x1a\n", key  # real PNG bytes
        assert txn.stat()["entries"] == 3 * N + 1


def test_lmdb_dataset_roundtrip(lmdb_root):
    ds = LRHRDataset(lmdb_root, "lmdb", l_resolution=L, r_resolution=R,
                     split="val", need_LR=True)
    assert len(ds) == N
    item = ds[0]
    assert item["HR"].shape == (R, R, 3)
    assert item["SR"].shape == (R, R, 3)
    assert item["LR"].shape == (L, L, 3)
    assert item["Index"] == 0
    for k in ("HR", "SR", "LR"):
        assert item[k].dtype == np.float32
        assert item[k].min() >= -1.0 and item[k].max() <= 1.0
    # pixel-identity vs the img-mode pipeline is covered by decoding the
    # stored PNG directly: lmdb stores exactly what prepare resized
    env = fake_lmdb.open(lmdb_root, readonly=True)
    from io import BytesIO

    with env.begin(write=False) as txn:
        raw = txn.get(f"hr_{R}_00000".encode())
    ref = np.asarray(Image.open(BytesIO(raw)).convert("RGB"), np.float32)
    np.testing.assert_allclose(item["HR"], ref / 255.0 * 2.0 - 1.0, atol=1e-6)


def test_lmdb_length_key_and_data_len_truncation(lmdb_root):
    full = LRHRDataset(lmdb_root, "lmdb", l_resolution=L, r_resolution=R,
                       split="val", data_len=-1)
    assert len(full) == N == full.dataset_len  # from the b'length' key
    trunc = LRHRDataset(lmdb_root, "lmdb", l_resolution=L, r_resolution=R,
                        split="val", data_len=2)
    assert len(trunc) == 2
    over = LRHRDataset(lmdb_root, "lmdb", l_resolution=L, r_resolution=R,
                       split="val", data_len=99)
    assert len(over) == N  # min(data_len, dataset_len), reference :24-27


def test_lmdb_resample_on_missing_key(lmdb_root):
    # corrupt the db: drop index 1's HR record (reference resamples a random
    # valid index instead of failing, LRHR_dataset.py:67-82)
    env = fake_lmdb.open(lmdb_root)
    with env.begin(write=True) as txn:
        assert txn.delete(f"hr_{R}_00001".encode())
    ds = LRHRDataset(lmdb_root, "lmdb", l_resolution=L, r_resolution=R,
                     split="val", cache=False)
    valid = {i: ds[i]["HR"] for i in (0, 2)}
    random.seed(3)
    got = ds[1]["HR"]  # must come back as SOME valid sample, not raise
    assert any(np.array_equal(got, v) for v in valid.values())


def test_lmdb_get_raw_bytes_fast_path(lmdb_root):
    ds = LRHRDataset(lmdb_root, "lmdb", l_resolution=L, r_resolution=R,
                     split="val", need_LR=True, cache=False)
    raw = ds.get_raw_bytes(1)
    assert raw is not None and raw["Index"] == 1 and raw["flip"] is False
    from io import BytesIO

    assert np.asarray(Image.open(BytesIO(raw["HR"]))).shape == (R, R, 3)
    assert np.asarray(Image.open(BytesIO(raw["LR"]))).shape == (L, L, 3)
    # a missing key demotes to the resampling path (returns None)
    env = fake_lmdb.open(lmdb_root)
    with env.begin(write=True) as txn:
        txn.delete(f"sr_{L}_{R}_00001".encode())
    ds2 = LRHRDataset(lmdb_root, "lmdb", l_resolution=L, r_resolution=R,
                      split="val", cache=False)
    assert ds2.get_raw_bytes(1) is None


def test_lmdb_through_loader(lmdb_root):
    ds = LRHRDataset(lmdb_root, "lmdb", l_resolution=L, r_resolution=R,
                     split="train")
    loader = create_dataloader(
        ds, {"batch_size": 2, "use_shuffle": True, "num_workers": 0}, "train"
    )
    batch = next(iter(loader))
    assert batch["HR"].shape == (2, R, R, 3)
    assert batch["SR"].shape == (2, R, R, 3)
    assert batch["HR"].dtype == np.float32


def test_fake_lmdb_transactionality(tmp_path):
    """The fake must honor lmdb's abort-on-exception semantics, or it could
    mask bugs in code that relies on them."""
    path = str(tmp_path / "db")
    env = fake_lmdb.open(path)
    with env.begin(write=True) as txn:
        txn.put(b"a", b"1")
    with pytest.raises(RuntimeError):
        with env.begin(write=True) as txn:
            txn.put(b"b", b"2")
            raise RuntimeError("boom")
    reread = fake_lmdb.open(path, readonly=True)
    with reread.begin(write=False) as txn:
        assert txn.get(b"a") == b"1"
        assert txn.get(b"b") is None  # aborted txn never published
    with pytest.raises(PermissionError):
        reread.begin(write=True)
    with pytest.raises(FileNotFoundError):
        fake_lmdb.open(str(tmp_path / "missing"), readonly=True)
