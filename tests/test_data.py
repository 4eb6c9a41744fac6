"""Data layer: dataset loading, pairing, scaling, loader batching."""

import numpy as np

from sr3_tpu.data import LRHRDataset, create_dataloader
import pytest

pytestmark = pytest.mark.quick


def test_dataset_img_mode(fixture_root):
    ds = LRHRDataset(fixture_root, "img", 16, 128, split="val", need_LR=True)
    assert len(ds) == 6
    item = ds[0]
    assert set(item) == {"LR", "HR", "SR", "Index"}
    assert item["HR"].shape == (128, 128, 3)
    assert item["SR"].shape == (128, 128, 3)
    assert item["LR"].shape == (16, 16, 3)
    for k in ("LR", "HR", "SR"):
        assert item[k].dtype == np.float32
        assert item[k].min() >= -1.0 and item[k].max() <= 1.0
    assert item["HR"].max() > 0  # actually scaled, not all -1


def test_dataset_data_len_truncation(fixture_root):
    ds = LRHRDataset(fixture_root, "img", 16, 128, data_len=2)
    assert len(ds) == 2


def test_dataset_no_lr(fixture_root):
    ds = LRHRDataset(fixture_root, "img", 16, 128, need_LR=False)
    assert set(ds[0]) == {"HR", "SR", "Index"}


def test_train_flip_is_paired(fixture_root):
    # over many draws, whenever SR is flipped HR must be flipped too
    ds = LRHRDataset(fixture_root, "img", 16, 128, split="train", need_LR=False)
    base = LRHRDataset(fixture_root, "img", 16, 128, split="val", need_LR=False)
    ref = base[0]
    flipped_seen = unflipped_seen = 0
    for _ in range(20):
        item = ds[0]
        sr_flipped = np.allclose(item["SR"], ref["SR"][:, ::-1, :])
        hr_flipped = np.allclose(item["HR"], ref["HR"][:, ::-1, :])
        sr_same = np.allclose(item["SR"], ref["SR"])
        assert sr_flipped == hr_flipped  # joint flip
        assert sr_flipped or sr_same
        flipped_seen += sr_flipped
        unflipped_seen += sr_same
    assert flipped_seen > 0 and unflipped_seen > 0


def test_loader_batching(fixture_root):
    ds = LRHRDataset(fixture_root, "img", 16, 128, split="train", need_LR=False)
    opt = {"batch_size": 4, "use_shuffle": True, "num_workers": 2}
    loader = create_dataloader(ds, opt, "train")
    batches = list(loader)
    assert len(batches) == 1  # 6 items, batch 4, drop_last
    b = batches[0]
    assert b["HR"].shape == (4, 128, 128, 3)
    assert b["SR"].shape == (4, 128, 128, 3)
    assert b["Index"].shape == (4,)


def test_val_loader_batch_one(fixture_root):
    ds = LRHRDataset(fixture_root, "img", 16, 128, split="val", need_LR=True)
    loader = create_dataloader(ds, {}, "val")
    batches = list(loader)
    assert len(batches) == 6
    assert batches[0]["HR"].shape == (1, 128, 128, 3)


def test_loader_shuffle_determinism(fixture_root):
    ds = LRHRDataset(fixture_root, "img", 16, 128, split="val", need_LR=False)
    l1 = create_dataloader(ds, {"batch_size": 2, "use_shuffle": True,
                                "num_workers": 0}, "train")
    l2 = create_dataloader(ds, {"batch_size": 2, "use_shuffle": True,
                                "num_workers": 0}, "train")
    i1 = [b["Index"].tolist() for b in l1]
    i2 = [b["Index"].tolist() for b in l2]
    assert i1 == i2  # same seed -> same order


def test_native_collate_matches_numpy_path(fixture_root):
    from sr3_tpu.data.loader import DataLoader

    ds = LRHRDataset(fixture_root, "img", 16, 128, split="val", need_LR=True)
    ln = DataLoader(ds, batch_size=2, use_native=True)
    lp = DataLoader(ds, batch_size=2, use_native=False)
    if not ln.use_native:
        import pytest

        pytest.skip("native lib unavailable")
    for bn, bp in zip(ln, lp):
        for k in ("LR", "SR", "HR"):
            np.testing.assert_allclose(bn[k], bp[k], atol=1e-6)
        np.testing.assert_array_equal(bn["Index"], bp["Index"])


def test_transforms_module():
    import random

    from sr3_tpu.data import transforms as T

    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (8, 12, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (8, 12, 3)).astype(np.uint8)

    # val split: identity
    out = T.augment([a, b], split="val")
    np.testing.assert_array_equal(out[0], a)

    # train split: flips are joint across the list
    random.seed(0)
    for _ in range(10):
        oa, ob = T.augment([a.copy(), b.copy()], split="train")
        flipped_a = np.array_equal(oa[:, :, :], a[:, ::-1, :]) or \
            np.array_equal(oa, a) or oa.shape != a.shape
        assert oa.shape in ((8, 12, 3), (12, 8, 3))
        assert oa.shape == ob.shape  # joint transform

    x = T.transform2numpy(a)
    assert x.dtype == np.float32 and x.max() <= 1.0
    y = T.transform_augment([a, b], split="val", min_max=(-1, 1))
    assert y[0].min() >= -1.0 and y[0].max() <= 1.0


def test_native_decode_path_matches_pil(fixture_root):
    from sr3_tpu.data.loader import DataLoader
    from sr3_tpu.data.native import get_decode_lib

    if get_decode_lib() is None:
        import pytest

        pytest.skip("native decoder unavailable")
    ds = LRHRDataset(fixture_root, "img", 16, 128, split="val", need_LR=True)
    ld = DataLoader(ds, batch_size=3, use_native=True)
    lp = DataLoader(ds, batch_size=3, use_native=False)
    assert ld.use_native_decode
    for bd, bp in zip(ld, lp):
        for k in ("LR", "SR", "HR"):
            np.testing.assert_allclose(bd[k], bp[k], atol=1e-6)


def test_native_decode_fallback_on_non_png(tmp_path):
    from PIL import Image

    from sr3_tpu.data.loader import DataLoader

    # build a jpg-based dataset: bytes path must demote gracefully
    rng = np.random.default_rng(0)
    for sub, size in (("lr_8", 8), ("hr_16", 16), ("sr_8_16", 16)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            ).save(d / f"{i}.jpg", quality=95)
    ds = LRHRDataset(str(tmp_path), "img", 8, 16, split="val", need_LR=False)
    loader = DataLoader(ds, batch_size=2, use_native=True)
    batches = list(loader)
    assert batches[0]["HR"].shape == (2, 16, 16, 3)
    assert not loader.use_native_decode  # demoted after first non-png


def test_device_prefetch(fixture_root):
    from sr3_tpu.data.loader import DataLoader
    from sr3_tpu.data.prefetch import device_prefetch
    from sr3_tpu.parallel.mesh import create_mesh

    ds = LRHRDataset(fixture_root, "img", 16, 128, split="val", need_LR=False)
    loader = DataLoader(ds, batch_size=2)
    mesh = create_mesh(num_data=1)
    batches = list(device_prefetch(loader, mesh))
    assert len(batches) == 3
    import jax

    assert isinstance(batches[0]["HR"], jax.Array)
    assert batches[0]["HR"].shape == (2, 128, 128, 3)
    # plain loader values preserved
    assert batches[0]["Index"].shape == (2,)


def test_producer_exception_propagates(fixture_root):
    """A crash inside the producer thread must surface in the consumer
    instead of hanging it forever on q.get() (ADVICE round-1)."""
    from sr3_tpu.data.loader import DataLoader

    class Corrupt(LRHRDataset):
        def get_raw(self, i):
            if int(i) == 1:
                raise RuntimeError("corrupt sample")
            return super().get_raw(i)

        def __getitem__(self, i):
            if int(i) == 1:
                raise RuntimeError("corrupt sample")
            return super().__getitem__(i)

        def get_raw_bytes(self, i):
            if int(i) == 1:
                raise RuntimeError("corrupt sample")
            return super().get_raw_bytes(i)

    ds = Corrupt(fixture_root, "img", 16, 128, split="val", need_LR=False)
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    import pytest

    with pytest.raises(RuntimeError, match="corrupt sample"):
        list(loader)


def test_demotion_is_batch_atomic(tmp_path):
    """When only SOME samples of a batch can serve compressed bytes, the
    whole batch must be re-fetched in the demoted mode — never collated
    from mixed bytes/array samples (ADVICE round-1: short-buffer read)."""
    import io

    from PIL import Image

    from sr3_tpu.data.loader import DataLoader

    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
            for _ in range(4)]

    class Mixed:
        min_max = (-1, 1)
        key_resolutions = {"HR": (8, 8)}

        def __len__(self):
            return 4

        def __getitem__(self, i):
            x = imgs[int(i)].astype(np.float32) / 255.0 * 2 - 1
            return {"HR": x, "Index": int(i)}

        def get_raw(self, i):
            return {"HR": imgs[int(i)], "flip": False, "Index": int(i)}

        def get_raw_bytes(self, i):
            if int(i) % 2 == 1:
                return None  # odd items can't serve bytes
            buf = io.BytesIO()
            Image.fromarray(imgs[int(i)]).save(buf, format="PNG")
            return {"HR": buf.getvalue(), "flip": False, "Index": int(i)}

    ds = Mixed()
    loader = DataLoader(ds, batch_size=2, use_native=True)
    ref = DataLoader(ds, batch_size=2, use_native=False)
    for got, want in zip(loader, ref):
        assert got["HR"].dtype == np.float32
        np.testing.assert_allclose(got["HR"], want["HR"], atol=1e-6)
    assert not loader.use_native_decode  # demoted on the first mixed batch


def test_decoded_cache(fixture_root, monkeypatch):
    """Small datasets auto-cache decoded uint8 samples: each image is
    decoded once across epochs, outputs are unchanged, and the bytes fast
    path is disabled (decode-once beats native re-decode per epoch)."""
    ds = LRHRDataset(fixture_root, "img", 16, 128, split="val", need_LR=True)
    assert ds._cache is not None  # 6 fixture triplets -> auto-on
    assert ds.get_raw_bytes(0) is None

    opens = []
    orig = LRHRDataset._open
    monkeypatch.setattr(
        LRHRDataset, "_open",
        lambda self, i: opens.append(i) or orig(self, i),
    )
    first = ds[0]
    again = ds[0]
    assert opens == [0]
    np.testing.assert_array_equal(first["HR"], again["HR"])

    off = LRHRDataset(fixture_root, "img", 16, 128, split="val",
                      need_LR=True, cache=False)
    assert off._cache is None
    assert off.get_raw_bytes(0) is not None
    np.testing.assert_allclose(off[0]["HR"], first["HR"], atol=1e-6)
