"""Native C++ NPZ loader + prefetch pool (fairfedmed_tpu/native/)."""

import os

import numpy as np
import pytest

from fairfedmed_tpu.native import NpzReader, PrefetchPool, native_available


@pytest.fixture(scope="module")
def npz_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npz")
    rng = np.random.default_rng(0)
    arrays = {
        "f32": rng.random((7, 33, 5)).astype(np.float32),
        "f64": rng.random((4,)).astype(np.float64),
        "i64": rng.integers(-5, 5, (3, 2)).astype(np.int64),
        "u8": (rng.random((16, 16)) * 255).astype(np.uint8),
        "scalar": np.float32(3.5),
        "boolean": np.bool_(True),
    }
    stored = str(d / "stored.npz")
    compressed = str(d / "compressed.npz")
    np.savez(stored, **arrays)
    np.savez_compressed(compressed, **arrays)
    return stored, compressed, arrays


def test_native_builds():
    assert native_available(), "g++/zlib are in the image; native must build"


@pytest.mark.parametrize("which", [0, 1], ids=["stored", "deflate"])
def test_reader_roundtrip(npz_files, which):
    path, arrays = npz_files[which], npz_files[2]
    with NpzReader(path) as r:
        assert set(r.keys()) == set(arrays)
        for name, ref in arrays.items():
            got = r.get(name)
            assert got.dtype == np.asarray(ref).dtype
            np.testing.assert_array_equal(got, ref)


def test_reader_missing_member(npz_files):
    with NpzReader(npz_files[0]) as r:
        with pytest.raises(KeyError):
            r.get("nope")


def test_prefetch_pool(npz_files):
    stored, compressed, arrays = npz_files
    pool = PrefetchPool(2)
    tickets = []
    for _ in range(3):
        tickets.append((pool.submit(stored, "f32"), arrays["f32"]))
        tickets.append((pool.submit(compressed, "u8"), arrays["u8"]))
    for t, ref in tickets:
        np.testing.assert_array_equal(pool.collect(t), ref)
    pool.close()


def _open_fd_count():
    return len(os.listdir("/proc/self/fd"))


def test_pool_fd_cache_is_bounded(tmp_path):
    """One NPZ per sample (the FairFedMed layout) must not leak one fd per
    file: the pool's open-file cache is a bounded LRU."""
    pool = PrefetchPool(1)
    if not pool.native:
        pytest.skip("native library unavailable")
    n_files = 80  # above the 64-entry LRU cap
    arr = np.arange(6, dtype=np.float32)
    paths = []
    for i in range(n_files):
        p = str(tmp_path / f"s{i}.npz")
        np.savez(p, x=arr)
        paths.append(p)
    before = _open_fd_count()
    for p in paths:
        t = pool.submit(p, "x")
        np.testing.assert_array_equal(pool.collect(t), arr)
    after = _open_fd_count()
    assert after - before <= 66, f"fd growth {after - before} exceeds LRU cap"
    pool.close()


def test_pool_discard(npz_files):
    stored, _, arrays = npz_files
    pool = PrefetchPool(2)
    if not pool.native:
        pytest.skip("native library unavailable")
    t1 = pool.submit(stored, "f32")
    t2 = pool.submit(stored, "u8")
    pool.discard(t1)
    # discarded ticket is gone; the other still collects fine
    with pytest.raises(IOError):
        pool.collect(t1)
    np.testing.assert_array_equal(pool.collect(t2), arrays["u8"])
    pool.close()


def test_clear_prefetch_drops_tickets(tmp_path):
    from tests.fixtures import make_fairfedmed_fixture
    from fairfedmed_tpu.data.datasets.fairfedmed import FairFedMedDataset

    make_fairfedmed_fixture(str(tmp_path), n_sites=1, n_train=6, n_test=4, size=24)
    ds = FairFedMedDataset(
        base_path=str(tmp_path / "fairfedmed"), site=1, attribute_type="race",
        attributes=["gender", "race"], modality_type="slo_fundus",
        resolution=24, train=True)
    ds.prefetch(range(len(ds)))
    assert len(ds._tickets) == len(ds)
    ds.clear_prefetch()
    assert len(ds._tickets) == 0
    # items still load through the non-prefetch path
    img, label, attrs = ds.load_item(0)
    assert img.shape[0] == 3


def test_fairfedmed_torn_index_cache_rebuilds(tmp_path):
    """A writer killed mid-dump (bench subprocess timeout, preemption) must
    never poison the shared fixture cache: a torn .index.json is rebuilt, and
    the rewrite publishes atomically (tmp + os.replace)."""
    import glob
    import json

    from tests.fixtures import make_fairfedmed_fixture
    from fairfedmed_tpu.data.datasets.fairfedmed import FairFedMedDataset

    make_fairfedmed_fixture(str(tmp_path), n_sites=1, n_train=6, n_test=4, size=24)
    kw = dict(base_path=str(tmp_path / "fairfedmed"), site=1,
              attribute_type="race", attributes=["gender", "race"],
              modality_type="slo_fundus", resolution=24, train=True)
    ds = FairFedMedDataset(**kw)
    caches = glob.glob(str(tmp_path / "fairfedmed" / "*.index.json"))
    assert caches, "index cache was not written"
    with open(caches[0], "w") as f:
        f.write('{"torn": ')  # truncated JSON: simulates a killed writer
    ds2 = FairFedMedDataset(**kw)  # must rebuild, not raise
    assert len(ds2) == len(ds)
    with open(caches[0]) as f:
        rebuilt = json.load(f)  # and the cache is valid JSON again
    assert "__attr_keys__" in rebuilt
    assert not glob.glob(str(tmp_path / "fairfedmed" / "*.tmp"))


def test_fairfedmed_index_cache_rebuilds_on_npz_change(tmp_path):
    """Regenerated NPZs under the SAME filenames (re-downloaded dataset,
    corrected labels) must invalidate the metadata index cache: entries
    carry the NPZ mtime and a mismatch triggers a rebuild."""
    import glob
    import os

    from tests.fixtures import make_fairfedmed_fixture
    from fairfedmed_tpu.data.datasets.fairfedmed import FairFedMedDataset

    make_fairfedmed_fixture(str(tmp_path), n_sites=1, n_train=6, n_test=4, size=24)
    kw = dict(base_path=str(tmp_path / "fairfedmed"), site=1,
              attribute_type="race", attributes=["gender", "race"],
              modality_type="slo_fundus", resolution=24, train=True)
    ds = FairFedMedDataset(**kw)
    target = os.path.join(str(tmp_path / "fairfedmed"), "all", ds.data_files[0])
    raw = dict(np.load(target, allow_pickle=True))
    raw["glaucoma"] = np.asarray(1 - int(raw["glaucoma"]))
    np.savez(target, **raw)
    os.utime(target, (os.path.getmtime(target) + 5,) * 2)
    ds2 = FairFedMedDataset(**kw)
    assert int(ds2.labels[0]) == 1 - int(ds.labels[0])


def test_fairfedmed_unknown_modality_raises():
    """Fail fast like the reference (data_utils.py:608-609) instead of
    silently filtering every row out."""
    import pytest

    from fairfedmed_tpu.data.datasets.fairfedmed import FairFedMedDataset

    with pytest.raises(NotImplementedError, match="slo_fundos"):
        FairFedMedDataset(
            base_path="/nonexistent", site=1, attribute_type="race",
            attributes=["race"], modality_type="slo_fundos")


def test_fairfedmed_prefetch_path(tmp_path):
    from tests.fixtures import make_fairfedmed_fixture
    from fairfedmed_tpu.data.datasets.fairfedmed import FairFedMedDataset

    make_fairfedmed_fixture(str(tmp_path), n_sites=1, n_train=6, n_test=4, size=24)
    ds = FairFedMedDataset(
        base_path=str(tmp_path / "fairfedmed"), site=1, attribute_type="race",
        attributes=["gender", "race"], modality_type="slo_fundus",
        resolution=24, train=True)
    direct = [ds.load_item(i) for i in range(len(ds))]
    ds2 = FairFedMedDataset(
        base_path=str(tmp_path / "fairfedmed"), site=1, attribute_type="race",
        attributes=["gender", "race"], modality_type="slo_fundus",
        resolution=24, train=True)
    ds2.prefetch(range(len(ds2)))
    for i, (img, label, attrs) in enumerate(direct):
        img2, label2, attrs2 = ds2.load_item(i)
        np.testing.assert_array_equal(img, img2)
        assert label == label2
        np.testing.assert_array_equal(attrs, attrs2)


def test_native_jpeg_decode_matches_pil(tmp_path):
    """Native libjpeg grayscale decode + bilinear resize vs the PIL+cv2
    fallback path: exact pixels for grayscale sources at native size, ~1/255
    tolerance after resize (cv2 uses fixed-point bilinear)."""
    import cv2
    from PIL import Image

    from fairfedmed_tpu.native import decode_jpeg_gray, jpeg_available

    if not jpeg_available():
        pytest.skip("JPEG-enabled native build unavailable")
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (96, 80))).astype(np.uint8)
    p = str(tmp_path / "xray.jpg")
    Image.fromarray(img, mode="L").save(p, quality=92)

    pil = np.array(Image.open(p).convert("L"), np.float32)
    got = decode_jpeg_gray(p, 64)
    want = cv2.resize(pil, (64, 64), interpolation=cv2.INTER_LINEAR)
    assert got is not None and got.shape == (64, 64)
    np.testing.assert_allclose(got, want, atol=1.5)

    # native-size decode (no resize): bit-exact — PIL uses the same libjpeg
    sq = (rng.uniform(0, 255, (64, 64))).astype(np.uint8)
    p2 = str(tmp_path / "sq.jpg")
    Image.fromarray(sq, mode="L").save(p2, quality=92)
    np.testing.assert_array_equal(
        decode_jpeg_gray(p2, 64),
        np.array(Image.open(p2).convert("L"), np.float32))


def test_jpeg_prefetch_pool_roundtrip(tmp_path):
    from PIL import Image

    from fairfedmed_tpu.native import PrefetchPool, decode_jpeg_gray, jpeg_available

    rng = np.random.default_rng(1)
    paths = []
    for i in range(4):
        img = (rng.uniform(0, 255, (50, 40))).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(img, mode="L").save(p, quality=95)
        paths.append(p)

    pool = PrefetchPool(n_threads=2)
    if not pool.supports_jpeg:
        pytest.skip("JPEG-enabled native build unavailable")
    tickets = [pool.submit_jpeg(p, 32) for p in paths]
    outs = [pool.collect(t) for t in tickets]
    for p, arr in zip(paths, outs):
        assert arr.shape == (32, 32) and arr.dtype == np.float32
        np.testing.assert_allclose(arr, decode_jpeg_gray(p, 32), atol=1e-5)
    # discard path: ticket dropped without collection must not error
    t = pool.submit_jpeg(paths[0], 32)
    pool.discard(t)
    assert jpeg_available()


def test_fedchexmimic_native_prefetch(tmp_path):
    """Dataset-level: prefetch -> load_item equals the direct decode path."""
    from tests.fixtures import make_fedchexmimic_fixture

    from fairfedmed_tpu.data.datasets.fedchexmimic import FedChexMimicDataset

    root = make_fedchexmimic_fixture(str(tmp_path), n_train=4, n_test=2, size=48)
    ds = FedChexMimicDataset(root, site=1, attribute_type="race",
                             attributes=["race", "gender", "age"],
                             resolution=48, train=True)
    direct = [ds.load_item(i) for i in range(len(ds))]
    ds.prefetch(range(len(ds)))
    fetched = [ds.load_item(i) for i in range(len(ds))]
    for (di, dl, da), (fi, fl, fa) in zip(direct, fetched):
        np.testing.assert_allclose(fi, di, atol=1.5)
        assert dl == fl and (da == fa).all()
    ds.prefetch(range(2))
    ds.clear_prefetch()  # interrupted-epoch drain must not raise


def test_fedchexmimic_prefetch_bad_file_falls_back(tmp_path):
    """A file libjpeg rejects (PNG saved as .jpg) must fall back to the PIL
    path on collect instead of aborting the epoch."""
    from PIL import Image

    from tests.fixtures import make_fedchexmimic_fixture

    from fairfedmed_tpu.data.datasets.fedchexmimic import FedChexMimicDataset

    root = make_fedchexmimic_fixture(str(tmp_path), n_train=2, n_test=1, size=32)
    ds = FedChexMimicDataset(root, site=1, attribute_type="race",
                             attributes=["race", "gender", "age"],
                             resolution=32, train=True)
    # overwrite sample 0 with a PNG wearing a .jpg extension
    bad = np.random.default_rng(0).integers(0, 255, (32, 32)).astype(np.uint8)
    import os as _os
    Image.fromarray(bad, mode="L").save(
        _os.path.join(ds.data_path, ds.data_files[0]), format="PNG")
    ds.prefetch(range(len(ds)))
    img, label, attrs = ds.load_item(0)  # must not raise
    assert img.shape == (3, 32, 32)
    np.testing.assert_allclose(img[0], bad.astype(np.float32), atol=1e-5)
