"""Native-uint8 device-cache decode protocol (load_item_u8).

The device cache previously decoded every item to fp32, stacked, then
converted back to uint8 when integral — ~4x the payload in 1-core host
memory traffic (130 s at the 2×256-volume OCT bench fixture).  The
``load_item_u8`` fast path must be BIT-IDENTICAL to that round trip.
"""

import numpy as np
import pytest

from fairfedmed_tpu.data.datasets.fairfedmed import FairFedMedDataset
from fairfedmed_tpu.fed.parallel_driver import ParallelRoundRunner
from tests.fixtures import make_fairfedmed_fixture


pytestmark = pytest.mark.smoke


def _runner():
    r = object.__new__(ParallelRoundRunner)
    r._cache_budget = 1 << 30
    r._cached_bytes = 0
    return r


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ffm_u8")
    make_fairfedmed_fixture(str(root), n_sites=1, n_train=5, n_test=3,
                            size=24, oct_depth=8, oct_hw=24)
    return str(root / "fairfedmed")


def _ds(fixture_root, modality, res=24):
    return FairFedMedDataset(
        base_path=fixture_root, site=1, attribute_type="race",
        attributes=["gender", "race"], modality_type=modality,
        resolution=res, train=True)


@pytest.mark.parametrize("modality", ["slo_fundus", "oct_bscans", "oct_bscans_3d"])
def test_u8_matches_fp32_round_trip(fixture_root, modality):
    ds = _ds(fixture_root, modality)
    for i in range(len(ds)):
        f32, label, attrs = ds.load_item(i)
        u8 = ds.load_item_u8(i)
        assert u8 is not None
        img8, label8, attrs8 = u8
        assert img8.dtype == np.uint8
        np.testing.assert_array_equal(img8.astype(np.float32), f32)
        assert label8 == label
        np.testing.assert_array_equal(attrs8, attrs)


def test_u8_declines_on_resize(fixture_root):
    # fixture pixels are 24x24; a 32-pixel target needs float interpolation
    ds = _ds(fixture_root, "slo_fundus", res=32)
    assert ds.load_item_u8(0) is None
    img, _, _ = ds.load_item(0)  # the slow path still serves it
    assert img.shape[-1] == 32


def test_u8_declines_on_float_modality(fixture_root):
    ds = _ds(fixture_root, "rnflt")
    assert ds.load_item_u8(0) is None


def test_decode_loader_prefers_u8_protocol(fixture_root):
    class _Loader:
        transform = None
        sampler = None

        def __init__(self, ds):
            self.dataset = ds

    ds = _ds(fixture_root, "oct_bscans")
    imgs, labels, attrs = _runner()._decode_loader(_Loader(ds))
    assert imgs.dtype == np.uint8
    # bit-identical to the fp32 decode of every item
    ref = np.stack([ds.load_item(i)[0] for i in range(len(ds))])
    np.testing.assert_array_equal(imgs.astype(np.float32), ref)
    np.testing.assert_array_equal(
        labels, np.asarray([ds.load_item(i)[1] for i in range(len(ds))]))


def test_decode_loader_u8_respects_budget(fixture_root):
    class _Loader:
        transform = None
        sampler = None

        def __init__(self, ds):
            self.dataset = ds

    ds = _ds(fixture_root, "oct_bscans")
    r = _runner()
    r._cache_budget = 10  # smaller than one uint8 item
    assert r._decode_loader(_Loader(ds)) is None


class _Loader:
    transform = None
    sampler = None

    def __init__(self, ds):
        self.dataset = ds


def test_decode_loader_falls_back_on_heterogeneous_u8(fixture_root):
    """A set where load_item_u8 works for a prefix but not a later item must
    still cache via the fp32 path (it cached fine before the u8 protocol) —
    and must REUSE the already-decoded u8 prefix rather than re-decoding it
    (the prefetch tickets for consumed items are gone, so a restart re-reads
    the NPZ files: up to double the decode the fast path exists to avoid)."""
    inner = _ds(fixture_root, "oct_bscans")
    break_at = 2
    fp32_calls = []

    class Hetero:
        def __len__(self):
            return len(inner)

        def load_item(self, i):
            fp32_calls.append(i)
            return inner.load_item(i)

        def load_item_u8(self, i):
            return inner.load_item_u8(i) if i < break_at else None

    imgs, labels, attrs = _runner()._decode_loader(_Loader(Hetero()))
    assert imgs is not None
    # the u8 prefix [0, break_at) is reused, not re-decoded via load_item
    assert fp32_calls == list(range(break_at, len(inner)))
    # fp32 decode is integral here, so the cache still stores uint8 — but
    # crucially it exists, with values identical to the per-item fp32 decode
    ref = np.stack([inner.load_item(i)[0] for i in range(len(inner))])
    np.testing.assert_array_equal(np.asarray(imgs, np.float32), ref)
    np.testing.assert_array_equal(
        labels, np.asarray([inner.load_item(i)[1] for i in range(len(inner))]))


def test_decode_loader_budget_counts_stored_u8_size(fixture_root):
    """Without the u8 protocol, an integral-pixel set is STORED as uint8 —
    the budget must admit it whenever the uint8 footprint fits, even though
    the transient fp32 decode is 4x larger."""
    inner = _ds(fixture_root, "oct_bscans")

    class NoU8:
        def __len__(self):
            return len(inner)

        def load_item(self, i):
            return inner.load_item(i)

    n = len(inner)
    u8_bytes = inner.load_item_u8(0)[0].nbytes * n
    r = _runner()
    # budget admits the uint8 footprint but NOT the fp32 decode size
    r._cache_budget = u8_bytes * 2
    assert u8_bytes * 2 < u8_bytes * 4
    imgs, labels, attrs = r._decode_loader(_Loader(NoU8()))
    assert imgs.dtype == np.uint8
    assert imgs.nbytes <= r._cache_budget
