"""Hardening behaviors pinned after the round-5 review pass.

Each test pins a failure mode found by review, not by a reference oracle:
the LR-schedule stall under variable-length sampler streams, the
reference-exact per-client checkpoint gate (Dassl trainer.py:497-521), the
attrs/batch alignment guard, and the native build lifecycle (atomic publish
+ negative-result stamp + cached-artifact fallback when g++ is missing).
"""

import os
import subprocess
import types

import numpy as np
import pytest

pytestmark = pytest.mark.smoke


# --------------------------------------------------------------- engine LR
class _ShortStreamLoader:
    """len() says 3 batches; iteration yields only 2 (a RandomDomainSampler
    whose frozen length overestimates this epoch's actual stream)."""

    def __init__(self, n_len=3, n_real=2):
        self.n_len, self.n_real = n_len, n_real

    def __len__(self):
        return self.n_len

    def __iter__(self):
        for i in range(self.n_real):
            yield {"img": np.zeros((2, 4, 4, 3), np.float32),
                   "label": np.zeros(2, np.int32), "n_valid": 2}


def _mk_trainer(n_len, n_real):
    from fairfedmed_tpu.train.engine import TrainerX
    from fairfedmed_tpu.train.optim import LRSchedule

    t = TrainerX.__new__(TrainerX)
    t.cfg = types.SimpleNamespace(
        TRAIN=types.SimpleNamespace(PRINT_FREQ=1000, PROFILE_DIR=""),
        OPTIM=types.SimpleNamespace(LR=0.1))
    t.epoch, t.max_epoch = 0, 1
    t.lr_sched = LRSchedule(0.1, "single_step", 1, 0.5, max_epoch=10)
    t._lr_steps = 0
    t._mode = "train"
    t.fed_train_loader_x_dict = {0: _ShortStreamLoader(n_len, n_real)}
    t._writer = None

    calls = []

    def forward_backward(batch):
        calls.append(1)
        # the trainers' shared last-batch gate (promptfl.py:204, glp_ot.py:659)
        if (t.batch_idx + 1) == t.num_batches:
            t.update_lr()
        return {"loss": 0.0}

    t.forward_backward = forward_backward
    t.set_model_mode = lambda mode="train": None
    return t, calls


def test_lr_steps_even_when_stream_ends_short():
    """num_batches = len(loader) is an estimate for structured samplers; an
    epoch whose actual stream is SHORTER must still advance the LR schedule
    exactly once (pre-fix: the last-batch gate never fired and the schedule
    silently froze for the rest of the run) — and push the new LR into a
    real optax opt_state (the import inside the fallback must resolve)."""
    import optax

    t, calls = _mk_trainer(n_len=3, n_real=2)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1)
    t.opt_state = tx.init({"w": np.zeros(2, np.float32)})
    t._run_epoch_inner(0, 0)
    assert sum(calls) == 2          # both real batches trained
    assert t._lr_steps == 1         # stepped once by the after-loop fallback
    from fairfedmed_tpu.train.optim import get_learning_rate

    np.testing.assert_allclose(get_learning_rate(t.opt_state),
                               t.lr_sched.lr(1))


def test_lr_steps_once_when_stream_matches():
    t, calls = _mk_trainer(n_len=2, n_real=2)
    t._run_epoch_inner(0, 0)
    assert sum(calls) == 2
    assert t._lr_steps == 1         # gate fired in-loop; fallback must NOT double-step


def test_lr_unstepped_on_empty_epoch():
    """An empty loader matches the reference: the last-batch gate can never
    fire, so the schedule does not advance."""
    t, calls = _mk_trainer(n_len=0, n_real=0)
    t._run_epoch_inner(0, 0)
    assert sum(calls) == 0
    assert t._lr_steps == 0


# ------------------------------------------------------ after_epoch gating
def _mk_simple(tmp_path, freq, max_epoch):
    from fairfedmed_tpu.train.engine import SimpleTrainer

    t = SimpleTrainer.__new__(SimpleTrainer)
    t.cfg = types.SimpleNamespace(
        TRAIN=types.SimpleNamespace(CHECKPOINT_FREQ=freq))
    t.max_epoch = max_epoch
    t.output_dir = str(tmp_path)
    saved = []
    t.save_model = lambda epoch, directory, idx=None, **kw: (
        saved.append((epoch, idx)) or os.path.join(directory, "x.npz"))
    return t, saved


def test_after_epoch_saves_on_last_local_epoch(tmp_path):
    """Reference semantics (Dassl trainer.py:497-521): CHECKPOINT_FREQ
    counts LOCAL epochs, and the LAST local epoch of a round always saves —
    even at the config-default freq 0 (pre-fix the gate used the federated
    round index and freq 0 never saved at all)."""
    t, saved = _mk_simple(tmp_path, freq=0, max_epoch=3)
    for t.epoch in range(3):
        t.after_epoch(idx=1, global_epoch=4, is_last_client=False)
    assert saved == [(4, 1)]        # once, at local epoch 2 (the last)

    t, saved = _mk_simple(tmp_path, freq=2, max_epoch=5)
    for t.epoch in range(5):
        t.after_epoch(idx=0, global_epoch=0, is_last_client=False)
    # local epochs 2 and 4 meet freq; epoch 5 is last -> 3 saves
    assert len(saved) == 3


# ------------------------------------------------------- attrs alignment
def test_mixed_attrs_batch_raises():
    """A dataset returning attrs for only SOME items of a batch must raise,
    not emit an attrs array misaligned with img/label rows."""
    from fairfedmed_tpu.data.manager import ClientLoader

    class MixedDs:
        def __len__(self):
            return 4

        def load_item(self, i):
            img = np.zeros((4, 4, 3), np.float32)
            attr = np.array([0, 1], np.int32) if i % 2 == 0 else None
            return img, i % 2, attr

    loader = ClientLoader(MixedDs(), batch_size=4, is_train=False)
    with pytest.raises(ValueError, match="uniformly"):
        list(loader)


# ------------------------------------------------------- native build
@pytest.fixture
def fake_native(tmp_path, monkeypatch):
    """Point the native module at a scratch source/artifact dir."""
    import fairfedmed_tpu.native as native

    src = tmp_path / "npz_loader.cpp"
    src.write_text("// scratch")
    monkeypatch.setattr(native, "_HERE", str(tmp_path))
    monkeypatch.setattr(native, "_SRC", str(src))
    monkeypatch.setattr(native, "_SO", str(tmp_path / "_npz_loader.so"))
    return native, tmp_path


def test_cached_plain_so_served_when_compiler_missing(fake_native, monkeypatch):
    """No g++ on the host + a fresh cached plain build: the jpeg candidate's
    failed compiler launch must fall through to the cached artifact instead
    of aborting the generator (pre-fix: silent numpy fallback)."""
    native, tmp_path = fake_native
    so_plain = tmp_path / "_npz_loader.so"
    so_plain.write_bytes(b"cached")
    os.utime(so_plain)  # fresher than the source

    def no_compiler(*a, **k):
        raise FileNotFoundError("g++")

    monkeypatch.setattr(native.subprocess, "run", no_compiler)
    assert list(native._build_candidates()) == [str(so_plain)]


def test_failed_feature_build_is_stamped_and_skipped(fake_native, monkeypatch):
    """A feature build that fails (missing libjpeg) writes a negative-result
    stamp so later processes skip the compile; the plain build still runs."""
    native, tmp_path = fake_native
    attempts = []

    def failing_jpeg(cmd, **k):
        attempts.append(cmd)
        if "-DFFM_WITH_JPEG" in cmd:
            raise subprocess.CalledProcessError(1, cmd, stderr="no jpeglib.h")
        out = cmd[cmd.index("-o") + 1]
        with open(out, "wb") as f:
            f.write(b"built")
        return types.SimpleNamespace(returncode=0)

    monkeypatch.setattr(native.subprocess, "run", failing_jpeg)
    got = list(native._build_candidates())
    assert got == [str(tmp_path / "_npz_loader.so")]
    assert os.path.exists(str(tmp_path / "_npz_loader_jpeg.so.failed"))
    n_first = len(attempts)
    assert n_first == 2  # jpeg (failed) + plain (ok)

    # second process: the stamp suppresses the jpeg re-compile entirely
    got = list(native._build_candidates())
    assert got == [str(tmp_path / "_npz_loader.so")]
    assert len(attempts) == n_first  # cached .so served, no new compiles


# ---------------------------------------------- reference data semantics
def _mk_fair_ds(tmp_path, modality, member_arrays, res=8):
    """A FairFedMedDataset wired straight to one handcrafted NPZ (bypasses
    CSV/index plumbing to unit-test the load_item modality branches)."""
    from fairfedmed_tpu.data.datasets.fairfedmed import FairFedMedDataset

    ds = FairFedMedDataset.__new__(FairFedMedDataset)
    ds.data_path = str(tmp_path)
    ds.modality_type = modality
    ds.resolution = res
    ds.depth = 1
    ds.attribute_type = "race"
    ds.attributes = ["race"]
    ds.data_files = ["a.npz"]
    ds._labels = [1]
    ds._attr_rows = [[0]]
    np.savez(str(tmp_path / "a.npz"), **member_arrays)
    return ds


def test_oct3d_truncates_like_reference(tmp_path):
    """oct_bscans_3d floors each voxel before the float32 cast
    (data_utils.py:655-656 astype(int).astype(np.float32)) — identity for
    uint8 sites, load-bearing for float-source volumes."""
    vol = np.full((2, 4, 4), 2.7, np.float32)
    ds = _mk_fair_ds(tmp_path, "oct_bscans_3d", {"oct_bscans": vol})
    img, label, attrs = ds.load_item(0)
    np.testing.assert_array_equal(
        img, np.full((1, 2, 4, 4), 2.0, np.float32))


def test_slo_resize_triggers_on_height_only(tmp_path):
    """slo_fundus resizes iff the TRANSPOSED height mismatches
    (data_utils.py:669 checks shape[1] of the [1,H,W] array only): a
    width-only mismatch passes through un-resized like the reference."""
    stored = np.arange(5 * 8, dtype=np.float32).reshape(5, 8)  # transposed: (8, 5)
    ds = _mk_fair_ds(tmp_path, "slo_fundus", {"slo_fundus": stored}, res=8)
    img, _, _ = ds.load_item(0)
    assert img.shape == (1, 8, 5)  # H==res: untouched (pre-fix: resized to 8x8)
    np.testing.assert_array_equal(img[0], stored.T)

    ds2 = _mk_fair_ds(tmp_path, "slo_fundus", {"slo_fundus": stored}, res=5)
    img2, _, _ = ds2.load_item(0)
    assert img2.shape == (1, 5, 5)  # H!=res: resized


def test_missing_listed_attribute_raises(tmp_path):
    """Any attribute listed in DATASET.ATTRIBUTES but absent from a site NPZ
    raises (reference data_utils.py:724 KeyError) instead of silently
    bucketing those samples into fairness group -1."""
    from tests.fixtures import make_fairfedmed_fixture
    from fairfedmed_tpu.data.datasets.fairfedmed import FairFedMedDataset

    root = str(tmp_path / "data")
    make_fairfedmed_fixture(root, n_sites=1, n_train=4, n_test=2, size=8)
    with pytest.raises(KeyError, match="not_an_attribute"):
        FairFedMedDataset(
            base_path=os.path.join(root, "fairfedmed"), site=1,
            attribute_type="race", attributes=["race", "not_an_attribute"],
            modality_type="slo_fundus", resolution=8, depth=1, train=True,
            use_index_cache=False)


def test_binary_fairness_branch_rejects_multiclass_preds():
    """The num_classes==2 DPD/EOD branch asserts two-column probabilities
    (reference metrics.py:252) — argmax over C>2 columns would feed
    multi-valued 'selection rates' into the binary fairness metrics."""
    from fairfedmed_tpu.evaluation import metrics as M

    rng = np.random.default_rng(0)
    preds = rng.random((12, 3))
    preds /= preds.sum(-1, keepdims=True)
    gts = np.array([0, 1] * 6)
    attrs = np.array([[0, 1] * 6])
    with pytest.raises(AssertionError, match="3"):
        M.evalute_comprehensive_perf_scores(preds, gts, attrs)


def test_compute_cmat_writes_matrix(tmp_path, capsys):
    """TEST.COMPUTE_CMAT saves a row-normalized confusion matrix and prints
    its path (Dassl evaluator.py:117-124; .npy instead of torch's .pt)."""
    from fairfedmed_tpu.evaluation.evaluator import Classification

    cfg = types.SimpleNamespace(
        TEST=types.SimpleNamespace(PER_CLASS_RESULT=False, COMPUTE_CMAT=True),
        OUTPUT_DIR=str(tmp_path))
    ev = Classification(cfg, lab2cname={0: "a", 1: "b"})
    ev.process(np.array([[2.0, 1.0], [0.0, 3.0], [1.0, 0.0]]),
               np.array([0, 1, 1]))
    ev.evaluate()
    assert "cmat.npy" in capsys.readouterr().out
    cm = np.load(os.path.join(str(tmp_path), "cmat.npy"))
    np.testing.assert_allclose(cm, [[1.0, 0.0], [0.5, 0.5]])


def test_build_publishes_atomically(fake_native, monkeypatch):
    """The compile writes a temp name and os.replace-publishes it, so a
    concurrent process can never dlopen a half-written .so; a killed compile
    leaves no fresh-mtime truncated artifact behind."""
    native, tmp_path = fake_native
    seen_out = []

    def fake_gxx(cmd, **k):
        out = cmd[cmd.index("-o") + 1]
        seen_out.append(out)
        with open(out, "wb") as f:
            f.write(b"built")
        return types.SimpleNamespace(returncode=0)

    monkeypatch.setattr(native.subprocess, "run", fake_gxx)
    got = list(native._build_candidates())
    # compiler always targeted temp names, never the published paths
    assert all(".tmp" in p for p in seen_out)
    assert str(tmp_path / "_npz_loader_jpeg.so") in got
    assert not [p for p in os.listdir(tmp_path) if ".tmp" in p]
