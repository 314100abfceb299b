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
    silently froze for the rest of the run)."""
    t, calls = _mk_trainer(n_len=3, n_real=2)
    t._run_epoch_inner(0, 0)
    assert sum(calls) == 2          # both real batches trained
    assert t._lr_steps == 1         # stepped once by the after-loop fallback


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
