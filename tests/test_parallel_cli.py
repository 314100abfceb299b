"""CLI e2e: --parallel_clients mesh rounds vs the sequential host loop.

The client-parallel path (fed/parallel_driver.py) must reproduce the
sequential FedOTPLoRA round semantics (reference federated_main.py:604-726).
With a momentum-free optimizer the sequential path's shared-optimizer quirk
vanishes, so the two paths must agree to float tolerance — weights AND
metrics.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")
import federated_main  # noqa: E402

from tests.fixtures import make_cifar10_fixture, make_fairfedmed_fixture  # noqa: E402


def _args(**overrides):
    parser = federated_main.build_arg_parser()
    args = parser.parse_args([])
    args.opts = []
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


@pytest.fixture(scope="module")
def fairfedmed_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_fairfedmed_fixture(str(root), n_sites=2, n_train=8, n_test=6, size=32)
    return str(root)


def _fairlora_args(root, outdir, parallel):
    return _args(
        model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=2, num_users=2,
        frac=1.0, root=root, output_dir=outdir,
        train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-vit", attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type="slo_fundus", unfreeze_image_encoder=True,
        lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA", shared_half_s=True,
        parallel_clients=parallel,
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph",
              "TRAINER.GLP_OT.PREC", "fp32",
              "OPTIM.NAME", "sgd", "OPTIM.MOMENTUM", "0.0",
              "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
              "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"],
    )


def test_parallel_matches_sequential_fairlora(fairfedmed_root, tmp_path):
    out_seq = federated_main.main(
        _fairlora_args(fairfedmed_root, str(tmp_path / "seq"), parallel=False))
    out_par = federated_main.main(
        _fairlora_args(fairfedmed_root, str(tmp_path / "par"), parallel=True))

    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    np.testing.assert_allclose(out_par["auc"], out_seq["auc"], atol=1e-6)

    # final per-client states must coincide leaf-for-leaf
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        assert set(seq.files) == set(par.files)
        for k in seq.files:
            np.testing.assert_allclose(
                par[k], seq[k], rtol=1e-4, atol=1e-5,
                err_msg=f"client {idx} key {k}")


@pytest.mark.smoke
def test_parallel_promptfl_fedavg_runs(tmp_path):
    root = str(tmp_path / "cifar")
    make_cifar10_fixture(root, n_train=80, n_test=40)
    args = _args(
        model="fedavg", trainer="PromptFL", round=1, num_users=2, frac=1.0,
        partition="homo", root=root, output_dir=str(tmp_path / "out"),
        train_batch_size=8, test_batch_size=10, n_ctx=4, backbone="test-vit",
        parallel_clients=True, config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 1
    assert np.isfinite(out["acc"][0])


def _local_args(root, outdir, parallel):
    a = _fairlora_args(root, outdir, parallel)
    a.model = "local"
    a.round = 1
    return a


def test_parallel_matches_sequential_local(fairfedmed_root, tmp_path):
    """The no-aggregation `local` branch on the mesh path must reproduce the
    sequential loop: same per-client metrics, same final states (reference
    federated_main.py:728-773)."""
    out_seq = federated_main.main(
        _local_args(fairfedmed_root, str(tmp_path / "seq"), parallel=False))
    out_par = federated_main.main(
        _local_args(fairfedmed_root, str(tmp_path / "par"), parallel=True))

    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    np.testing.assert_allclose(out_par["auc"], out_seq["auc"], atol=1e-6)
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        assert set(seq.files) == set(par.files)
        for k in seq.files:
            np.testing.assert_allclose(
                par[k], seq[k], rtol=1e-4, atol=1e-5,
                err_msg=f"client {idx} key {k}")


def test_parallel_matches_sequential_differentiable_fairness(fairfedmed_root,
                                                             tmp_path):
    """Group-fairness regulariser under within-client data sharding: the
    (2 clients × 4 data) CPU mesh splits each batch-4 step into 1-sample
    shards, where a per-shard fairness loss is identically zero (one group
    per shard has gap 0).  The psum-ed group sums/counts must reproduce the
    sequential full-batch loss and — with DIFFERENTIABLE_FAIRNESS — its
    gradient, so final states must match the host loop (regression for the
    pmean-of-a-nonlinear-loss bug)."""
    def mk(outdir, par):
        a = _fairlora_args(fairfedmed_root, outdir, par)
        a.lambda_fairness = 0.5
        a.differentiable_fairness = True
        return a

    out_seq = federated_main.main(mk(str(tmp_path / "seq"), False))
    out_par = federated_main.main(mk(str(tmp_path / "par"), True))

    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    np.testing.assert_allclose(out_par["auc"], out_seq["auc"], atol=1e-6)
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        for k in seq.files:
            np.testing.assert_allclose(
                par[k], seq[k], rtol=1e-4, atol=1e-5,
                err_msg=f"client {idx} key {k}")


def test_parallel_group_width_fallback(tmp_path):
    """Observed demographic groups narrower than the model's group table
    (here race ∈ {0,1} vs the 3-row FairFedMed table): the reference's
    shape guard (fed_utils.py:18,91) silently falls back to the plain
    client-weighted mean AND skips shared_half_s for lora_S.  The mesh path
    must reproduce that fallback instead of crashing on the group-weight
    reshape (regression: TypeError cannot reshape (m,2) into (m,1,3,1))."""
    import glob

    root = tmp_path / "data"
    make_fairfedmed_fixture(str(root), n_sites=2, n_train=8, n_test=6, size=32)
    for p in glob.glob(str(root / "fairfedmed" / "all" / "*.npz")):
        raw = dict(np.load(p, allow_pickle=True))
        raw["race"] = np.minimum(raw["race"], 1)
        np.savez(p, **raw)

    out_seq = federated_main.main(
        _fairlora_args(str(root), str(tmp_path / "seq"), parallel=False))
    out_par = federated_main.main(
        _fairlora_args(str(root), str(tmp_path / "par"), parallel=True))

    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    np.testing.assert_allclose(out_par["auc"], out_seq["auc"], atol=1e-6)
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        for k in seq.files:
            np.testing.assert_allclose(
                par[k], seq[k], rtol=1e-4, atol=1e-5,
                err_msg=f"client {idx} key {k}")


def test_parallel_group_zero_count_padding(tmp_path):
    """RAGGED histogram widths: one site never sees the highest race group,
    so its count_by_attribute list is shorter.  The CLI pads it with a zero
    count (federated_main.py:184-186), group weighting still applies, and
    the zero-membership group's weights fall back to uniform
    (fed/aggregate._freqs, the reference-NaN fix).  Mesh == sequential."""
    import glob

    root = tmp_path / "data"
    make_fairfedmed_fixture(str(root), n_sites=2, n_train=8, n_test=6, size=32)
    files = sorted(glob.glob(str(root / "fairfedmed" / "all" / "*.npz")))
    assert len(files) == 28
    for p in files[:14]:  # site 1's 8 train + 6 test files
        raw = dict(np.load(p, allow_pickle=True))
        raw["race"] = np.minimum(raw["race"], 1)
        np.savez(p, **raw)
    # premise: site 2's train data must still reach group 2 so the padded
    # width (3) matches the model's group table and group weighting applies
    site2_train_races = [int(np.load(p)["race"]) for p in files[14:22]]
    assert max(site2_train_races) == 2, site2_train_races

    out_seq = federated_main.main(
        _fairlora_args(str(root), str(tmp_path / "seq"), parallel=False))
    out_par = federated_main.main(
        _fairlora_args(str(root), str(tmp_path / "par"), parallel=True))

    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    np.testing.assert_allclose(out_par["auc"], out_seq["auc"], atol=1e-6)
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        for k in seq.files:
            np.testing.assert_allclose(
                par[k], seq[k], rtol=1e-4, atol=1e-5,
                err_msg=f"client {idx} key {k}")


def test_parallel_empty_client_trains_zero_batches(tmp_path):
    """A selected client whose train split is EMPTY: the sequential loop
    trains zero batches for it (its loader yields nothing) and it enters
    aggregation with weight 0.  The mesh path must mask it to zero scan
    steps — not gather from a zero-row cache or crash padding an empty
    stream — and reproduce the sequential metrics and states."""
    import pandas as pd

    root = tmp_path / "data"
    base = make_fairfedmed_fixture(
        str(root), n_sites=2, n_train=8, n_test=6, size=32)
    for attr in ("gender", "race", "ethnicity", "language", "maritalstatus"):
        pd.DataFrame({"filename": []}).to_csv(
            f"{base}/meta_site2_{attr}_train.csv", index=False)

    out_seq = federated_main.main(
        _fairlora_args(str(root), str(tmp_path / "seq"), parallel=False))
    out_par = federated_main.main(
        _fairlora_args(str(root), str(tmp_path / "par"), parallel=True))

    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    np.testing.assert_allclose(out_par["auc"], out_seq["auc"], atol=1e-6)
    # looser than the 2-trained-client tests: aggregation here has ONE
    # effective client (weights [1, 0]), so the fp32 fusion-order noise
    # between the two step programs is not averaged down and measures up to
    # ~3e-5 absolute after two rounds; real aggregation bugs are >1e-2
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        for k in seq.files:
            np.testing.assert_allclose(
                par[k], seq[k], rtol=1e-3, atol=1e-4,
                err_msg=f"client {idx} key {k}")


def test_round_state_checkpoint_roundtrip(fairfedmed_root, tmp_path, monkeypatch):
    """FAIRFEDMED_ROUND_CKPT saves the device-resident federated state every
    TRAIN.CHECKPOINT_FREQ rounds; load_round_state restores it bit for bit."""
    import jax

    from fairfedmed_tpu.train.checkpoint import latest_step, load_pytree

    ckpt_dir = str(tmp_path / "rounds")
    monkeypatch.setenv("FAIRFEDMED_ROUND_CKPT", ckpt_dir)
    args = _fairlora_args(fairfedmed_root, str(tmp_path / "run"), parallel=True)
    args.opts += ["TRAIN.CHECKPOINT_FREQ", "1"]
    federated_main.main(args)

    step = latest_step(ckpt_dir)
    assert step == 1  # 2 rounds, 0-indexed epochs, freq 1 -> last saved is 1
    tree = load_pytree(f"{ckpt_dir}/step_{step}")
    assert int(tree["epoch"]) == 1
    # 2 clients x 2 rounds x 2 sched-steps-per-client-epoch (the reference's
    # dual model registration steps the shared scheduler once per name,
    # Dassl trainer.py:253-258 — see glp_ot.py lr_step_multiplier)
    assert int(tree["lr_steps"]) == 8
    # every stacked leaf carries the num_users leading axis
    for leaf in jax.tree_util.tree_leaves(tree["personal_t"]):
        assert leaf.shape[0] == 2
    # restoring into a fresh template reproduces the saved state exactly
    tree2 = load_pytree(f"{ckpt_dir}/step_{step}", template=tree)
    for a, b in zip(jax.tree_util.tree_leaves(tree["personal_t"]),
                    jax.tree_util.tree_leaves(tree2["personal_t"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _fairlora_rn_args(root, outdir, parallel):
    a = _fairlora_args(root, outdir, parallel)
    a.backbone = "test-rn"
    return a


def test_parallel_matches_sequential_fairlora_rn(fairfedmed_root, tmp_path):
    """RN backbone on the mesh path: per-client BatchNorm statistics ride the
    stacked trainable (__bn_stats__), update unmasked like the sequential
    step, and aggregate with the state — metrics and final states must match
    the sequential loop."""
    out_seq = federated_main.main(
        _fairlora_rn_args(fairfedmed_root, str(tmp_path / "seq"), parallel=False))
    out_par = federated_main.main(
        _fairlora_rn_args(fairfedmed_root, str(tmp_path / "par"), parallel=True))

    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    np.testing.assert_allclose(out_par["auc"], out_seq["auc"], atol=1e-6)
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        assert set(seq.files) == set(par.files)
        assert any("running_mean" in k for k in seq.files)  # stats federate
        for k in seq.files:
            np.testing.assert_allclose(
                par[k], seq[k], rtol=1e-4, atol=1e-5,
                err_msg=f"client {idx} key {k}")


def test_parallel_fedotp_rn_runs(fairfedmed_root, tmp_path):
    """FedOTP (prompt_personal mode) on an RN backbone rides the mesh path:
    per-client BN stats stay local like every non-prompt trainable."""
    a = _fairlora_rn_args(fairfedmed_root, str(tmp_path / "out"), parallel=True)
    a.model = "FedOTP"
    a.trainer = "GLP_OT"
    out = federated_main.main(a)
    assert len(out["acc"]) == 2
    assert np.isfinite(out["acc"]).all()


def test_round_state_resume_continues(fairfedmed_root, tmp_path, monkeypatch):
    """A relaunch with FAIRFEDMED_ROUND_CKPT set picks up the saved round and
    trains only the remaining epochs (preemption recovery)."""
    ckpt = str(tmp_path / "rounds")
    monkeypatch.setenv("FAIRFEDMED_ROUND_CKPT", ckpt)
    a1 = _fairlora_args(fairfedmed_root, str(tmp_path / "run1"), parallel=True)
    a1.opts = a1.opts + ["TRAIN.CHECKPOINT_FREQ", "1"]
    federated_main.main(a1)  # rounds 0..1, saves step_1 (step_0 pruned)
    import os

    assert os.listdir(ckpt) == ["step_1"]

    a2 = _fairlora_args(fairfedmed_root, str(tmp_path / "run2"), parallel=True)
    a2.round = 4
    a2.opts = a2.opts + ["TRAIN.CHECKPOINT_FREQ", "1"]
    out2 = federated_main.main(a2)
    assert len(out2["acc"]) == 2  # resumed at epoch 2: only rounds 2 and 3 ran
    assert np.isfinite(out2["acc"]).all()
    assert os.listdir(ckpt) == ["step_3"]


def test_resume_flag_drives_round_checkpointing(fairfedmed_root, tmp_path):
    """``--resume DIR`` alone (no env var) must checkpoint every due round and
    pick the state back up on relaunch — preemption recovery as a CLI feature
    (reference federated_main.py:863 parses --resume but ships resume
    disabled, Dassl/dassl/engine/trainer.py:435-436)."""
    import os

    assert "FAIRFEDMED_ROUND_CKPT" not in os.environ
    ckpt = str(tmp_path / "rounds")
    a1 = _fairlora_args(fairfedmed_root, str(tmp_path / "run1"), parallel=True)
    a1.resume = ckpt
    a1.opts = a1.opts + ["TRAIN.CHECKPOINT_FREQ", "1"]
    federated_main.main(a1)  # rounds 0..1, saves step_1 (step_0 pruned)
    assert os.listdir(ckpt) == ["step_1"]

    a2 = _fairlora_args(fairfedmed_root, str(tmp_path / "run2"), parallel=True)
    a2.resume = ckpt
    a2.round = 4
    a2.opts = a2.opts + ["TRAIN.CHECKPOINT_FREQ", "1"]
    out2 = federated_main.main(a2)
    assert len(out2["acc"]) == 2  # resumed at epoch 2: only rounds 2 and 3 ran
    assert np.isfinite(out2["acc"]).all()
    assert os.listdir(ckpt) == ["step_3"]


def test_parallel_matches_sequential_promptfl_fedavg(fairfedmed_root, tmp_path):
    """fedavg-mode parity (PromptFL trainer): every client restarts from the
    fresh global each round, so with momentum-free SGD the mesh path must
    reproduce the sequential metrics exactly."""
    def mk(outdir, par):
        a = _fairlora_args(fairfedmed_root, outdir, par)
        a.model = "fedavg"
        a.trainer = "PromptFL"
        # PromptFL reads its own PREC node; bf16 matmul reassociation between
        # the sequential and vmapped programs is otherwise visible at tiny scale
        a.opts = a.opts + ["TRAINER.PROMPTFL.PREC", "fp32"]
        return a

    out_seq = federated_main.main(mk(str(tmp_path / "seq"), False))
    out_par = federated_main.main(mk(str(tmp_path / "par"), True))
    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    np.testing.assert_allclose(out_par["auc"], out_seq["auc"], atol=1e-6)


def test_round_state_fingerprint_guards_resume(fairfedmed_root, tmp_path, monkeypatch):
    """A checkpoint from a different run shape (other backbone here) must be
    ignored with a message, not restored into the wrong template."""
    ckpt = str(tmp_path / "rounds")
    monkeypatch.setenv("FAIRFEDMED_ROUND_CKPT", ckpt)
    a1 = _fairlora_args(fairfedmed_root, str(tmp_path / "run1"), parallel=True)
    federated_main.main(a1)  # ViT run saves its rounds

    a2 = _fairlora_rn_args(fairfedmed_root, str(tmp_path / "run2"), parallel=True)
    out2 = federated_main.main(a2)  # RN run: fingerprint mismatch
    assert len(out2["acc"]) == 2  # started fresh, trained ALL rounds


@pytest.mark.smoke
def test_round_ckpt_legacy_fingerprint_accepted(tmp_path, capsys):
    """A checkpoint written BEFORE dataset identity joined the fingerprint
    (users/model/trainer/backbone CRC only) must still resume — a mid-run
    code upgrade must not silently restart a long preemptible run from
    epoch 0 — with a printed caveat; any other fingerprint still raises."""
    import types

    from fairfedmed_tpu.fed.parallel_driver import ParallelRoundRunner
    from fairfedmed_tpu.train.checkpoint import save_pytree

    r = ParallelRoundRunner.__new__(ParallelRoundRunner)
    r.num_users = 2
    r.args = types.SimpleNamespace(model="FedOTPLoRA", attribute_type="race")
    r.cfg = types.SimpleNamespace(
        TRAINER=types.SimpleNamespace(NAME="GLP_OT_SVLoRA"),
        MODEL=types.SimpleNamespace(
            BACKBONE=types.SimpleNamespace(NAME="ViT-B/16")),
        DATASET=types.SimpleNamespace(NAME="FairFedMed",
                                      MODALITY_TYPE="slo_fundus"))
    r.global_t = {"w": np.zeros(2, np.float32)}
    r.personal_t = {"w": np.zeros((2, 2), np.float32)}
    r.stacked_o = {"m": np.zeros((2, 2), np.float32)}
    r.trainer = types.SimpleNamespace(_lr_steps=0)
    assert r._run_fingerprint() != r._run_fingerprint_legacy()

    tree = {"global_t": {"w": np.ones(2, np.float32)},
            "personal_t": {"w": np.ones((2, 2), np.float32)},
            "stacked_o": {"m": np.ones((2, 2), np.float32)},
            "lr_steps": 7, "epoch": 3,
            "fingerprint": r._run_fingerprint_legacy()}
    path = save_pytree(str(tmp_path / "ck"), tree, step=3)
    assert r.load_round_state(path) == 3
    assert r.trainer._lr_steps == 7
    assert np.all(np.asarray(r.global_t["w"]) == 1.0)
    assert "pre-dataset-identity" in capsys.readouterr().out

    tree["fingerprint"] = r._run_fingerprint_legacy() ^ 1
    path2 = save_pytree(str(tmp_path / "ck2"), tree, step=3)
    with pytest.raises(ValueError, match="different run shape"):
        r.load_round_state(path2)


def test_large_scale_eval_gating(tmp_path):
    """num_users >= 50 skips per-round testing until epoch 140 (reference
    federated_main.py:654-676): with round=2 no eval runs at all, so the
    metric lists stay empty while training still happens on the mesh path."""
    root = str(tmp_path / "data")
    make_fairfedmed_fixture(root, n_sites=50, n_train=2, n_test=1, size=32)
    a = _fairlora_args(root, str(tmp_path / "out"), parallel=True)
    a.num_users = 50
    a.frac = 0.04  # 2 clients per round after round 0
    out = federated_main.main(a)
    assert out["acc"] == [] and out["auc"] == []  # gated: no eval before 140
    # training really happened AND stayed finite: a frac-sampled round whose
    # 2 clients miss a demographic group must not NaN the group-weighted
    # lora_S (uniform-weight fallback in fed/aggregate._freqs)
    for idx in (0, 7):
        state = np.load(str(tmp_path / "out" / f"global_client{idx}_final.npz"))
        for k in state.files:
            assert np.isfinite(state[k]).all(), f"client {idx} key {k} not finite"
