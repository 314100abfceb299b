"""End-to-end FL runs through the CLI main() on synthetic fixtures."""

import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, ".")  # repo root for federated_main
import federated_main  # noqa: E402

from tests.fixtures import make_cifar10_fixture, make_fairfedmed_fixture  # noqa: E402


def _args(**overrides):
    parser = federated_main.build_arg_parser()
    args = parser.parse_args([])
    args.opts = []
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "e2e_trajectories.json")


def _check_golden(name, out):
    """Pin the per-round acc/AUC trajectory against a checked-in golden.

    Unlike the torch-parity suite (skipif-gated on torch + the reference
    checkout), these goldens keep semantic-drift detection alive in ANY
    environment.  acc/AUC are rank/count statistics, so they are stable
    under sub-1e-6 float noise across CPU hosts unless a prediction sits on
    a knife edge; the goldens were generated on the standard test env
    (JAX_PLATFORMS=cpu, 8 virtual devices).  Regenerate after an intended
    semantic change with FAIRFEDMED_REGEN_GOLDENS=1 (runs the same test
    code, so args/env identity is guaranteed).
    """
    traj = {"acc": [float(a) for a in out["acc"]],
            "auc": [float(a) for a in out.get("auc", [])]}
    if os.environ.get("FAIRFEDMED_REGEN_GOLDENS") == "1":
        data = {}
        if os.path.exists(GOLDEN_PATH):
            with open(GOLDEN_PATH) as f:
                data = json.load(f)
        data[name] = traj
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        return
    with open(GOLDEN_PATH) as f:
        exp = json.load(f)[name]
    np.testing.assert_allclose(traj["acc"], exp["acc"], rtol=0, atol=1e-6,
                               err_msg=f"{name}: acc trajectory drifted")
    np.testing.assert_allclose(traj["auc"], exp["auc"], rtol=0, atol=1e-6,
                               err_msg=f"{name}: AUC trajectory drifted")


@pytest.fixture(scope="module")
def fairfedmed_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_fairfedmed_fixture(str(root), n_sites=2, n_train=8, n_test=6, size=32)
    return str(root)


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cifar")
    make_cifar10_fixture(str(root), n_train=80, n_test=40)
    return str(root)


def test_cifar10_promptfl_fedavg(cifar_root, tmp_path):
    # 3 rounds so the pinned window sees aggregation dynamics (round-2+
    # drift), not just the first step
    args = _args(
        model="fedavg", trainer="PromptFL", round=3, num_users=2, frac=1.0,
        partition="homo", root=cifar_root, output_dir=str(tmp_path / "out"),
        train_batch_size=8, test_batch_size=10, n_ctx=4, backbone="test-vit",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 3
    assert np.isfinite(out["acc"]).all()
    _check_golden("cifar10_promptfl_fedavg", out)


def test_cifar10_promptfl_fedprox(cifar_root, tmp_path):
    """fedprox branch: proximal-regularized local steps, selected-users-only
    eval (federated_main.py:304-382 semantics)."""
    args = _args(
        model="fedprox", trainer="PromptFL", round=3, num_users=2, frac=1.0,
        mu=0.01, partition="homo", root=cifar_root,
        output_dir=str(tmp_path / "prox"),
        train_batch_size=8, test_batch_size=10, n_ctx=4, backbone="test-vit",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 3
    assert np.isfinite(out["acc"]).all()
    assert out["auc"] == []  # fedprox reports no AUC by branch semantics
    _check_golden("cifar10_promptfl_fedprox", out)


def test_fairfedmed_fairlora_ema(fairfedmed_root, tmp_path):
    args = _args(
        model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=3, num_users=2,
        frac=1.0, root=fairfedmed_root, output_dir=str(tmp_path / "out2"),
        train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-vit",
        attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type="slo_fundus", unfreeze_image_encoder=True,
        lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA", shared_half_s=True,
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph",
              "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
              "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 3
    assert np.isfinite(out["auc"]).all()
    _check_golden("fairfedmed_fairlora_ema", out)


def test_fairfedmed_glpot_sinkhorn(fairfedmed_root, tmp_path):
    args = _args(
        model="FedOTP", trainer="GLP_OT", round=3, num_users=2, frac=1.0,
        root=fairfedmed_root, output_dir=str(tmp_path / "out3"),
        train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="Sinkhorn", eps=0.1, thresh=1e-3, max_iter=50,
        backbone="test-vit", attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type="slo_fundus",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 3
    _check_golden("fairfedmed_glpot_sinkhorn", out)


def test_fairfedmed_linearft(fairfedmed_root, tmp_path):
    """FedOTPLinearFT: full-state FedAvg + personal prompts/lora_S
    (federated_main.py:487-602)."""
    args = _args(
        model="FedOTPLinearFT", trainer="GLP_OT_SVLoRA", round=3, num_users=2,
        frac=1.0, root=fairfedmed_root, output_dir=str(tmp_path / "out4"),
        train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-vit",
        attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type="slo_fundus", unfreeze_image_encoder=True,
        lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA", lora_local_s=True,
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 3
    assert np.isfinite(out["acc"]).all()
    _check_golden("fairfedmed_linearft", out)


def test_fairfedmed_linearft_untrained_client(fairfedmed_root, tmp_path):
    """Restricted --idxs_users_train: evaluated-but-never-trained clients have
    no local prompt rows yet and must keep the global ones.  The reference
    crashes slice-assigning the initial [] (federated_main.py:527-528 — a
    gate its FedOTPLoRA branch has but LinearFT lacks)."""
    args = _args(
        model="FedOTPLinearFT", trainer="GLP_OT_SVLoRA", round=1, num_users=2,
        frac=1.0, root=fairfedmed_root, output_dir=str(tmp_path / "out4b"),
        train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-vit",
        attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type="slo_fundus", unfreeze_image_encoder=True,
        lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA", lora_local_s=True,
        idxs_users_train=[0],
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph"],
    )
    out = federated_main.main(args)
    assert np.isfinite(out["acc"][0])


def test_fairfedmed_fairlora_oct3d(fairfedmed_root, tmp_path):
    """3D OCT path: [128,H,W] -> [::4] 32 slices -> dim_per_3d_slice chunks ->
    proj to pseudo-RGB -> per-slice FairLoRA S repeat -> slice-mean logits
    (GLP_OT_SVLoRA.py:682-690,473-475,754)."""
    args = _args(
        model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=3, num_users=2,
        frac=1.0, root=fairfedmed_root, output_dir=str(tmp_path / "oct"),
        train_batch_size=2, test_batch_size=2, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-vit",
        attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type="oct_bscans", dim_per_3d_slice=16,
        unfreeze_image_encoder=True,
        lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 3
    assert np.isfinite(out["acc"]).all()
    _check_golden("fairfedmed_fairlora_oct3d", out)


def test_cifar10_baseline_trainer(cifar_root, tmp_path):
    """Baseline trainer: supervised backbone+classifier, no CLIP
    (trainers/promptfl.py:348-372 / SimpleNet role)."""
    args = _args(
        model="fedavg", trainer="Baseline", round=1, num_users=2, frac=1.0,
        partition="homo", root=cifar_root, output_dir=str(tmp_path / "base"),
        train_batch_size=8, test_batch_size=10,
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 1
    assert np.isfinite(out["acc"][0])


def test_fairfedmed_fairlora_rn50_oct(fairfedmed_root, tmp_path):
    """RN50 path with 3D OCT: FairLoRA on 1x1 convs, trainable BatchNorm,
    slice projection (scripts/fairfedlora_fairfedmed_oct_rn50.sh shape)."""
    args = _args(
        model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=2, num_users=2,
        frac=1.0, root=fairfedmed_root, output_dir=str(tmp_path / "rnoct"),
        train_batch_size=2, test_batch_size=2, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-rn",
        attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type="oct_bscans", dim_per_3d_slice=16,
        unfreeze_image_encoder=True,
        lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 2
    assert np.isfinite(out["acc"]).all()
    _check_golden("fairfedmed_fairlora_rn50_oct", out)


def test_save_and_resume_checkpoint(cifar_root, tmp_path):
    """Full-format checkpoint + pointer file + resume
    (torchtools.py:27-166 semantics)."""
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.train import build_trainer

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = cifar_root
    cfg.DATASET.NAME = "Cifar10"
    cfg.DATASET.USERS = 2
    cfg.DATASET.PARTITION = "homo"
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.NAME = "PromptFL"
    cfg.MODEL.BACKBONE.NAME = "test-vit"
    cfg.OUTPUT_DIR = str(tmp_path / "ck")
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 10
    cfg.SEED = 1
    trainer = build_trainer(cfg)
    trainer.train(idx=0, global_epoch=0, is_fed=True)
    before = {k: np.asarray(v).copy() for k, v in trainer.state_dict().items()}
    path = trainer.save_checkpoint(epoch=0, directory=cfg.OUTPUT_DIR)
    assert "model.pth.tar-0" in path
    # clobber weights, then resume from the pointer file
    trainer.load_state_dict({k: np.zeros_like(v) for k, v in before.items()})
    epoch = trainer.resume_from_checkpoint(cfg.OUTPUT_DIR)
    assert epoch == 1
    after = trainer.state_dict()
    for k in before:
        np.testing.assert_array_equal(np.asarray(after[k]), before[k])


def test_fedchexmimic_fairlora(tmp_path):
    """FairFedMed-Chest 2-site path (utils/data_utils.py:729-790 semantics)."""
    from tests.fixtures import make_fedchexmimic_fixture

    make_fedchexmimic_fixture(str(tmp_path / "data"), size=32)
    args = _args(
        model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=1, num_users=2,
        frac=1.0, root=str(tmp_path / "data"),
        output_dir=str(tmp_path / "out"),
        train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-vit",
        attribute_type="race", attributes=["race", "gender", "age"],
        modality_type="slo_fundus", unfreeze_image_encoder=True,
        lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FedChexMimic", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 1
    assert np.isfinite(out["acc"][0])


def test_glpot_unfreeze_layernorms(fairfedmed_root, tmp_path):
    """GLP_OT (no LoRA) with UNFREEZE_IMAGE/TEXT_ENCODER trains visual ln_pre
    + text ln_final (GLP_OT.py:414-426)."""
    args = _args(
        model="FedOTP", trainer="GLP_OT", round=1, num_users=2, frac=1.0,
        root=fairfedmed_root, output_dir=str(tmp_path / "ln"),
        train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-vit",
        attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type="slo_fundus",
        unfreeze_image_encoder=True, unfreeze_text_encoder=True,
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "TEST.EVALUATOR", "Classification_oph"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 1


def test_unfrozen_layernorms_receive_gradients(fairfedmed_root, tmp_path):
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.train import build_trainer

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = fairfedmed_root
    cfg.DATASET.NAME = "FairFedMed"
    cfg.DATASET.USERS = 1
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.NAME = "GLP_OT"
    cfg.TRAINER.GLP_OT.N_CTX = 4
    cfg.TRAINER.GLP_OT.OT = "None"
    cfg.TRAINER.GLP_OT_LORA.UNFREEZE_IMAGE_ENCODER = True
    cfg.TRAINER.GLP_OT_LORA.UNFREEZE_TEXT_ENCODER = True
    cfg.MODEL.BACKBONE.NAME = "test-vit"
    cfg.OUTPUT_DIR = str(tmp_path / "lnu")
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 4
    cfg.TEST.EVALUATOR = "Classification_oph"
    cfg.SEED = 1
    trainer = build_trainer(cfg)
    sd = trainer.state_dict()
    assert "image_encoder.ln_pre.weight" in sd
    # UNFREEZE_TEXT_ENCODER is a reference NO-OP: requires_grad is set but no
    # text param is ever given to the optimizer (GLP_OT.py:444-453) — so the
    # text ln_final must NOT appear in the trainable federated state
    assert "text_encoder.ln_final.weight" not in sd
    before = sd["image_encoder.ln_pre.weight"].copy()
    trainer.train(idx=0, global_epoch=0, is_fed=True)
    after = trainer.state_dict()
    # SGD must have moved the unfrozen visual ln_pre
    assert not np.array_equal(after["image_encoder.ln_pre.weight"], before)


def test_zero_shot_clip_branch(cifar_root, tmp_path):
    """trainer=CLIP: eval-only round, breaks after one epoch
    (federated_main.py:223-267)."""
    args = _args(
        model="fedavg", trainer="CLIP", round=3, num_users=2, frac=1.0,
        partition="homo", root=cifar_root, output_dir=str(tmp_path / "zs"),
        train_batch_size=8, test_batch_size=10, backbone="test-vit",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 1  # breaks after round 0
    _check_golden("cifar10_clip_zeroshot", out)


def test_local_branch(cifar_root, tmp_path):
    """model=local: train+test per client, no aggregation, single round
    (federated_main.py:728-773)."""
    args = _args(
        model="local", trainer="PromptFL", round=5, num_users=2, frac=1.0,
        partition="homo", root=cifar_root, output_dir=str(tmp_path / "loc"),
        train_batch_size=8, test_batch_size=10, n_ctx=4, backbone="test-vit",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 1  # breaks after one round
    _check_golden("cifar10_local", out)


def test_promptfl_resnet_backbone(cifar_root, tmp_path):
    """PromptFL with a ResNet CLIP backbone must route through resnet_encode
    (regression: it crashed on visual['conv1'] KeyError)."""
    args = _args(
        model="fedavg", trainer="PromptFL", round=1, num_users=2, frac=1.0,
        partition="homo", root=cifar_root, output_dir=str(tmp_path / "rn"),
        train_batch_size=8, test_batch_size=10, n_ctx=4, backbone="test-rn",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 1
    assert np.isfinite(out["acc"][0])


def test_glpot_resnet_no_lora(cifar_root, tmp_path):
    """Plain GLP_OT on a ResNet backbone: BN lives in the frozen tree and
    load_state_dict must route BN values there (regression: KeyError
    'visual_bn' at round start)."""
    args = _args(
        model="FedOTP", trainer="GLP_OT", round=1, num_users=2, frac=1.0,
        partition="homo", root=cifar_root, output_dir=str(tmp_path / "rngl"),
        train_batch_size=8, test_batch_size=10, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT="None", backbone="test-rn",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1"],
    )
    out = federated_main.main(args)
    assert len(out["acc"]) == 1
    assert np.isfinite(out["acc"][0])


def test_state_dict_entries_are_independent(fairfedmed_root, tmp_path):
    """state_dict arrays must be independent copies, not views of one packed
    buffer (consumers mutate entries in place)."""
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.train import build_trainer

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = fairfedmed_root
    cfg.DATASET.NAME = "FairFedMed"
    cfg.DATASET.USERS = 1
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.NAME = "GLP_OT_SVLoRA"
    cfg.TRAINER.GLP_OT.N_CTX = 4
    cfg.TRAINER.GLP_OT.OT = "None"
    cfg.TRAINER.GLP_OT_LORA.UNFREEZE_IMAGE_ENCODER = True
    cfg.TRAINER.GLP_OT_LORA.TYPE = "FairLoRA"
    cfg.MODEL.BACKBONE.NAME = "test-vit"
    cfg.OUTPUT_DIR = str(tmp_path / "sdview")
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 4
    cfg.DATALOADER.TEST.BATCH_SIZE = 4
    cfg.TEST.EVALUATOR = "Classification_oph"
    cfg.SEED = 1
    trainer = build_trainer(cfg)
    sd = trainer.state_dict()
    keys = list(sd)
    before = {k: sd[k].copy() for k in keys[1:3]}
    sd[keys[0]][...] = 777.0  # in-place mutation of one entry
    for k, v in before.items():
        np.testing.assert_array_equal(sd[k], v)
