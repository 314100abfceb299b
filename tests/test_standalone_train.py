"""Standalone (non-federated) CLI: tools/train.py.

Reference surface: Dassl/tools/train.py:1-190 — single-site supervised
training outside any aggregation (the whole train split is client 0).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")
from tests.fixtures import make_cifar10_fixture  # noqa: E402

pytestmark = pytest.mark.smoke


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "standalone_train", os.path.join("tools", "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cli():
    return _load_cli()


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sa_cifar")
    make_cifar10_fixture(str(root), n_train=40, n_test=20)
    return str(root)


def _run(cli, argv):
    return cli.main(cli.build_arg_parser().parse_args(argv))


def test_train_then_eval_only(cli, cifar_root, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    res = _run(cli, [
        "--root", cifar_root, "--output-dir", out_dir, "--seed", "1",
        "--trainer", "PromptFL", "--backbone", "test-vit",
        "DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)",
        "OPTIM.MAX_EPOCH", "2", "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
        "DATALOADER.TEST.BATCH_SIZE", "10"])
    captured = capsys.readouterr().out
    # reference train.py's diagnostics block + Dassl's final test print
    assert "** Arguments **" in captured and "** Config **" in captured
    assert "Finish training" in captured
    assert np.isfinite(res["test"]).all()
    # full-format checkpoint written (torchtools.py:27-82 shape)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint"))

    # --eval-only reloads the checkpoint and reproduces the test result
    res2 = _run(cli, [
        "--root", cifar_root, "--output-dir", str(tmp_path / "out2"),
        "--seed", "1", "--trainer", "PromptFL", "--backbone", "test-vit",
        "--eval-only", "--model-dir", ckpt_dir,
        "DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)",
        "DATALOADER.TEST.BATCH_SIZE", "10"])
    np.testing.assert_allclose(res2["test"], res["test"], atol=1e-6)

    # --load-epoch picks the explicit full-format file
    res3 = _run(cli, [
        "--root", cifar_root, "--output-dir", str(tmp_path / "out3"),
        "--seed", "1", "--trainer", "PromptFL", "--backbone", "test-vit",
        "--eval-only", "--model-dir", ckpt_dir, "--load-epoch", "1",
        "DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)",
        "DATALOADER.TEST.BATCH_SIZE", "10"])
    np.testing.assert_allclose(res3["test"], res["test"], atol=1e-6)


def test_no_train_skips_everything(cli, cifar_root, tmp_path):
    res = _run(cli, [
        "--root", cifar_root, "--output-dir", str(tmp_path / "nt"),
        "--seed", "1", "--trainer", "PromptFL", "--backbone", "test-vit",
        "--no-train",
        "DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)"])
    assert res == {}


def test_clean_cfg_keeps_prefix_nodes(cli):
    cfg = cli.setup_cfg(cli.build_arg_parser().parse_args(
        ["--trainer", "GLP_OT_SVLoRA"]))
    # GLP_OT_SVLoRA reads TRAINER.GLP_OT and TRAINER.GLP_OT_LORA
    assert "GLP_OT" in cfg.TRAINER and "GLP_OT_LORA" in cfg.TRAINER
    assert "PROMPTFL" not in cfg.TRAINER


def test_clean_cfg_pops_unrelated(cli):
    cfg = cli.setup_cfg(cli.build_arg_parser().parse_args(
        ["--trainer", "PromptFL"]))
    assert "PROMPTFL" in cfg.TRAINER
    assert "GLP_OT" not in cfg.TRAINER


def test_users_forced_to_one_after_merges(cli, capsys):
    """A reused federated config carrying DATASET.USERS must not shard the
    standalone run (review finding: USERS=1 was set before the opts merge)."""
    cfg = cli.setup_cfg(cli.build_arg_parser().parse_args(
        ["--trainer", "PromptFL", "DATASET.USERS", "10"]))
    assert cfg.DATASET.USERS == 1
    assert "overriding DATASET.USERS=10" in capsys.readouterr().out
