import pytest

pytestmark = pytest.mark.smoke

from fairfedmed_tpu.config import CfgNode, get_cfg_default


def test_defaults_tree():
    c = get_cfg_default()
    assert c.OPTIM.LR == 0.0003
    assert c.DATALOADER.TRAIN_X.BATCH_SIZE == 32
    assert c.TEST.EVALUATOR == "Classification"
    assert c.INPUT.SIZE == (32, 32)


def test_merge_from_list_and_coercion():
    c = get_cfg_default()
    c.merge_from_list(["OPTIM.LR", "0.01", "TRAIN.PRINT_FREQ", "5", "TEST.NO_TEST", "True"])
    assert c.OPTIM.LR == 0.01
    assert c.TRAIN.PRINT_FREQ == 5
    assert c.TEST.NO_TEST is True
    with pytest.raises(KeyError):
        c.merge_from_list(["NOPE.NOPE", "1"])


def test_merge_from_file(tmp_path):
    f = tmp_path / "cfg.yaml"
    f.write_text(
        "OPTIM:\n  NAME: sgd\n  LR: 0.001\nINPUT:\n  SIZE: (224, 224)\n"
        "MODEL:\n  BACKBONE:\n    NAME: ViT-B/16\n"
    )
    c = get_cfg_default()
    c.merge_from_file(str(f))
    assert c.OPTIM.NAME == "sgd"
    assert c.MODEL.BACKBONE.NAME == "ViT-B/16"
    # yacs parses "(224, 224)" strings as str; reference yamls rely on this via
    # yaml tuple syntax — we accept both list and tuple forms
    assert tuple(c.INPUT.SIZE) in {(224, 224)} or c.INPUT.SIZE == "(224, 224)"


def test_freeze_blocks_writes():
    c = get_cfg_default()
    c.freeze()
    with pytest.raises(AttributeError):
        c.OPTIM.LR = 1.0
    c.defrost()
    c.OPTIM.LR = 1.0
    assert c.OPTIM.LR == 1.0


def test_clone_independent():
    c = get_cfg_default()
    d = c.clone()
    d.OPTIM.LR = 123.0
    assert c.OPTIM.LR == 0.0003


def test_int_list_argparse_flag():
    """--idxs_users_train must parse comma-separated ids into ints (the
    reference's type=list made the flag unusable from a shell)."""
    import federated_main

    parser = federated_main.build_arg_parser()
    args = parser.parse_args(["--idxs_users_train", "0,2", "--idxs_users_test", "1"])
    assert args.idxs_users_train == [0, 2]
    assert args.idxs_users_test == [1]
    assert parser.parse_args([]).idxs_users_train == []
    assert federated_main._int_list(["0", 1]) == [0, 1]
