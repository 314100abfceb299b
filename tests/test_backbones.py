"""Baseline backbone/head registries (models/backbones.py vs Dassl
backbone/resnet.py + head/mlp.py + SimpleNet trainer.py:48-105)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairfedmed_tpu.models.backbones import build_backbone, build_head

sys.path.insert(0, ".")


def test_resnet18_shapes_and_stats():
    init, apply, fdim = build_backbone("resnet18")
    assert fdim == 512
    params, stats = init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 64, 64)),
                    jnp.float32)
    f, new_stats = apply(params, stats, x, train=True)
    assert f.shape == (2, 512)
    # train mode updates running stats; eval leaves them alone
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), stats, new_stats)
    assert max(jax.tree_util.tree_leaves(d)) > 0.0
    f2, same_stats = apply(params, new_stats, x, train=False)
    d2 = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), new_stats, same_stats)
    assert max(jax.tree_util.tree_leaves(d2)) == 0.0


def test_resnet50_out_features():
    init, apply, fdim = build_backbone("resnet50")
    assert fdim == 2048
    params, stats = init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 3, 64, 64), jnp.float32)
    f, _ = apply(params, stats, x, train=False)
    assert f.shape == (1, 2048)


def test_unknown_backbone_raises():
    with pytest.raises(KeyError):
        build_backbone("alexnet9000")


def test_mlp_head():
    init, apply, fdim = build_head("mlp", 64, (32, 16), bn=True)
    assert fdim == 16
    params, stats = init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)), jnp.float32)
    y, new_stats = apply(params, stats, x, train=True)
    assert y.shape == (4, 16)
    assert (y >= 0).all()  # relu output


def test_baseline_resnet18_trains_advertised_model(tmp_path):
    """--trainer Baseline --backbone resnet18 must build resnet18 (not the
    compact fallback) and train end-to-end."""
    import federated_main
    from tests.fixtures import make_cifar10_fixture
    from fairfedmed_tpu.train import build_trainer

    root = str(tmp_path / "cifar")
    make_cifar10_fixture(root, n_train=64, n_test=20)
    parser = federated_main.build_arg_parser()
    args = parser.parse_args([])
    args.opts = []
    for k, v in dict(
        model="fedavg", trainer="Baseline", round=1, num_users=2, frac=1.0,
        partition="homo", root=root, output_dir=str(tmp_path / "out"),
        train_batch_size=8, test_batch_size=10, backbone="resnet18",
        config_file="", dataset_config_file="",
        opts=["DATASET.NAME", "Cifar10", "INPUT.SIZE", "(32, 32)", "SEED", "1",
              "MODEL.HEAD.NAME", "mlp", "MODEL.HEAD.HIDDEN_LAYERS", "(128,)"],
    ).items():
        setattr(args, k, v)
    out = federated_main.main(args)
    assert np.isfinite(out["acc"][0])

    cfg = federated_main.setup_cfg(args)
    tr = build_trainer(cfg)
    # resnet18 structure: 4 stages of 2 BasicBlocks + head + classifier
    assert "layer4" in tr.trainable["backbone"]["conv"]
    assert len(tr.trainable["backbone"]["conv"]["layer1"]) == 2
    assert tr.trainable["classifier"]["weight"].shape == (10, 128)

    # state_dict round-trips through the federated exchange, stats included
    sd = tr.state_dict()
    assert any(k.startswith("stats.") for k in sd)
    sd2 = {k: v + 1.0 for k, v in sd.items()}
    tr.load_state_dict(sd2)
    sd3 = tr.state_dict()
    np.testing.assert_allclose(sd3["classifier.bias"], sd["classifier.bias"] + 1.0)
