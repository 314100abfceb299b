"""Trainer-level loss components: fairness regulariser + FedProx penalty."""

import jax
import jax.numpy as jnp
import numpy as np

from fairfedmed_tpu.train.clip_common import cross_entropy, fairness_confidence_loss


def _batch():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((12, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 12), jnp.int32)
    attr = jnp.asarray(rng.integers(0, 3, 12), jnp.int32)
    return logits, labels, attr


def test_fairness_loss_value_matches_manual():
    logits, labels, attr = _batch()
    loss = float(fairness_confidence_loss(logits, labels, attr, 3,
                                          differentiable=True))
    probs = np.asarray(jax.nn.softmax(logits, -1))
    correct = probs[np.arange(12), np.asarray(labels)]
    confs = []
    for g in range(3):
        m = np.asarray(attr) == g
        if m.any():
            confs.append(1.0 - correct[m].mean())
    confs = np.asarray(confs)
    expected = np.abs(confs - confs.mean()).mean()
    assert abs(loss - expected) < 1e-6


def test_fairness_loss_detached_reproduces_reference_quirk():
    """GLP_OT_SVLoRA.py:924,:943 builds the group vector via
    torch.tensor(list(...)) which detaches it — zero gradient."""
    logits, labels, attr = _batch()

    def detached(lg):
        return fairness_confidence_loss(lg, labels, attr, 3, differentiable=False)

    def live(lg):
        return fairness_confidence_loss(lg, labels, attr, 3, differentiable=True)

    g_detached = jax.grad(detached)(logits)
    g_live = jax.grad(live)(logits)
    assert float(jnp.abs(g_detached).max()) == 0.0
    assert float(jnp.abs(g_live).max()) > 0.0


def test_fairness_loss_single_group_is_zero():
    logits, labels, _ = _batch()
    attr = jnp.zeros((12,), jnp.int32)
    loss = float(fairness_confidence_loss(logits, labels, attr, 3,
                                          differentiable=True))
    assert loss == 0.0


def test_fedprox_penalty_pulls_ctx_toward_global():
    """loss += (mu/2)||ctx - ctx_global||^2 (promptfl.py:290-293): gradient
    of the penalty is mu*(ctx - global)."""
    mu = 0.5
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 8)), jnp.float32)
    ctx_global = jnp.zeros_like(ctx)

    def penalty(c):
        return 0.5 * mu * jnp.sum((c - ctx_global) ** 2)

    g = jax.grad(penalty)(ctx)
    np.testing.assert_allclose(np.asarray(g), mu * np.asarray(ctx), rtol=1e-6)


def test_promptfl_medical_input_raw_by_default():
    """The reference PromptFL/CLIP forward consumes RAW 0-255 pixels on the
    medical datasets (promptfl.py:211-224, clip.py:218-231 — their loaders
    skip transforms and only the GLP models normalize inside forward).
    _device_preprocess must mirror that by default and normalize only under
    TRAINER.PROMPTFL.NORMALIZE_MEDICAL_INPUT."""
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.train.trainers.promptfl import _CosineCLIPTrainer

    cfg = get_cfg_default()
    cfg.DATASET.NAME = "FairFedMed"
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]

    tr = _CosineCLIPTrainer.__new__(_CosineCLIPTrainer)
    tr.cfg = cfg
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (2, 3, 8, 8)), jnp.float32)

    raw = np.asarray(tr._device_preprocess(img))
    np.testing.assert_array_equal(raw, np.asarray(img))

    cfg.TRAINER.PROMPTFL.NORMALIZE_MEDICAL_INPUT = True
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32).reshape(1, -1, 1, 1)
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32).reshape(1, -1, 1, 1)
    normed = np.asarray(tr._device_preprocess(img))
    np.testing.assert_allclose(
        normed, (np.asarray(img) / 255.0 - mean) / std, rtol=1e-6)


def test_cross_entropy_matches_manual():
    logits, labels, _ = _batch()
    loss = float(cross_entropy(logits, labels))
    p = np.asarray(jax.nn.log_softmax(logits, -1))
    expected = -p[np.arange(12), np.asarray(labels)].mean()
    assert abs(loss - expected) < 1e-6


def test_differentiable_fairness_knob_plumbs(tmp_path):
    """TRAINER.GLP_OT_LORA.DIFFERENTIABLE_FAIRNESS must reach the trainer's
    loss: same loss value either way, different gradients when on."""
    import sys

    sys.path.insert(0, ".")
    import federated_main
    from tests.fixtures import make_fairfedmed_fixture
    from fairfedmed_tpu.train import build_trainer

    make_fairfedmed_fixture(str(tmp_path), n_sites=1, n_train=8, n_test=4, size=32)

    def build(diff):
        parser = federated_main.build_arg_parser()
        args = parser.parse_args([])
        args.opts = []
        for k, v in dict(
            model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=1, num_users=1,
            frac=1.0, root=str(tmp_path), output_dir=str(tmp_path / "o"),
            train_batch_size=4, test_batch_size=4, n_ctx=4, num_prompt=2,
            avg_prompt=1, OT="None", backbone="test-vit", attribute_type="race",
            attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
            modality_type="slo_fundus", unfreeze_image_encoder=True,
            lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
            lambda_fairness=0.5, differentiable_fairness=diff,
            config_file="", dataset_config_file="",
            opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)",
                  "SEED", "1", "TEST.EVALUATOR", "Classification_oph",
                  "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
                  "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"],
        ).items():
            setattr(args, k, v)
        cfg = federated_main.setup_cfg(args)
        return build_trainer(cfg)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, (4, 3, 32, 32)), jnp.float32)
    label = jnp.asarray([0, 1, 0, 1], jnp.int32)
    attr = jnp.asarray([0, 1, 2, 0], jnp.int32)

    grads = {}
    losses = {}
    for diff in (False, True):
        tr = build(diff)
        loss_fn = tr._build_loss_fn()

        def scalar(t):
            return loss_fn(t, tr.frozen, {}, image, label, attr, None,
                           jnp.float32(0.0))[0]

        losses[diff] = float(scalar(tr.trainable))
        grads[diff] = jax.grad(scalar)(tr.trainable)

    # fairness term contributes to the VALUE either way
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
    # ... but to the GRADIENT only when differentiable
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), grads[True], grads[False])
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


def test_differentiable_fedprox_knob_plumbs(tmp_path):
    """The reference's FedProx proximal term is built from detached
    state_dict() tensors (promptfl.py:290-293) — it inflates the reported
    loss with ZERO gradient.  Default mirrors that;
    TRAINER.DIFFERENTIABLE_FEDPROX enables the intended pull."""
    import sys

    sys.path.insert(0, ".")
    import federated_main
    from tests.fixtures import make_fairfedmed_fixture
    from fairfedmed_tpu.train import build_trainer

    make_fairfedmed_fixture(str(tmp_path), n_sites=1, n_train=8, n_test=4, size=32)

    def build(diff):
        parser = federated_main.build_arg_parser()
        args = parser.parse_args([])
        args.opts = []
        for k, v in dict(
            model="fedprox", trainer="GLP_OT_SVLoRA", round=1, num_users=1,
            frac=1.0, root=str(tmp_path), output_dir=str(tmp_path / "o"),
            train_batch_size=4, test_batch_size=4, n_ctx=4, num_prompt=2,
            avg_prompt=1, OT="None", backbone="test-vit", attribute_type="race",
            attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
            modality_type="slo_fundus", unfreeze_image_encoder=False,
            lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
            lambda_fairness=0.0, differentiable_fedprox=diff,
            config_file="", dataset_config_file="",
            opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)",
                  "SEED", "1", "TEST.EVALUATOR", "Classification_oph",
                  "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
                  "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"],
        ).items():
            setattr(args, k, v)
        cfg = federated_main.setup_cfg(args)
        return build_trainer(cfg)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, (4, 3, 32, 32)), jnp.float32)
    label = jnp.asarray([0, 1, 0, 1], jnp.int32)
    attr = jnp.asarray([0, 1, 2, 0], jnp.int32)

    grads = {}
    losses = {}
    for diff in (False, True):
        tr = build(diff)
        loss_fn = tr._build_loss_fn()
        ctx_global = jnp.zeros_like(
            tr.trainable["prompt_learner"]["ctx"], jnp.float32) + 0.25

        def scalar(t):
            return loss_fn(t, tr.frozen, {}, image, label, attr, ctx_global,
                           jnp.float32(0.5))[0]

        losses[diff] = float(scalar(tr.trainable))
        grads[diff] = jax.grad(scalar)(tr.trainable)

    # proximal term contributes to the VALUE either way
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
    # ... but to the GRADIENT only when differentiable
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), grads[True], grads[False])
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0
    # the detached default's ctx gradient comes from the CE term alone —
    # it must NOT contain the mu*(ctx - global) pull
    g_ctx = np.asarray(grads[True]["prompt_learner"]["ctx"]
                       - grads[False]["prompt_learner"]["ctx"])
    expected_pull = 0.5 * (np.asarray(tr.trainable["prompt_learner"]["ctx"],
                                      np.float64) - 0.25)
    np.testing.assert_allclose(g_ctx, expected_pull, rtol=1e-4, atol=1e-6)
