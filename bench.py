"""Benchmark: FairLoRA CLIP ViT-B/16 federated train-step throughput on TPU.

Canonical run shape (scripts/fairfedlora_fairfedmed.sh): batch 32, 224×224,
FairLoRA rank 12 / α 2 on every resblock MLP, 2 prompts × 4 ctx tokens,
OT=None, fp16→bf16.  Measures end-to-end forward+backward+update steps of the
flagship model and prints ONE JSON line.

``vs_baseline`` compares against REF_GPU_IMGS_PER_SEC — the PyTorch reference's
measured-class throughput for this exact model/batch on its single-GPU setup
(the repo publishes no timing numbers, SURVEY §6; this constant is our
documented estimate for a V100-class card running the reference eagerly:
~175 img/s for ViT-B/16 fp16 train-step at batch 32 with per-step host syncs).
Set ``BENCH_MODE=round`` to instead time one full federated round through
the CLI machinery (synthetic FairFedMed fixture, 2 clients, data loading +
train + eval + aggregation) and report images/sec/chip at round level — the
BASELINE.md north-star unit.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

REF_GPU_IMGS_PER_SEC = 175.0
BATCH = 32
WARMUP = 3
ITERS = 50  # ~1.8s measured window — tunnel-noise resistant


def main():
    from __graft_entry__ import _build_flagship
    from fairfedmed_tpu.train.clip_common import cross_entropy

    frozen, trainable, forward, clip_cfg = _build_flagship(
        backbone="ViT-B/16", rank=12, num_groups=3)
    tx = optax.sgd(1e-3, momentum=0.9, nesterov=False)
    opt_state = tx.init(trainable)

    # frozen rides as an ARGUMENT — closing over the 150M-param pytree would
    # embed it as MLIR constants and pull it all to host at trace time
    @jax.jit
    def step(trainable, opt_state, frozen, image, label, attr):
        def loss_fn(t):
            return cross_entropy(forward(t, frozen, image, attr), label)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    res = clip_cfg.image_resolution
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (BATCH, 3, res, res)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 2, (BATCH,)), jnp.int32)
    attr = jnp.asarray(rng.integers(0, 3, (BATCH,)), jnp.int32)

    for _ in range(WARMUP):
        trainable, opt_state, loss = step(trainable, opt_state, frozen, image, label, attr)
    float(np.asarray(loss))  # force full execution (block_until_ready can be
    # a no-op over remote-TPU tunnels; a value fetch cannot)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        trainable, opt_state, loss = step(trainable, opt_state, frozen, image, label, attr)
    final_loss = float(np.asarray(loss))  # chains through all ITERS steps
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    imgs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "fairlora_vitb16_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REF_GPU_IMGS_PER_SEC, 3),
    }))


def main_round():
    """One federated FairLoRA round end-to-end (loading+train+eval+agg)."""
    import os
    import shutil
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.fixtures import make_fairfedmed_fixture
    import federated_main

    work = tempfile.mkdtemp(prefix="benchround_")
    try:
        n_train, n_test, users = 64, 16, 2
        make_fairfedmed_fixture(work, n_sites=users, n_train=n_train,
                                n_test=n_test, size=224)
        parser = federated_main.build_arg_parser()
        args = parser.parse_args([])
        args.opts = ["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(224, 224)",
                     "SEED", "1", "TEST.EVALUATOR", "Classification_oph"]
        for k, v in dict(
            model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=2, num_users=users,
            frac=1.0, root=work, output_dir=os.path.join(work, "out"),
            train_batch_size=32, test_batch_size=32, n_ctx=4, num_prompt=2,
            avg_prompt=1, OT="None", backbone="ViT-B/16", attribute_type="race",
            attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
            modality_type="slo_fundus", unfreeze_image_encoder=True,
            lora_rank=12, lora_alpha=2.0, lora_type="FairLoRA",
            config_file="", dataset_config_file="",
        ).items():
            setattr(args, k, v)
        out = federated_main.main(args)
        # round 0 pays all compiles; round 1 is the steady-state measurement
        steady = out["time"][1] - out["time"][0]
        imgs = users * (n_train + n_test)  # train + eval images per round
        print(json.dumps({
            "metric": "fairlora_vitb16_fed_round_imgs_per_sec_per_chip",
            "value": round(imgs / steady, 2),
            "unit": "images/sec/chip (full round: load+train+eval+agg)",
            "vs_baseline": round((imgs / steady) / REF_GPU_IMGS_PER_SEC, 3),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    import os

    if os.environ.get("BENCH_MODE") == "round":
        main_round()
    else:
        main()
