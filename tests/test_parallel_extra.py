"""Edge cases of the client-parallel round machinery: ragged batch streams,
LOCAL_S + idxs_users_train personalization parity."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

sys.path.insert(0, ".")
import federated_main  # noqa: E402

from fairfedmed_tpu.core.mesh import build_mesh
from fairfedmed_tpu.fed.parallel import make_client_train_round
from tests.fixtures import make_fairfedmed_fixture  # noqa: E402


def test_ragged_client_streams_mask_padded_steps():
    """A client with fewer batches must end up exactly where a manual loop
    over ONLY its real batches lands — padded steps are no-ops for params,
    optimizer state, and metrics."""
    mesh = build_mesh(num_clients=2, devices=jax.devices()[:2])
    tx = optax.sgd(0.1, momentum=0.9)

    def local_step(t, o, frozen, batch):
        def loss_fn(t):
            pred = batch["x"] @ t["w"]
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(t)
        updates, o = tx.update(grads, o, t)
        return optax.apply_updates(t, updates), o, jnp.stack(
            [loss, jnp.float32(1.0), jnp.float32(0.0)])

    train_fn = make_client_train_round(mesh, local_step)

    rng = np.random.default_rng(0)
    S, B, D = 4, 8, 3
    xs = rng.normal(size=(2, S, B, D)).astype(np.float32)
    ys = rng.normal(size=(2, S, B)).astype(np.float32)
    w0 = rng.normal(size=(2, D)).astype(np.float32)
    t0 = {"w": jnp.asarray(w0)}
    o0 = jax.vmap(tx.init)({"w": jnp.asarray(w0)})

    n_steps = jnp.asarray([4, 2], jnp.int32)  # client 1 is ragged
    batches = {"x": jnp.asarray(xs), "y": jnp.asarray(ys)}
    trained, _, metrics = train_fn(t0, o0, {}, batches, n_steps)

    # manual reference: client 1 trains on its first 2 batches only
    for client, steps in ((0, 4), (1, 2)):
        t = {"w": jnp.asarray(w0[client])}
        o = tx.init(t)
        for s in range(steps):
            t, o, _ = local_step(
                t, o, {}, {"x": jnp.asarray(xs[client, s]),
                           "y": jnp.asarray(ys[client, s])})
        np.testing.assert_allclose(np.asarray(trained["w"][client]),
                                   np.asarray(t["w"]), rtol=1e-5, atol=1e-6)
    # padded steps report zeroed metrics
    ms = np.asarray(metrics)
    assert ms[1, 2:, 1].max() == 0.0  # valid flag zero on padded steps
    assert ms[0, :, 1].min() == 1.0


def _args(**overrides):
    parser = federated_main.build_arg_parser()
    args = parser.parse_args([])
    args.opts = []
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def test_parallel_local_s_and_train_list_parity(tmp_path):
    """LOCAL_S personalization + explicit idxs_users_train must match the
    sequential path (local lora_S and local prompt rows kept per client)."""
    root = tmp_path / "data"
    make_fairfedmed_fixture(str(root), n_sites=2, n_train=8, n_test=6, size=32)

    def run(parallel, outdir):
        args = _args(
            model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=2, num_users=2,
            frac=1.0, root=str(root), output_dir=outdir,
            train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
            avg_prompt=1, OT="None", backbone="test-vit", attribute_type="race",
            attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
            modality_type="slo_fundus", unfreeze_image_encoder=True,
            lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
            lora_local_s=True, idxs_users_train=[0, 1], idxs_users_test=[0, 1],
            parallel_clients=parallel,
            config_file="", dataset_config_file="",
            opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)",
                  "SEED", "1", "TEST.EVALUATOR", "Classification_oph",
                  "TRAINER.GLP_OT.PREC", "fp32",
                  "OPTIM.NAME", "sgd", "OPTIM.MOMENTUM", "0.0",
                  "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
                  "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"],
        )
        return federated_main.main(args)

    out_seq = run(False, str(tmp_path / "seq"))
    out_par = run(True, str(tmp_path / "par"))
    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        for k in seq.files:
            np.testing.assert_allclose(par[k], seq[k], rtol=1e-4, atol=1e-5,
                                       err_msg=f"client {idx} key {k}")


def test_parallel_linearft_parity(tmp_path):
    """FedOTPLinearFT (plain FedAvg + ungated per-client local rows/lora_S)
    must match the sequential path with a momentum-free optimizer."""
    root = tmp_path / "data"
    make_fairfedmed_fixture(str(root), n_sites=2, n_train=8, n_test=6, size=32)

    def run(parallel, outdir):
        args = _args(
            model="FedOTPLinearFT", trainer="GLP_OT_SVLoRA", round=2,
            num_users=2, frac=1.0, root=str(root), output_dir=outdir,
            train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
            avg_prompt=1, OT="None", backbone="test-vit", attribute_type="race",
            attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
            modality_type="slo_fundus", unfreeze_image_encoder=True,
            lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
            lora_local_s=True, parallel_clients=parallel,
            config_file="", dataset_config_file="",
            opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)",
                  "SEED", "1", "TEST.EVALUATOR", "Classification_oph",
                  "TRAINER.GLP_OT.PREC", "fp32",
                  "OPTIM.NAME", "sgd", "OPTIM.MOMENTUM", "0.0",
                  "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
                  "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"],
        )
        return federated_main.main(args)

    out_seq = run(False, str(tmp_path / "seq"))
    out_par = run(True, str(tmp_path / "par"))
    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        for k in seq.files:
            np.testing.assert_allclose(par[k], seq[k], rtol=1e-4, atol=1e-5,
                                       err_msg=f"client {idx} key {k}")


def test_parallel_fedprox_parity(tmp_path):
    """fedprox (global start, proximal pull to the round's global prompt,
    plain FedAvg, eval on selected users) must match sequentially."""
    root = tmp_path / "data"
    make_fairfedmed_fixture(str(root), n_sites=2, n_train=8, n_test=6, size=32)

    def run(parallel, outdir):
        args = _args(
            model="fedprox", trainer="GLP_OT_SVLoRA", round=2, num_users=2,
            frac=1.0, mu=0.7, root=str(root), output_dir=outdir,
            train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
            avg_prompt=1, OT="None", backbone="test-vit", attribute_type="race",
            attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
            modality_type="slo_fundus", unfreeze_image_encoder=True,
            lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
            parallel_clients=parallel,
            config_file="", dataset_config_file="",
            opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)",
                  "SEED", "1", "TEST.EVALUATOR", "Classification_oph",
                  "TRAINER.GLP_OT.PREC", "fp32",
                  "OPTIM.NAME", "sgd", "OPTIM.MOMENTUM", "0.0",
                  "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
                  "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"],
        )
        return federated_main.main(args)

    out_seq = run(False, str(tmp_path / "seq"))
    out_par = run(True, str(tmp_path / "par"))
    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)


def test_parallel_frac_sampling_parity(tmp_path):
    """frac<1: round 0 trains all clients, later rounds a sampled subset —
    per-round mesh/program caches must keep parity with the sequential path."""
    root = tmp_path / "data"
    make_fairfedmed_fixture(str(root), n_sites=2, n_train=8, n_test=6, size=32)

    def run(parallel, outdir):
        args = _args(
            model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=3, num_users=2,
            frac=0.5, root=str(root), output_dir=outdir,
            train_batch_size=4, test_batch_size=6, n_ctx=4, num_prompt=2,
            avg_prompt=1, OT="None", backbone="test-vit", attribute_type="race",
            attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
            modality_type="slo_fundus", unfreeze_image_encoder=True,
            lora_rank=4, lora_alpha=2.0, lora_type="FairLoRA",
            parallel_clients=parallel,
            config_file="", dataset_config_file="",
            opts=["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(32, 32)",
                  "SEED", "1", "TEST.EVALUATOR", "Classification_oph",
                  "TRAINER.GLP_OT.PREC", "fp32",
                  "OPTIM.NAME", "sgd", "OPTIM.MOMENTUM", "0.0",
                  "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
                  "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"],
        )
        return federated_main.main(args)

    out_seq = run(False, str(tmp_path / "seq"))
    out_par = run(True, str(tmp_path / "par"))
    np.testing.assert_allclose(out_par["acc"], out_seq["acc"], atol=1e-6)
    for idx in range(2):
        seq = np.load(str(tmp_path / "seq" / f"global_client{idx}_final.npz"))
        par = np.load(str(tmp_path / "par" / f"global_client{idx}_final.npz"))
        for k in seq.files:
            np.testing.assert_allclose(par[k], seq[k], rtol=1e-4, atol=1e-5,
                                       err_msg=f"client {idx} key {k}")
