"""Benchmark: FairLoRA CLIP ViT-B/16 federated throughput on TPU.

Canonical run shape (scripts/fairfedlora_fairfedmed.sh): batch 32, 224×224,
FairLoRA rank 12 / α 2 on every resblock MLP, 2 prompts × 4 ctx tokens,
OT=None, fp16→bf16.  Prints ONE JSON line.

Three measured sections, each run in its OWN subprocess with one retry —
the remote-TPU ("axon") tunnel fails transiently (FAILED_PRECONDITION /
stalls), and a wedged in-process backend cannot be recovered, only replaced
(this killed the entire round-2 artifact: BENCH_r02.json rc=1):

* ``step``  — train-step throughput of the flagship model (headline metric)
  plus ``mfu`` (analytic model FLOPs / chip peak).
* ``round`` — one full federated round through the CLI machinery on the
  client-parallel mesh path (synthetic FairFedMed fixture: NPZ loading +
  train + eval + aggregation), the BASELINE.md north-star unit, at the
  2-client/80-img-per-client fixture.
* ``round_prod`` — the same round bench at a production-scale fixture
  (2048 train + 64 test imgs/client, the "thousands of images per site"
  regime of the real FairFedMed sites), where the fixed per-round cost
  amortizes; emitted as ``round_prod_imgs_per_sec``.

``vs_baseline`` compares against REF_GPU_IMGS_PER_SEC — the PyTorch
reference's throughput for this exact model/batch on its single-GPU setup.
The repo publishes no timing numbers (SURVEY §6), so the constant is DERIVED,
not measured: DeiT (Touvron et al., Table 1) reports 292 img/s for an
optimized ViT-B/16 fp16 *training* loop on one V100 at batch 256; the
reference runs the same backbone eagerly at batch 32 with a per-step host
sync, LoRA adapters on every MLP, and a second text-tower forward — a
0.55-0.65× factor on published eager-vs-optimized ViT numbers, giving
≈160-190 img/s.  We use the midpoint 175.  Round-level baselines are derived
PER FIXTURE by :func:`ref_round_baseline` from the same 175 img/s plus the
reference round loop's fixed costs (federated_main.py:616-726).
``baseline_basis`` fields record the derivations; the self-contained honest
number is ``mfu``.

Env knobs: ``BENCH_MODE=step|round|round_prod|round_oct|round_rn50`` runs one
section in-process (used by the subprocess fan-out; also handy standalone).
``BENCH_SKIP_ROUND=1`` skips every round bench, ``BENCH_SKIP_PROD=1`` only
the production-scale one, ``BENCH_SKIP_OCT=1`` / ``BENCH_SKIP_RN50=1`` the
OCT-3D volume round and the RN50-backbone round (captured by default).

Budget discipline (round-3 post-mortem: the driver's outer timeout killed the
whole bench before ONE byte of output — BENCH_r03.json rc=124, empty):

* ``BENCH_BUDGET_S`` (default 1380 s) is a TOTAL wall-clock budget enforced
  by the orchestrator; each section gets ``min(cap, remaining/sections_left)``
  and sections that no longer fit are recorded as ``<name>_skipped: "budget"``
  instead of being attempted.
* The merged JSON record is printed AND flushed after EVERY section (the
  driver takes the last parseable line), so a kill at any point still leaves
  the newest complete snapshot, starting with the headline step number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REF_GPU_IMGS_PER_SEC = 175.0
BASELINE_BASIS = ("derived: DeiT Table-1 292 img/s (ViT-B/16 fp16 train, V100, "
                  "optimized) x 0.6 eager/batch-32/per-step-sync factor")
# Reference round-loop fixed costs (federated_main.py:616-726): one full
# state_dict deepcopy + load_state_dict per client (~300 MB fp16) plus the
# host-loop aggregation over ~200 tensors ≈ 0.2 s per client; eval runs
# forward-only eager ≈ 3x the train rate.
REF_ROUND_FIXED_S_PER_CLIENT = 0.2
REF_EVAL_SPEEDUP = 3.0
ROUND_BASELINE_BASIS = ("derived per fixture: 175 img/s step rate, eval at 3x "
                        "(forward-only eager), + 0.2 s/client deepcopy/"
                        "load_state_dict/host-aggregation fixed cost of the "
                        "reference round loop (federated_main.py:616-726)")
BATCH = 32
WARMUP = 3
ITERS = 50  # ~1.8s measured window — tunnel-noise resistant

# chip peak bf16 FLOP/s by device kind (jax device_kind substrings)
_PEAK_FLOPS = (("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
               ("v4", 275e12), ("v6", 918e12))


def ref_round_baseline(users: int, n_train: int, n_test: int,
                       slices_per_item: float = 1.0) -> float:
    """Derived reference ROUND rate (items/s) at a given fixture: train at 175
    slice-images/s, eval at 3x, plus the per-client fixed cost.  At the
    historical 2-client/64+16 2D fixture this reproduces the round-2
    constant (133).

    ``slices_per_item`` charges the reference its TRUE per-item ViT cost for
    3D volumes: both implementations subsample 128->32 B-scans (reference
    utils/data_utils.py:637, ours data/datasets/fairfedmed.py:224) and split
    them into DIM_PER_3D_SLICE(=16)-channel groups, each projected to one
    pseudo-RGB slice image through the full ViT
    (GLP_OT_SVLoRA.py:683-693) -> 2 ViT forwards per volume.  Charging a
    volume as ONE 2D image would understate the reference's cost 2x."""
    rate = REF_GPU_IMGS_PER_SEC / slices_per_item
    train_s = users * n_train / rate
    eval_s = users * n_test / (REF_EVAL_SPEEDUP * rate)
    fixed_s = REF_ROUND_FIXED_S_PER_CLIENT * users
    return users * (n_train + n_test) / (train_s + eval_s + fixed_s)


def _chip_peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_FLOPS:
        if sub in kind:
            return peak
    return 197e12  # default: v5e-class


def vit_train_flops_per_image(cfg, n_text_seqs: int = 4, remat: bool = True) -> float:
    """Analytic model FLOPs for one image's train step (MACs x 2).

    Vision tower per layer: QKV+out projections, attention scores+mix, 4x MLP;
    plus patch embedding.  Text tower runs n_text_seqs sequences of length 77
    per STEP (amortized per image by the caller).  Backward = 2x forward;
    remat recomputes forward once more (both the default "attn_res" policy
    and full-block remat replay the whole forward in backward — attn_res
    only shortens the serial recompute chain, not the recompute FLOPs).
    """
    M = (cfg.image_resolution // cfg.vision_patch_size) ** 2 + 1
    d = cfg.vision_width
    L = cfg.vision_layers
    per_layer = (2 * 4 * M * d * d      # q,k,v,out projections
                 + 2 * 2 * M * M * d    # scores + weighted sum
                 + 2 * 2 * M * d * 4 * d)  # MLP in+out
    fwd = L * per_layer + 2 * M * 3 * cfg.vision_patch_size ** 2 * d
    T, td, tL = 77, cfg.transformer_width, cfg.transformer_layers
    text_per_layer = 2 * 4 * T * td * td + 2 * 2 * T * T * td + 2 * 2 * T * td * 4 * td
    text_fwd = n_text_seqs * tL * text_per_layer
    mult = 4.0 if remat else 3.0  # fwd + bwd(2x) [+ remat recompute]
    return fwd * mult + text_fwd * mult / BATCH


def main(emit=True):
    import jax
    import numpy as np
    import optax

    from __graft_entry__ import _build_flagship
    from fairfedmed_tpu.train.clip_common import cross_entropy

    frozen, trainable, forward, clip_cfg = _build_flagship(
        backbone="ViT-B/16", rank=12, num_groups=3)
    tx = optax.sgd(1e-3, momentum=0.9, nesterov=False)
    opt_state = tx.init(trainable)

    import jax.numpy as jnp

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

    from fairfedmed_tpu.utils.profiling import stamp

    stamp("bench_step:model_built")
    for _ in range(WARMUP):
        trainable, opt_state, loss = step(trainable, opt_state, frozen, image, label, attr)
    float(np.asarray(loss))  # force full execution (block_until_ready can be
    # a no-op over remote-TPU tunnels; a value fetch cannot)
    stamp("bench_step:warmup_done")

    t0 = time.perf_counter()
    for _ in range(ITERS):
        trainable, opt_state, loss = step(trainable, opt_state, frozen, image, label, attr)
    final_loss = float(np.asarray(loss))  # chains through all ITERS steps
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    imgs_per_sec = BATCH * ITERS / dt
    flops_per_img = vit_train_flops_per_image(clip_cfg)
    mfu = imgs_per_sec * flops_per_img / _chip_peak_flops()
    record = {
        "metric": "fairlora_vitb16_train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REF_GPU_IMGS_PER_SEC, 3),
        "mfu": round(mfu, 4),
        "baseline_basis": BASELINE_BASIS,
    }
    if emit:
        print(json.dumps(record))
    return record


def main_round(emit=True, users=2, n_train=64, n_test=16, n_rounds=6,
               modality="slo_fundus", backbone="ViT-B/16", tag="round"):
    """Federated FairLoRA rounds end-to-end (loading+train+eval+agg) through
    the client-parallel mesh path (--parallel_clients); steady-state rate is
    the median of the post-warmup per-round times."""
    import shutil
    import tempfile

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.fixtures import make_fairfedmed_fixture
    import federated_main

    work = tempfile.mkdtemp(prefix="benchround_")
    # the embedded run must NOT inherit the user's round-checkpoint dir:
    # it would resume the bench fixture from (or prune) a real run's state
    saved_ckpt_env = os.environ.pop("FAIRFEDMED_ROUND_CKPT", None)
    try:
        # OCT volumes are generated at the model resolution (no host resize)
        # so pixels stay integral and the runner's device cache rides uint8 —
        # the 6.6 GB fp32 cache transfer was the dominant round-0 cost over
        # the tunnel (and the reason round_oct could blow a slow-tunnel
        # section budget).  Non-OCT sections keep tiny OCT payloads.
        oct_kw = (dict(oct_hw=224) if modality.startswith("oct")
                  else dict(oct_depth=4, oct_hw=8))
        # fixtures are seeded-deterministic: CACHE them across bench sections
        # and retries (the production fixture is 4k NPZ files, minutes to
        # regenerate on the 1-core host).  Built in a tmp dir and atomically
        # renamed so a concurrent bench never sees a half-written cache.
        # v2: uint8 payloads, OCT at full resolution.
        cache = os.path.join(
            tempfile.gettempdir(), "ffm_bench_fixtures",
            f"{users}_{n_train}_{n_test}_{modality.split('_')[0]}_v2")
        if not os.path.isdir(os.path.join(cache, "fairfedmed")):
            build = tempfile.mkdtemp(prefix="ffmfix_")
            make_fairfedmed_fixture(build, n_sites=users, n_train=n_train,
                                    n_test=n_test, size=224, **oct_kw)
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            try:
                os.rename(build, cache)
            except OSError:  # lost the race: another process built it
                shutil.rmtree(build, ignore_errors=True)
        data_root = cache
        parser = federated_main.build_arg_parser()
        args = parser.parse_args([])
        args.opts = ["DATASET.NAME", "FairFedMed", "INPUT.SIZE", "(224, 224)",
                     "SEED", "1", "TEST.EVALUATOR", "Classification_oph"]
        rank, alpha = (32, 8.0) if backbone.startswith("RN") else (12, 2.0)
        for k, v in dict(
            model="FedOTPLoRA", trainer="GLP_OT_SVLoRA", round=n_rounds,
            num_users=users,
            frac=1.0, root=data_root, output_dir=os.path.join(work, "out"),
            train_batch_size=32, test_batch_size=32, n_ctx=4, num_prompt=2,
            avg_prompt=1, OT="None", backbone=backbone, attribute_type="race",
            attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
            modality_type=modality, unfreeze_image_encoder=True,
            lora_rank=rank, lora_alpha=alpha, lora_type="FairLoRA",
            parallel_clients=True,
            config_file="", dataset_config_file="", resume=None,
        ).items():
            setattr(args, k, v)
        # the CLI chats on stdout; the bench contract is ONE JSON line
        import contextlib

        with open(os.path.join(work, "round.log"), "w") as log, \
                contextlib.redirect_stdout(log):
            out = federated_main.main(args)
        # rounds 0-1 pay compiles and cache warm-up (device-resident data,
        # resharded-state retraces); steady state = MEDIAN of the remaining
        # per-round times (a single round is noisy over the remote-TPU tunnel)
        import statistics

        deltas = [out["time"][i] - out["time"][i - 1]
                  for i in range(2, len(out["time"]))]  # rounds 2..n-1
        steady = statistics.median(deltas)
        imgs = users * (n_train + n_test)  # train + eval images per round
        # 3D volumes cost (32 subsampled B-scans / DIM_PER_3D_SLICE=16) = 2
        # full ViT slice forwards apiece in BOTH implementations
        slices_per_item = 2.0 if modality in ("oct_bscans",) else 1.0
        baseline = ref_round_baseline(users, n_train, n_test,
                                      slices_per_item=slices_per_item)
        record = {
            "metric": f"fairlora_{backbone.replace('/', '').replace('-', '').lower()}"
                      f"_fed_{tag}_imgs_per_sec_per_chip",
            "value": round(imgs / steady, 2),
            "unit": "images/sec/chip (full round: load+train+eval+agg)",
            "fixture": {"users": users, "train_per_client": n_train,
                        "test_per_client": n_test, "modality": modality,
                        "backbone": backbone},
            "baseline_round_imgs_per_sec": round(baseline, 1),
            "vs_baseline": round((imgs / steady) / baseline, 3),
            "baseline_basis": ROUND_BASELINE_BASIS,
        }
        if slices_per_item != 1.0:
            record["fixture"]["vit_forwards_per_item"] = slices_per_item
            record["baseline_note"] = (
                "reference rate derived from the ViT-B/16 2D step rate, "
                "slice-adjusted for 3D volumes (each volume = 2 full ViT "
                "forwards on BOTH sides); treat vs_baseline as indicative")
        elif backbone != "ViT-B/16" or modality != "slo_fundus":
            record["baseline_note"] = (
                "reference rate derived for ViT-B/16 on 2D images; treat "
                "vs_baseline as indicative only for this backbone/modality")
        if emit:
            print(json.dumps(record))
        return record
    finally:
        if saved_ckpt_env is not None:
            os.environ["FAIRFEDMED_ROUND_CKPT"] = saved_ckpt_env
        shutil.rmtree(work, ignore_errors=True)


def _selftest_flaky():
    """Fault-injection mode for testing _run_section's retry: the first
    invocation (per marker file) dies like a transient tunnel failure, the
    second succeeds.  Used by tests/test_bench_retry.py; never scheduled by
    the orchestrator."""
    import tempfile

    marker = os.path.join(tempfile.gettempdir(),
                          os.environ.get("BENCH_SELFTEST_MARKER",
                                         "bench_selftest_marker"))
    if not os.path.exists(marker):
        open(marker, "w").close()
        print("simulated transient FAILED_PRECONDITION", file=sys.stderr)
        sys.exit(3)
    os.remove(marker)
    print(json.dumps({"metric": "selftest", "value": 1.0, "unit": "ok"}))


_MODES = {
    "step": lambda: main(emit=True),
    "selftest_flaky": _selftest_flaky,
    "round": lambda: main_round(emit=True),
    "round_prod": lambda: main_round(emit=True, n_train=2048, n_test=64,
                                     n_rounds=5, tag="round_prod"),
    # 256 vols/client amortizes the fixed round latency (the 16+8 smoke
    # fixture measured latency, not compute: 48 vols/round ~= 0.3 s)
    "round_oct": lambda: main_round(emit=True, n_train=256, n_test=16,
                                    n_rounds=5, modality="oct_bscans",
                                    tag="round_oct"),
    # RN50 at the production-scale fixture (reuses the round_prod fixture
    # cache): the 64+16 smoke fixture measured tunnel-latency spread
    # (280-780 img/s), not the backbone
    "round_rn50": lambda: main_round(emit=True, n_train=2048, n_test=64,
                                     n_rounds=5, backbone="RN50",
                                     tag="round_rn50"),
}


# A section attempt shorter than this cannot finish even warm-cache (jit
# compiles alone are ~40 s over the tunnel); don't bother starting it.
MIN_SECTION_S = 150


def _run_section(mode: str, timeout_s: float, remaining_s=None):
    """Run one measured section in a fresh subprocess; retry ONCE on failure
    if the budget still allows a full second attempt.

    A transient tunnel error (FAILED_PRECONDITION, stall) can wedge the
    in-process TPU backend beyond recovery — a fresh process is the only
    reliable retry (CLAUDE.md: "the tunnel stalls intermittently — retry once
    before debugging").  Returns (record | None, attempts, last_error).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    # build-phase stamps on stderr (free: one-off at startup, outside the
    # measured rounds) so a timed-out attempt reports WHERE it stalled, and
    # the tunnel-stall watchdog (utils/tunnel.py) so a wedged relay gets
    # poked instead of eating the whole section slice
    env = dict(os.environ, BENCH_MODE=mode, FAIRFEDMED_BUILD_STAMPS="1",
               FAIRFEDMED_TUNNEL_POKER="1")
    last_err = None
    for attempt in (1, 2):
        if attempt == 2 and remaining_s is not None:
            # the retry benefits from the compile cache the first attempt
            # populated but may still be finishing cold work (measured: a
            # cold-cache round_prod retry needed 575 s of its 600 s slice);
            # give it up to 1.5x the nominal slice if the budget allows
            timeout_s = min(max(remaining_s() - 10, MIN_SECTION_S),
                            timeout_s * 1.5)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(here, "bench.py")],
                cwd=here, env=env, capture_output=True, text=True,
                timeout=timeout_s)
        except subprocess.TimeoutExpired as e:
            last_err = f"timeout after {timeout_s:.0f}s"
            err_txt = e.stderr
            if isinstance(err_txt, bytes):
                err_txt = err_txt.decode(errors="replace")
            lines = (err_txt or "").strip().splitlines()
            if lines:  # the last build stamp localizes the stall
                last_err += " | last stderr: " + lines[-1][-200:]
        else:
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                return rec, attempt, None
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-6:]
            last_err = f"rc={proc.returncode}: " + " | ".join(tail)[-500:]
        if attempt == 1 and remaining_s is not None \
                and remaining_s() < timeout_s + 10:
            return None, 1, last_err + " (no budget for retry)"
    return None, 2, last_err


def orchestrate():
    """Run all sections as budgeted subprocesses under BENCH_BUDGET_S total
    wall-clock; print+flush the merged JSON record after EVERY section."""
    t0 = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1380"))

    def remaining():
        return budget - (time.monotonic() - t0)

    record = {"metric": "fairlora_vitb16_train_imgs_per_sec_per_chip",
              "value": None, "unit": "images/sec/chip",
              "budget_s": budget}

    def emit():
        record["elapsed_s"] = round(time.monotonic() - t0, 1)
        sys.stdout.write(json.dumps(record) + "\n")
        sys.stdout.flush()

    # priority order: the headline step metric first (flushed immediately, so
    # even a hard kill right after leaves a usable artifact), then the
    # north-star production round, then the secondary paths; the small 64+16
    # fixture (tunnel-latency dominated, least informative) goes last.
    sections = []
    if os.environ.get("BENCH_SKIP_ROUND") != "1":
        if os.environ.get("BENCH_SKIP_PROD") != "1":
            sections.append(("round_prod", "round_prod"))
        if os.environ.get("BENCH_SKIP_OCT") != "1":
            sections.append(("round_oct", "round_oct"))
        if os.environ.get("BENCH_SKIP_RN50") != "1":
            sections.append(("round_rn50", "round_rn50"))
        sections.append(("round", "round"))

    # headline step section: cap at a third of the budget, leaving room for
    # the round sections even if the tunnel eats a retry
    step_rec, attempts, err = _run_section(
        "step", min(budget / 3, max(remaining() - 10, MIN_SECTION_S)),
        remaining_s=remaining)
    if step_rec is not None:
        record.update(step_rec)
    else:
        record["error"] = err  # even a doubly-failed step bench leaves a line
    if attempts > 1:
        record["step_retries"] = attempts - 1
    emit()

    for i, (mode, prefix) in enumerate(sections):
        # reserve only the minimum viable slice for each LATER section: an
        # even remaining/sections_left split starves the expensive early
        # sections (round_prod needs ~200 s warm but a 1080/5 split caps it
        # at ~250 s — one slow fixture decode away from a spurious timeout),
        # while later sections reuse the caches the early ones populate
        share = remaining() - MIN_SECTION_S * (len(sections) - i - 1)
        if share < MIN_SECTION_S:
            record[f"{prefix}_skipped"] = "budget"
            emit()
            continue
        rec, attempts, err = _run_section(mode, min(share, 600),
                                          remaining_s=remaining)
        if rec is None:
            record[f"{prefix}_error"] = err
        else:
            record[f"{prefix}_imgs_per_sec"] = rec["value"]
            record[f"{prefix}_vs_baseline"] = rec["vs_baseline"]
            record[f"{prefix}_baseline_imgs_per_sec"] = rec["baseline_round_imgs_per_sec"]
            record[f"{prefix}_fixture"] = rec["fixture"]
        if attempts > 1:
            record[f"{prefix}_retries"] = attempts - 1
        if record.get("round_imgs_per_sec") and record.get("value"):
            record["round_vs_step"] = round(
                record["round_imgs_per_sec"] / record["value"], 4)
        # the north-star comparison (BASELINE.md round-level unit), taken at
        # the production-scale fixture when captured, else the small fixture
        for key in ("round_prod_vs_baseline", "round_vs_baseline"):
            if key in record:
                record["round_vs_baseline_round"] = record[key]
                break
        emit()
    return record


if __name__ == "__main__":
    # Persistent XLA compilation cache (jax reads the env var natively, and
    # subprocess sections inherit it): the round sections' fused programs
    # cost ~600 s of compiles cold but ~0 warm — measured round_prod wall
    # time drops 800 s -> 192 s.  /tmp persists across bench invocations on
    # the same host, so the driver's end-of-round run reuses today's cache.
    import tempfile

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "ffm_xla_cache"))
    mode = os.environ.get("BENCH_MODE", "")
    if mode:
        if mode not in _MODES:
            sys.exit(f"unknown BENCH_MODE={mode!r}; one of {sorted(_MODES)}")
        # stall watchdog for sections run standalone (the orchestrator's
        # children start it via federated_main; step mode has no CLI)
        from fairfedmed_tpu.utils.tunnel import start_tunnel_poker
        start_tunnel_poker()
        _MODES[mode]()
    else:
        orchestrate()
