"""Benchmark: FairLoRA CLIP ViT-B/16 federated throughput on TPU.

Canonical run shape (scripts/fairfedlora_fairfedmed.sh): batch 32, 224×224,
FairLoRA rank 12 / α 2 on every resblock MLP, 2 prompts × 4 ctx tokens,
OT=None, fp16→bf16.  Prints ONE JSON line.

Five measured sections:

* ``step``  — train-step throughput of the flagship model (headline metric)
  plus ``mfu`` (analytic model FLOPs / chip peak).
* ``round_prod`` — one full federated round through the CLI machinery on the
  client-parallel mesh path at a production-scale fixture (2048 train + 64
  test imgs/client, the "thousands of images per site" regime of the real
  FairFedMed sites); the BASELINE.md north-star unit.
* ``round_rn50`` — the same round bench with the RN50 backbone.
* ``round_oct`` — the round bench on 3D OCT volumes (oct_bscans modality).
* ``round`` — the small 2-client/80-img fixture (latency-dominated; least
  informative, runs last).

Execution model (round-5 redesign): ALL sections run inside ONE subprocess
(``BENCH_MODE=all``).  The remote-TPU ("axon") tunnel stalls concentrate at
each fresh process's FIRST host<->device fetch — measured 42-395 s across
otherwise-identical warm runs (r05 logs: a warm round_rn50 lost 395 s there
while probe ops in fresh subprocesses stalled identically) — so one process
per section risks five independent stall lotteries; r04 lost its RN50 number
exactly that way ("timeout after 289s").  One combined process pays the
first-fetch stall AT MOST ONCE.  The child prints one ``{"section": ...}``
JSON line per completed section; the orchestrator streams them as they
arrive, merges each into the cumulative record, and prints+flushes the
merged snapshot after EVERY section (the driver takes the last parseable
line, so a kill at any point keeps everything completed so far).  On a
timeout or crash the completed sections are salvaged and a retry child runs
ONLY the missing ones, with the section that hung rotated to the end so one
pathological section cannot starve the rest.  A stall watch kills a child
whose stdout goes silent past a per-gap allowance (``FIRST_OUTPUT_STALL_S``
/ ``OUTPUT_STALL_S``) so a mid-run tunnel wedge costs one allowance, not
the whole remaining budget — the retry path stays funded.

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
section in-process (handy standalone); ``BENCH_MODE=all`` runs the sections
named in ``BENCH_SECTIONS`` (comma list) in one process — the orchestrator's
unit of work.  ``BENCH_SKIP_ROUND=1`` skips every round bench,
``BENCH_SKIP_PROD=1`` / ``BENCH_SKIP_OCT=1`` / ``BENCH_SKIP_RN50=1`` skip
individual round sections (captured by default).  ``BENCH_BUDGET_S``
(default 1380 s) is the TOTAL wall-clock budget.
"""

from __future__ import annotations

import json
import os
import queue
import subprocess
import sys
import tempfile
import threading
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


def _ensure_fixture(users: int, n_train: int, n_test: int,
                    modality: str) -> str:
    """Build (or reuse) the seeded-deterministic bench fixture; returns its
    data root.  Cached under /tmp across bench sections, retries, and
    invocations — the production fixture is 4k NPZ files, minutes to
    regenerate on the 1-core host.  Built in a tmp dir and atomically renamed
    so a concurrent bench never sees a half-written cache.  v2: uint8
    payloads, OCT at full resolution (the 6.6 GB fp32 OCT cache transfer was
    the dominant round-0 cost over the tunnel)."""
    import shutil

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.fixtures import make_fairfedmed_fixture

    # OCT volumes are generated at the model resolution (no host resize)
    # so pixels stay integral and the runner's device cache rides uint8;
    # non-OCT sections keep tiny OCT payloads.
    oct_kw = (dict(oct_hw=224) if modality.startswith("oct")
              else dict(oct_depth=4, oct_hw=8))
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
    return cache


def main_round(emit=True, users=2, n_train=64, n_test=16, n_rounds=6,
               modality="slo_fundus", backbone="ViT-B/16", tag="round"):
    """Federated FairLoRA rounds end-to-end (loading+train+eval+agg) through
    the client-parallel mesh path (--parallel_clients); steady-state rate is
    the median of the post-warmup per-round times."""
    import shutil

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import federated_main

    work = tempfile.mkdtemp(prefix="benchround_")
    # the embedded run must NOT inherit the user's round-checkpoint dir:
    # it would resume the bench fixture from (or prune) a real run's state
    saved_ckpt_env = os.environ.pop("FAIRFEDMED_ROUND_CKPT", None)
    try:
        data_root = _ensure_fixture(users, n_train, n_test, modality)
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


def _selftest_flaky(emit=True):
    """Fault-injection section for testing the retry machinery: the first
    invocation (per marker file) dies like a transient tunnel failure, the
    second succeeds.  Used by tests/test_bench_retry.py; never scheduled by
    the orchestrator."""
    marker = os.path.join(tempfile.gettempdir(),
                          os.environ.get("BENCH_SELFTEST_MARKER",
                                         "bench_selftest_marker"))
    if not os.path.exists(marker):
        open(marker, "w").close()
        print("simulated transient FAILED_PRECONDITION", file=sys.stderr)
        sys.exit(3)
    os.remove(marker)
    record = {"metric": "selftest", "value": 1.0, "unit": "ok"}
    if emit:
        print(json.dumps(record))
    return record


def _selftest_ok(emit=True):
    """Instant no-op section (tests only)."""
    record = {"metric": "selftest_ok", "value": 1.0, "unit": "ok"}
    if emit:
        print(json.dumps(record))
    return record


def _selftest_hang(emit=True):
    """Section that never completes (tests only): exercises the
    orchestrator's salvage-on-timeout path."""
    time.sleep(3600)


# Section registry: name -> fn(emit=False) -> record.  `all` mode and the
# single-section BENCH_MODEs both dispatch through this.
_SECTION_FNS = {
    "step": main,
    "round": main_round,
    "round_prod": lambda emit=True: main_round(
        emit=emit, n_train=2048, n_test=64, n_rounds=5, tag="round_prod"),
    # RN50 at the production-scale fixture (reuses the round_prod fixture
    # cache): the 64+16 smoke fixture measured tunnel-latency spread
    # (280-780 img/s), not the backbone
    "round_rn50": lambda emit=True: main_round(
        emit=emit, n_train=2048, n_test=64, n_rounds=5, backbone="RN50",
        tag="round_rn50"),
    # 256 vols/client amortizes the fixed round latency (the 16+8 smoke
    # fixture measured latency, not compute: 48 vols/round ~= 0.3 s)
    "round_oct": lambda emit=True: main_round(
        emit=emit, n_train=256, n_test=16, n_rounds=5, modality="oct_bscans",
        tag="round_oct"),
    "selftest_flaky": _selftest_flaky,
    "selftest_ok": _selftest_ok,
    "selftest_hang": _selftest_hang,
}

# fixture specs per round section, so `all` mode can prebuild them host-side
# BEFORE the first device op (fixture generation is pure host work — ~4 s for
# the 2D production fixture, ~71 s for full-res OCT — and doing it after the
# TPU connection opens just widens the window a tunnel stall can land in)
_SECTION_FIXTURES = {
    "round": (2, 64, 16, "slo_fundus"),
    "round_prod": (2, 2048, 64, "slo_fundus"),
    "round_rn50": (2, 2048, 64, "slo_fundus"),
    "round_oct": (2, 256, 16, "oct_bscans"),
}


def main_all():
    """Run the sections named in BENCH_SECTIONS sequentially in THIS process,
    printing one ``{"section": ...}``-tagged JSON line per section (flushed —
    the orchestrator streams them).  One process = at most one first-fetch
    tunnel stall, and every section after the first starts with a live
    backend and a warm in-process compile cache."""
    names = [s for s in os.environ.get("BENCH_SECTIONS", "").split(",") if s]
    unknown = [s for s in names if s not in _SECTION_FNS]
    if unknown:
        sys.exit(f"unknown BENCH_SECTIONS entries: {unknown}")
    from fairfedmed_tpu.utils.profiling import stamp

    for spec in {(_SECTION_FIXTURES[s]) for s in names
                 if s in _SECTION_FIXTURES}:
        _ensure_fixture(*spec)
        stamp(f"bench_all:fixture_ready {spec}")
    for name in names:
        try:
            rec = _SECTION_FNS[name](emit=False)
        except SystemExit:
            raise
        except Exception as e:  # report and move on: a non-wedging section
            # failure shouldn't cost the sections behind it
            rec = {"error": f"{type(e).__name__}: {e}"[:300]}
        rec = dict(rec or {})
        rec["section"] = name
        sys.stdout.write(json.dumps(rec) + "\n")
        sys.stdout.flush()
        stamp(f"bench_all:section_done {name}")


# A combined attempt shorter than this cannot finish even one warm-cache
# section (jit compiles alone are ~40 s over the tunnel); don't start it.
MIN_SECTION_S = 150

# Liveness allowances for the stall watch (overridable via
# BENCH_FIRST_RECORD_STALL_S / BENCH_SECTION_STALL_S): a child whose stdout
# goes silent for longer than this is wedged (tunnel stall mid-section) and
# is killed EARLY so the remaining budget funds a retry child — without
# this, one hang eats the entire remaining budget as its timeout and the
# rotate-and-retry path is unreachable for timeouts (exactly how r04 lost
# its RN50 section).  Output lines arrive once per completed section (the
# round sections redirect their CLI chatter to a file), so the allowances
# are sized to full-section wall times: before the first line the child
# pays the fresh-process first-fetch stall (measured 42-395 s) plus cold
# compiles (measured 269.7 s to the first section record, cold + host-
# contended); later gaps are one cold section each (worst observed ~350 s
# incl. a mid-run stall), with headroom for one tunnel-poker recovery.
FIRST_OUTPUT_STALL_S = 700
OUTPUT_STALL_S = 600


def _stream_sections(section_names, timeout_s, on_record):
    """Run a ``BENCH_MODE=all`` child over *section_names*, parsing its
    stdout JSON lines AS THEY ARRIVE and calling ``on_record(name, rec)`` for
    each completed section — so the orchestrator can re-emit its merged
    snapshot live, and a kill at any point loses only the in-flight section.

    Returns ``(done, errors, err)``: *done* = set of section names that
    produced a record, *errors* = {name: message} for sections that reported
    a per-section failure, *err* = overall child failure (timeout / stall /
    nonzero exit) or None.

    Besides the hard *timeout_s* deadline, a STALL WATCH kills the child
    when its stdout produces nothing for ``OUTPUT_STALL_S`` seconds
    (``FIRST_OUTPUT_STALL_S`` before the first line, covering the fresh
    process's first-fetch tunnel stall + cold compiles) — so a mid-run
    tunnel wedge costs one allowance, not the entire remaining budget, and
    the orchestrator's rotate-and-retry path stays funded."""
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, BENCH_MODE="all",
               BENCH_SECTIONS=",".join(section_names),
               FAIRFEDMED_BUILD_STAMPS="1", FAIRFEDMED_TUNNEL_POKER="1")
    done, errors, err = set(), {}, None
    # errors="replace": a dying child can emit non-UTF-8 on stderr (native
    # decode pool, truncated multibyte at a cut) — a strict decode here would
    # crash the orchestrator and lose the already-salvaged sections
    with tempfile.TemporaryFile("w+", prefix="bench_stderr_",
                                errors="replace") as errf:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(here, "bench.py")],
            cwd=here, env=env, stdout=subprocess.PIPE, stderr=errf,
            text=True)
        lines: queue.Queue = queue.Queue()

        def _reader():
            for line in proc.stdout:
                lines.put(line)
            lines.put(None)

        threading.Thread(target=_reader, daemon=True).start()
        deadline = time.monotonic() + timeout_s
        first_allow = float(os.environ.get(
            "BENCH_FIRST_OUTPUT_STALL_S", FIRST_OUTPUT_STALL_S))
        inter_allow = float(os.environ.get(
            "BENCH_OUTPUT_STALL_S", OUTPUT_STALL_S))
        last_line_t = time.monotonic()
        saw_line = False
        try:
            while True:
                allow = inter_allow if saw_line else first_allow
                eff_deadline = min(deadline, last_line_t + allow)
                try:
                    line = lines.get(timeout=max(
                        0.1, min(5.0, eff_deadline - time.monotonic())))
                except queue.Empty:
                    # drain anything the reader buffered before giving up
                    try:
                        line = lines.get_nowait()
                    except queue.Empty:
                        now = time.monotonic()
                        if now < eff_deadline:
                            continue
                        proc.kill()
                        if now >= deadline:
                            err = f"timeout after {timeout_s:.0f}s"
                        else:  # stall watch fired before the hard deadline
                            err = (f"stalled: no child output for "
                                   f"{now - last_line_t:.0f}s "
                                   f"(allowance {allow:.0f}s)")
                        errf.seek(0)
                        tail = errf.read().strip().splitlines()
                        if tail:  # the last build stamp localizes the stall
                            err += " | last stderr: " + tail[-1][-200:]
                        break
                if line is None:  # child stdout closed
                    try:
                        rc = proc.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        # stdout closed but teardown wedged (a stalled tunnel
                        # backend thread can hang atexit): treat as a child
                        # failure, keep the salvaged sections
                        proc.kill()
                        err = "child wedged after stdout EOF (killed)"
                        break
                    if rc != 0:
                        errf.seek(0)
                        tail = errf.read().strip().splitlines()[-6:]
                        err = f"rc={rc}: " + " | ".join(tail)[-500:]
                    break
                # ANY child stdout line is liveness (the round sections
                # redirect their CLI chatter to a file, so in practice a
                # line arrives once per completed section — the allowances
                # are sized to full-section gaps, not log cadence)
                last_line_t = time.monotonic()
                saw_line = True
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(rec, dict):
                    continue
                name = rec.pop("section", None)
                if name is None:
                    continue
                if "error" in rec:
                    errors[name] = rec["error"]
                else:
                    done.add(name)
                    on_record(name, rec)
        finally:
            if proc.poll() is None:
                proc.kill()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pass  # already killed; an unreaped zombie must not cost the
                # merged record (the orchestrator exits soon anyway)
    return done, errors, err


def orchestrate():
    """Run all sections through combined ``BENCH_MODE=all`` children under
    BENCH_BUDGET_S total wall-clock; print+flush the merged JSON record after
    EVERY completed section.  Failed/hung sections get ONE retry (in the next
    child, behind the still-pending ones)."""
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

    # priority order: the headline step metric first (its record is merged
    # and flushed the moment the child prints it, so even a hard kill right
    # after leaves a usable artifact), then the north-star production round,
    # then RN50 (cheaper than OCT, and the one section that has never been
    # driver-captured — r04), then OCT-3D; the small 64+16 fixture
    # (tunnel-latency dominated, least informative) goes last.
    sections = ["step"]
    if os.environ.get("BENCH_SKIP_ROUND") != "1":
        if os.environ.get("BENCH_SKIP_PROD") != "1":
            sections.append("round_prod")
        if os.environ.get("BENCH_SKIP_RN50") != "1":
            sections.append("round_rn50")
        if os.environ.get("BENCH_SKIP_OCT") != "1":
            sections.append("round_oct")
        sections.append("round")

    def merge(name, rec):
        if name == "step":
            record.update(rec)
        else:
            record[f"{name}_imgs_per_sec"] = rec["value"]
            record[f"{name}_vs_baseline"] = rec["vs_baseline"]
            record[f"{name}_baseline_imgs_per_sec"] = \
                rec["baseline_round_imgs_per_sec"]
            record[f"{name}_fixture"] = rec["fixture"]
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

    emit()  # a line exists from second 0: even a kill before the first
    # section completes leaves a parseable (if empty) record on stdout
    attempts = {s: 0 for s in sections}
    errors = {}
    pending = list(sections)
    passes = 0
    while pending and remaining() > MIN_SECTION_S and passes < 4:
        passes += 1
        batch = [s for s in pending if attempts[s] < 2]
        if not batch:
            break
        done, errs, err = _stream_sections(
            batch, max(remaining() - 10, MIN_SECTION_S), merge)
        for s in done:
            attempts[s] += 1
            if attempts[s] > 1:
                record[f"{s}_retries" if s != "step" else "step_retries"] = \
                    attempts[s] - 1
        for s, e in errs.items():
            attempts[s] += 1
            errors[s] = e
        pending = [s for s in pending if s not in done]
        if not pending:
            break
        if err:
            # the first batch member neither done nor section-errored was in
            # flight when the child died — charge it and rotate it to the
            # end so it can't starve the sections behind it
            in_flight = next(
                (s for s in batch if s not in done and s not in errs), None)
            if in_flight is not None:
                attempts[in_flight] += 1
                errors[in_flight] = err
                if in_flight in pending and len(pending) > 1:
                    pending = [s for s in pending if s != in_flight] \
                        + [in_flight]
        elif not errs:
            # child exited clean but some requested sections never reported
            # (shouldn't happen) — avoid a silent infinite loop
            for s in pending:
                errors.setdefault(s, "section produced no record")
                attempts[s] += 1

    for s in pending:
        reason = errors.get(s)
        if s == "step":
            record["error"] = reason or "budget"
        elif reason is not None:
            record[f"{s}_error"] = reason
        else:
            record[f"{s}_skipped"] = "budget"
    emit()
    return record


if __name__ == "__main__":
    # Persistent XLA compilation cache (jax reads the env var natively, and
    # subprocess sections inherit it): the round sections' fused programs
    # cost ~600 s of compiles cold but ~0 warm — measured round_prod wall
    # time drops 800 s -> 192 s.  /tmp persists across bench invocations on
    # the same host, so the driver's end-of-round run reuses today's cache.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "ffm_xla_cache"))
    mode = os.environ.get("BENCH_MODE", "")
    if mode == "all":
        from fairfedmed_tpu.utils.tunnel import start_tunnel_poker
        start_tunnel_poker()
        main_all()
    elif mode:
        if mode not in _SECTION_FNS:
            sys.exit(f"unknown BENCH_MODE={mode!r}; "
                     f"one of {sorted(_SECTION_FNS)} or 'all'")
        # stall watchdog for sections run standalone (the orchestrator's
        # children start it via this same path; step mode has no CLI)
        from fairfedmed_tpu.utils.tunnel import start_tunnel_poker
        start_tunnel_poker()
        _SECTION_FNS[mode](emit=True)
    else:
        orchestrate()
