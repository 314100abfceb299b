"""Cross-implementation e2e parity: the ACTUAL reference implementation
(/root/reference, PyTorch) vs the rebuilt CLI on the same fixture from the
same initial weights (tools/ref_parity.py), across the model paths:

* ViT-B/16 + 2D SLO fundus (the flagship FairLoRA shape),
* ViT-B/16 + OCT b-scans (3D path: [::4] subsample, proj_per_3d_slice,
  per-slice lora_S repeat, slice-mean logits),
* RN50 (ModifiedResNet: FairLoRA on 1x1 convs, attnpool LoRA, trainable AND
  federated BatchNorm affine + running statistics).

Each run compares per-round acc/AUC trajectories, final per-client states,
and per-sample final-state eval probabilities (the tie-robust equivalence),
for BOTH the sequential host loop and the --parallel_clients mesh path.

Runs in a subprocess: the harness shims the reference's missing deps (yacs,
ftfy, torchvision, ...) into sys.modules, which must not leak into this test
process.  Skips when the reference checkout or torch is unavailable.

Tier layout: the slowest axes that only re-verify what the archived
``tools/ref_parity.py --all`` run (PARITY_REPORT.json) already covers —
oct3d, fedchexmimic, cot, and (round 5) rn50, the slowest single test in
the whole suite at ~230 s — are opt-in via ``-m parity_full``; vit
(flagship), fedprox (PromptFL trainer branch) and clip_zeroshot (eval-only)
keep the distinct TRAINER code paths in the default tier.  The RN tower
keeps default-tier coverage through
test_parallel_cli.py::test_parallel_matches_sequential_fairlora_rn (BN-stat
federation) and the test_e2e_federated.py rn50_oct golden.

Reference map: federated_main.py:604-726, trainers/GLP_OT_SVLoRA.py:883-975,
clip/model.py:11-301 (ModifiedResNet).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_ROOT = os.environ.get("FFM_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not available")


def _run_parity(tmp_path, extra_args, min_state_keys):
    """min_state_keys=None → an axis where the harness skips the state sweep
    (CLIP: the reference model has no compared trainables; local: neither
    side persists per-client local states — see tools/ref_parity.py)."""
    pytest.importorskip("torch")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ref_parity.py"),
         "--rounds", "2", "--out", str(tmp_path / "parity"), *extra_args],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-30:])
    assert proc.returncode == 0, f"parity harness failed:\n{tail}"
    assert "PARITY OK" in proc.stdout, tail
    with open(tmp_path / "parity" / "report.json") as f:
        report = json.load(f)
    assert report["acc_max_delta"] <= 0.01
    assert report["parallel_acc_max_delta"] <= 0.01
    if min_state_keys is not None:
        # per-sample eval probabilities are the tie-robust equivalence; an
        # AUC delta without it would have failed inside the harness already
        assert report["eval_prob_max_delta"] <= 5e-5
        assert report["train_movement"] > 1e-6
        assert report["n_state_keys"] >= min_state_keys
    return report


def test_reference_trajectories_match_vit(tmp_path):
    # 2 clients x (ctx + 2 layers x 2 mlps x lora_{A,S,B}) = 26 compared keys
    report = _run_parity(tmp_path, [], min_state_keys=26)
    assert report["auc_max_delta"] <= 0.01  # exact on the ViT path


@pytest.mark.parity_full
def test_reference_trajectories_match_oct3d(tmp_path):
    # + proj_per_3d_slice weight/bias per client
    report = _run_parity(tmp_path, ["--modality", "oct_bscans"],
                         min_state_keys=30)
    assert report["auc_max_delta"] <= 0.01


@pytest.mark.parity_full
def test_reference_trajectories_match_rn50(tmp_path):
    # conv lora (4 layers x 3 convs x A/S/B) + attnpool lora (4 proj x A/B)
    # + BN affine and running stats across stem/blocks/downsample.
    # ckpt-seed 1: screened against round-0 probability near-ties so the
    # harness's strict AUC assert holds (see tools/ref_parity.py --ckpt-seed)
    _run_parity(tmp_path, ["--backbone", "RN50", "--ckpt-seed", "1"],
                min_state_keys=200)


@pytest.mark.parity_full
def test_reference_trajectories_match_fedchexmimic(tmp_path):
    # CheXpert+MIMIC JPEG pipeline: grayscale decode (native libjpeg here vs
    # PIL there), race/gender/age attribute tables, per-site CSV layout
    report = _run_parity(tmp_path, ["--dataset", "FedChexMimic"],
                         min_state_keys=26)
    assert report["auc_max_delta"] <= 0.01


def test_reference_trajectories_match_fedprox(tmp_path):
    # the fedprox aggregation branch drives the reference's PromptFL trainer
    # (the ONLY branch where it can train — elsewhere run_epoch passes
    # is_last_client, which PromptFL.forward_backward rejects).  Exercises
    # three reference quirks reproduced by default: raw 0-255 medical input
    # (promptfl.py:211-224), the detached FedProx proximal term
    # (promptfl.py:290-293), and branch-local AUC-free reporting.  Only ctx
    # is trained/compared: 2 clients x prompt_learner.ctx = 2 keys.
    report = _run_parity(tmp_path, ["--model", "fedprox"], min_state_keys=2)
    assert report["ref_auc"] == [] and report["our_auc"] == []


def test_reference_trajectories_match_clip_zeroshot(tmp_path):
    # the eval-only CLIP branch (reference federated_main.py:223-267):
    # zero-shot prompts embedded from "a photo of a <class>." with RAW
    # 0-255 medical pixels (clip.py:218-231, no trainables anywhere — its
    # PromptLearner keeps the embedding as a plain attribute).  Per-sample
    # eval probabilities are compared inside the harness; state/movement
    # sweeps are skipped.
    report = _run_parity(tmp_path, ["--model", "CLIP"], min_state_keys=None)
    assert report["eval_prob_max_delta"] <= 5e-5


@pytest.mark.parity_full
def test_reference_trajectories_match_cot(tmp_path):
    # entropic COT plan in the loop (lax.while_loop fixed point vs the
    # reference's host-sync early exit — SURVEY hard-part #1); sharp eps so
    # the plan actually shapes the logits
    report = _run_parity(tmp_path, ["--OT", "COT"], min_state_keys=26)
    assert report["auc_max_delta"] <= 0.01
