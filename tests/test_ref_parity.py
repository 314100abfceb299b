"""Cross-implementation e2e parity: the ACTUAL reference implementation
(/root/reference, PyTorch) vs the rebuilt CLI on the same fixture from the
same initial weights (tools/ref_parity.py).

Runs in a subprocess: the harness shims the reference's missing deps (yacs,
ftfy, torchvision, ...) into sys.modules, which must not leak into this test
process.  Skips when the reference checkout or torch is unavailable.

Reference map: federated_main.py:604-726, trainers/GLP_OT_SVLoRA.py:883-975.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_ROOT = os.environ.get("FFM_REFERENCE", "/root/reference")


@pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                    reason="reference checkout not available")
def test_reference_trajectories_match(tmp_path):
    pytest.importorskip("torch")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ref_parity.py"),
         "--rounds", "2", "--out", str(tmp_path / "parity")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-30:])
    assert proc.returncode == 0, f"parity harness failed:\n{tail}"
    assert "PARITY OK" in proc.stdout, tail
    with open(tmp_path / "parity" / "report.json") as f:
        report = json.load(f)
    assert report["acc_max_delta"] <= 0.01
    assert report["auc_max_delta"] <= 0.01
    assert report["parallel_acc_max_delta"] <= 0.01
    assert report["parallel_auc_max_delta"] <= 0.01
    assert report["train_movement"] > 1e-6
    # 2 clients x (ctx + 2 layers x 2 mlps x lora_{A,S,B}) = 26 compared keys
    assert report["n_state_keys"] >= 26
