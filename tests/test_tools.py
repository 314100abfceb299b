"""Log harvester tools (tools/parse_test_res.py, tools/get_mean_std.py)."""

import os
import subprocess
import sys

LOG_TEMPLATE = """************
** Config **
************
------------local train finish epoch: {epoch} -------------
Evaluate on the client0_test set
* accuracy: {acc0}%
* auc: {auc0}%
Evaluate on the client1_test set
* accuracy: {acc1}%
* auc: {auc1}%
------------local train finish epoch: {next_epoch} -------------
Evaluate on the client0_test set
* accuracy: 1.0%
Finish training
* accuracy: {final}%
"""


def _write_log(path, **kw):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(LOG_TEMPLATE.format(**kw))


def test_get_mean_std(tmp_path):
    root = tmp_path / "exp"
    _write_log(str(root / "seed1" / "log.txt"), epoch=3, next_epoch=4,
               acc0=80.0, auc0=70.0, acc1=60.0, auc1=50.0, final=75.0)
    _write_log(str(root / "seed2" / "log.txt"), epoch=3, next_epoch=4,
               acc0=82.0, auc0=72.0, acc1=62.0, auc1=52.0, final=77.0)
    r = subprocess.run(
        [sys.executable, "tools/get_mean_std.py", str(root), "--epoch", "3"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr
    import pandas as pd

    df = pd.read_csv(root / "epoch3_client_metrics_with_avg.csv")
    row = df[(df.client == "client0") & (df.metric == "accuracy")].iloc[0]
    assert abs(row["mean"] - 81.0) < 1e-9 and abs(row["std"] - 1.0) < 1e-9
    avg = df[(df.client == "client_avg") & (df.metric == "auc")].iloc[0]
    assert abs(avg["mean"] - 61.0) < 1e-9  # mean of client means (71, 51)


def test_parse_test_res(tmp_path):
    root = tmp_path / "exp"
    _write_log(str(root / "seed1" / "log.txt"), epoch=0, next_epoch=1,
               acc0=1, auc0=1, acc1=1, auc1=1, final=70.0)
    _write_log(str(root / "seed2" / "log.txt"), epoch=0, next_epoch=1,
               acc0=1, auc0=1, acc1=1, auc1=1, final=80.0)
    r = subprocess.run(
        [sys.executable, "tools/parse_test_res.py", str(root)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr
    assert "* accuracy: 75.0% +- 5.0%" in r.stdout
