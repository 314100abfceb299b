"""Per-client metric harvester: scrape log.txt files at a chosen federated
round and emit mean/std CSVs.

Capability parity with ``evaluation/get_mean_std.py:7-247``: walks every
``<run>/log.txt`` under a root folder, isolates the metric block printed after
``local train finish epoch: <epoch>`` for each ``Evaluate on the
client<i>_test set`` section, and writes

* ``epoch{E}_client_metrics.csv``           — client × metric mean/std
* ``epoch{E}_client_metrics_with_avg.csv``  — plus a cross-client average row

Usage::

    python tools/get_mean_std.py output/glp_ot_svlora_race --epoch 49
"""

from __future__ import annotations

import argparse
import os
import re
from collections import defaultdict

import numpy as np
import pandas as pd

CLIENT_HEADER = re.compile(r"Evaluate on the (client\d+)_test set")
METRIC_LINE = re.compile(r"\* ([\w\d_]+): ([\d.]+|nan)%?")


def extract_epoch_metrics(log_content: str, epoch: int):
    """{client: {metric: [values]}} for the block after the chosen epoch's
    'local train finish epoch:' marker (get_mean_std.py:20-45)."""
    parsed = defaultdict(lambda: defaultdict(list))
    in_epoch = False
    current_client = None
    for line in log_content.splitlines():
        if "local train finish epoch:" in line:
            if in_epoch:
                break  # next round started
            if re.search(rf"epoch:\s*{epoch}\b", line):
                in_epoch = True
            continue
        if not in_epoch:
            continue
        m = CLIENT_HEADER.search(line)
        if m:
            current_client = m.group(1)
            continue
        if current_client and line.strip().startswith("*"):
            mm = METRIC_LINE.match(line.strip())
            if mm and mm.group(2) != "nan":
                parsed[current_client][mm.group(1)].append(float(mm.group(2)))
    return parsed


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root_folder", type=str)
    parser.add_argument("--epoch", type=int, default=49)
    args = parser.parse_args()

    client_metrics = defaultdict(lambda: defaultdict(list))
    for name in sorted(os.listdir(args.root_folder)):
        log_path = os.path.join(args.root_folder, name, "log.txt")
        if not os.path.isfile(log_path):
            continue
        with open(log_path) as f:
            parsed = extract_epoch_metrics(f.read(), args.epoch)
        for client, metrics in parsed.items():
            for metric, values in metrics.items():
                client_metrics[client][metric].extend(values)

    records = [
        {"client": client, "metric": metric,
         "mean": float(np.mean(values)), "std": float(np.std(values))}
        for client, metrics in client_metrics.items()
        for metric, values in metrics.items()
    ]
    if not records:
        raise SystemExit(f"no metrics found under {args.root_folder}")

    df = pd.DataFrame(records)
    out1 = os.path.join(args.root_folder, f"epoch{args.epoch}_client_metrics.csv")
    df.to_csv(out1, index=False)

    avg = df.groupby("metric").agg({"mean": "mean", "std": "mean"}).reset_index()
    avg["client"] = "client_avg"
    combined = pd.concat([df, avg], ignore_index=True)
    out2 = os.path.join(args.root_folder,
                        f"epoch{args.epoch}_client_metrics_with_avg.csv")
    combined.to_csv(out2, index=False)
    print(f"wrote {out1}\nwrote {out2}")
    print(combined[combined["client"] == "client_avg"])


if __name__ == "__main__":
    main()
