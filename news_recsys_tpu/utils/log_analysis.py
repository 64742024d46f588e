"""Experiment-log analyzer: parse ``val_log.log``, report the best epoch.

Capability parity with ``src/scripts/log_analysis.py``: regex state machine
over the epoch blocks (``log_analysis.py:6-84``), best epoch chosen by
Warm-Start AUC (``:86-98``), markdown table output (``:114-131``). The block
format itself is produced by
:func:`news_recsys_tpu.training.metrics.format_validation_block`.
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Dict, List, Optional

EPOCH_START = re.compile(r"=+ Epoch (\d+) Validation Results =+")
SECTION = re.compile(r"^\s*(Overall|Warm Start Users|Cold Start Users|Retrieval).*:$")
METRIC = re.compile(r"^([a-zA-Z0-9@]+):\s+([0-9\.\-eE]+|nan|inf|-inf)")
BLOCK_END = re.compile(r"={10,}")

SECTIONS = ["Overall", "Warm Start Users", "Cold Start Users"]


def parse_log(file_path: str) -> List[Dict]:
    with open(file_path, "r") as f:
        lines = f.readlines()

    epochs: List[Dict] = []
    current: Optional[Dict] = None
    section: Optional[str] = None
    for line in lines:
        line = line.strip()
        if not line:
            continue
        m = EPOCH_START.match(line)
        if m:
            if current is not None:
                epochs.append(current)
            current = {"epoch": int(m.group(1)), "data": {}}
            section = None
            continue
        if current is None:
            continue
        if BLOCK_END.match(line) and "Epoch" not in line:
            epochs.append(current)
            current, section = None, None
            continue
        m = SECTION.match(line)
        if m:
            raw = m.group(1)
            section = ("Warm Start Users" if "Warm" in raw
                       else "Cold Start Users" if "Cold" in raw
                       else "Retrieval" if "Retrieval" in raw else "Overall")
            current["data"][section] = {}
            continue
        m = METRIC.match(line)
        if m and section:
            try:
                val = float(m.group(2))
            except ValueError:
                val = float("nan")
            current["data"][section][m.group(1)] = val
    if current is not None:
        epochs.append(current)
    return epochs


def _retrieval_criterion(e: Dict) -> Optional[float]:
    """Primary retrieval metric: the smallest-k HR@k present."""
    sec = e.get("data", {}).get("Retrieval", {})
    hrs = sorted((int(name.split("@")[1]), v) for name, v in sec.items()
                 if name.startswith("HR@"))
    return hrs[0][1] if hrs else None


def best_epoch(epochs: List[Dict]) -> Optional[Dict]:
    """Best epoch by Warm-Start AUC (reference criterion); retrieval runs
    (DSSM val_log blocks) fall back to HR@k."""
    best, max_val = None, -1.0
    for e in epochs:
        val = e.get("data", {}).get("Warm Start Users", {}).get("AUC")
        if val is None:
            val = _retrieval_criterion(e)
        if val is None or val != val:
            continue
        if val > max_val:
            max_val, best = val, e
    return best


def _format_best_retrieval(e: Dict, model_name: str) -> str:
    sec = e["data"]["Retrieval"]
    out = [f"Best Epoch: {e['epoch']} (Retrieval HR: {_retrieval_criterion(e):.4f})", ""]
    out.append("| Model | Metric | Value |")
    out.append("| :--- | :--- | :--- |")
    for i, (metric, val) in enumerate(sorted(sec.items())):
        fmt = f"{val:.4f}" if isinstance(val, float) and metric != "Queries" else str(int(val))
        out.append(f"| {model_name if i == 0 else ''} | {metric} | {fmt} |")
    return "\n".join(out)


def format_best_epoch(epochs: List[Dict], model_name: str = "Unknown") -> str:
    e = best_epoch(epochs)
    if not e:
        return "No valid epoch data found."
    if "Retrieval" in e["data"] and "Warm Start Users" not in e["data"]:
        return _format_best_retrieval(e, model_name)
    auc = e["data"]["Warm Start Users"]["AUC"]
    out = [f"Best Epoch: {e['epoch']} (Warm Start AUC: {auc:.4f})", ""]
    metrics = list(e["data"].get("Overall", e["data"].get("Warm Start Users", {})).keys())
    out.append("| Model | Metric | " + " | ".join(SECTIONS) + " |")
    out.append("| :--- | :--- | " + " | ".join([":---"] * len(SECTIONS)) + " |")
    for i, metric in enumerate(metrics):
        row = [model_name if i == 0 else "", metric]
        for s in SECTIONS:
            val = e["data"].get(s, {}).get(metric, "N/A")
            row.append(f"{val:.4f}" if isinstance(val, float) else str(val))
        out.append("| " + " | ".join(row) + " |")
    return "\n".join(out)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Analyze val_log.log for best Warm Start AUC.")
    parser.add_argument("log_file")
    args = parser.parse_args(argv)
    if not os.path.exists(args.log_file):
        print(f"Log file not found: {args.log_file}")
        return
    model_name = os.path.basename(os.path.dirname(os.path.abspath(args.log_file))).split("_")[0]
    print(format_best_epoch(parse_log(args.log_file), model_name))


if __name__ == "__main__":
    main()
