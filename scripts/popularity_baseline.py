"""Non-personalized popularity baseline for the retrieval scoreboard.

Recommends the globally most-clicked training items (minus each query's
history) — the floor any learned retriever must beat, and the diagnostic
that exposed WHY DSSM lost to ItemCF on this benchmark: the dev-positive
distribution is popularity-skewed enough that bare popularity outscores
ItemCF's co-click similarity, while uncorrected in-batch InfoNCE actively
removes popularity from the learned scores (fixed by
``dssm_cfg.logq_correction``; see tests/test_logq.py).

Usage: python scripts/popularity_baseline.py \
    [--pre /tmp/fullscale_r04/tmp/preprocess] [--out artifacts/...]
"""

import argparse
import json
import os
import sys

import numpy as np
import pandas as pd

COLS = ["impression_id", "user_id", "time", "history", "item_id", "label"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre", default="/tmp/fullscale_r04/tmp/preprocess")
    ap.add_argument("--out", default="artifacts/popularity_baseline_r05.json")
    ap.add_argument("--k", default="10,50")
    args = ap.parse_args()

    train = pd.read_csv(os.path.join(args.pre, "train_behaviors_processed.csv"),
                        sep="\t", names=COLS, quoting=3)
    dev = pd.read_csv(os.path.join(args.pre, "dev_behaviors_processed.csv"),
                      sep="\t", names=COLS, quoting=3)
    pop = train[train.label == 1].item_id.value_counts()

    pos = dev[dev.label == 1]
    targets = pos.item_id.to_numpy(np.int64)
    hists = [set(int(x) for x in s.split(" ")) if s else set()
             for s in pos.history.fillna("").astype(str)]
    ks = sorted(int(k) for k in args.k.split(","))
    head = pop.index[: max(ks) + 50].to_numpy()

    metrics = {}
    for k in ks:
        hits = sum(t in [i for i in head if i not in h][:k]
                   for t, h in zip(targets, hists))
        metrics[f"HR@{k}"] = round(hits / len(targets), 5)

    out = {
        "what": "Global click-popularity top-k recall baseline (history "
                "dedup per query) on the fullscale synthetic benchmark",
        "queries": int(len(targets)),
        "comparison": {"itemcf_HR@10": 0.00578,
                       "dssm_r04_HR@10": 0.0014,
                       "source": "artifacts/itemcf_quality_r04.json, "
                                 "rankers_fullscale_r04.json"},
        **metrics,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
