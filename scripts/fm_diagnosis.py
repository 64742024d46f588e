"""FM quality-anomaly bisect (VERDICT r04 ask #2), at full MIND scale.

Round-4 scoreboard: FM warm AUC 0.5272 (rowwise_adagrad) / 0.5812 (adamw)
vs deep ~0.779 on a click model FM's second order can represent exactly.
Hypothesis (verified in miniature, tests/test_init_scale.py): the
torch-default N(0,1) embedding init — which the reference inherits for ALL
models (``nn.Embedding`` default, ``base_model.py:141-166``) — puts FM's
initial logit at std ~sqrt(n_field_pairs * (d-1)) ~ 15: predictions start
saturated, and the escape must shrink every v column. AdamW deflates at
~lr per touched element per step (slow); rowwise AdaGrad's decaying
effective step stalls permanently. The same mechanism explains LR's
adagrad-vs-adamw gap (its init logit std is ~sqrt(n_fields)).

This script measures the fix — ``embeddings.init_scale`` — at the r04
fullscale benchmark (same data, recipe, val cadence), grid over
init_scale x lr x optimizer, and records per-variant init logit std +
best-epoch warm AUC.

Usage:
    python scripts/fm_diagnosis.py --base /tmp/fullscale_r04/base.yaml \
        --epochs 8 --out artifacts/fm_diagnosis_r05.json
"""

import argparse
import dataclasses
import json
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_cfg(base_cfg, model_name, init_scale, lr, optimizer):
    from news_recsys_tpu.config import config_from_dict, config_to_dict

    raw = config_to_dict(base_cfg)
    raw["name"] = model_name
    feats = raw["features"]
    for key in ("feature_names", "array_feature_names",
                "item_feature_names", "user_feature_names"):
        feats[key] = [f for f in feats.get(key, []) if f not in ("hist", "entities")]
    for a in ("hist", "entities"):
        feats.get("array_max_length", {}).pop(a, None)
        raw["embeddings"]["embedding_size"].pop(a, None)
        raw["embeddings"]["embedding_table_size"].pop(a, None)
        raw["embeddings"].get("share_emb_table_features", {}).pop(a, None)
    if model_name == "fm":
        raw["embeddings"]["embedding_size"] = {
            k: 16 for k in raw["embeddings"]["embedding_size"]}
    if model_name == "lr":
        raw["embeddings"]["embedding_size"] = {
            k: 1 for k in raw["embeddings"]["embedding_size"]}
    raw["embeddings"]["init_scale"] = init_scale
    hp = raw["train_hparams"]
    hp["lr"] = lr
    hp["embedding_optimizer"] = optimizer
    return config_from_dict(raw)


def init_logit_std(cfg, model, ds):
    import jax
    batch = ds.take(np.arange(512))
    params = model.init(jax.random.PRNGKey(cfg.train_hparams.seed), batch)
    logits = np.asarray(model.apply(params, batch))
    return float(logits.std())


def run_variant(base_cfg, name, init_scale, lr, optimizer, epochs, warm):
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer

    cfg = make_cfg(base_cfg, name, init_scale, lr, optimizer)
    train_ds = PackedDataset.open_split(cfg, "train")
    dev_ds = PackedDataset.open_split(cfg, "dev")
    model = build_ranker(cfg, name)
    lstd = init_logit_std(cfg, model, train_ds)
    tmp = tempfile.mkdtemp()
    tr = Trainer(cfg, model, workdir=tmp, use_mesh=False)
    t0 = time.time()
    best_warm, best_epoch, best_block = 0.0, -1, None
    state = None
    for epoch in range(epochs):
        state, _ = (tr.train_epoch(state, train_ds, epoch) if state is not None
                    else tr.train_epoch(tr.init_state(
                        train_ds.take(np.arange(cfg.dataset.batch_size))),
                        train_ds, epoch))
        res = tr.validate(state, dev_ds, epoch, warm)
        wauc = res["Warm_Start"]["AUC"]
        if wauc > best_warm:
            best_warm, best_epoch = wauc, epoch
            best_block = {coh: {k: round(v, 5) for k, v in vals.items()}
                          for coh, vals in res.items()}
    return {
        "model": name, "init_scale": init_scale, "lr": lr,
        "optimizer": optimizer, "epochs": epochs,
        "init_logit_std": round(lstd, 3),
        "best_warm_auc": round(best_warm, 5), "best_epoch": best_epoch,
        "best": best_block,
        "wall_seconds": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/fullscale_r04/base.yaml")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--out", default="artifacts/fm_diagnosis_r05.json")
    ap.add_argument("--grid", default="fm:0.1:1e-3:rowwise_adagrad,"
                                      "fm:0.03:1e-3:rowwise_adagrad,"
                                      "fm:0.03:1e-2:rowwise_adagrad,"
                                      "fm:0.01:1e-2:rowwise_adagrad,"
                                      "fm:0.03:1e-3:adamw,"
                                      "fm:0.03:1e-2:adamw,"
                                      "lr:0.03:1e-2:rowwise_adagrad,"
                                      "lr:0.03:1e-2:adamw")
    args = ap.parse_args()
    logging.disable(logging.INFO)

    from news_recsys_tpu.config import load_config
    base_cfg = load_config(args.base)
    warm_path = os.path.join(base_cfg.paths.out_basedir, "preprocess",
                             "train_user_ids.json")
    with open(warm_path) as f:
        warm = set(json.load(f))

    results = []
    for spec in args.grid.split(","):
        name, scale, lr, opt = spec.split(":")
        print(f"=== {spec} ===", flush=True)
        res = run_variant(base_cfg, name, float(scale), float(lr), opt,
                          args.epochs, warm)
        print(json.dumps({k: v for k, v in res.items() if k != "best"}),
              flush=True)
        results.append(res)

    artifact = {
        "what": "FM/LR saturation bisect (VERDICT r04 ask #2): "
                "embeddings.init_scale x lr x optimizer at the r04 fullscale "
                "benchmark; r04 baselines (init_scale=1.0): fm 0.5284/"
                "fm_adamw 0.5814, lr 0.5173/lr_adamw 0.5397 warm AUC "
                "(artifacts/rankers_fullscale_r04.json)",
        "mechanism": "N(0,1) torch-default init saturates models that score "
                     "directly from raw embeddings (FM init logit std ~15, "
                     "measured per-variant below); AdaGrad's decaying step "
                     "cannot escape, AdamW escapes at ~lr/element/step",
        "data": "r04 fullscale learnable synthetic (65.2k news / 94k users, "
                "1.10M/0.37M exploded rows, seed 3)",
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
