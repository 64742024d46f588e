"""Compare DCN e2e training throughput: fp32 vs bf16 table storage/compute.

Run on the real TPU chip: ``python scripts/bench_bf16.py``.
"""

import dataclasses
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

BATCH = 512
ROWS = 512 * 1024


def measure(param_dtype, compute_dtype):
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer
    from news_recsys_tpu.zoo import MIND_FEATURES, MIND_TABLE_SIZE, mind_config

    rng = np.random.default_rng(0)
    arrays = {
        name: rng.integers(1, MIND_TABLE_SIZE[name], ROWS).astype(np.int32)
        for name in MIND_FEATURES
    }
    arrays["label"] = (rng.random(ROWS) < 0.1).astype(np.float32).reshape(-1, 1)
    ds = PackedDataset(arrays)

    cfg = mind_config("dcn", batch_size=BATCH, param_dtype=param_dtype,
                      compute_dtype=compute_dtype,
                      embedding_optimizer="sparse_adamw")
    model = build_ranker(cfg, "dcn")
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        state = trainer.fit(ds, max_epochs=1)  # compile + warmup
        t0 = time.perf_counter()
        state, metrics = trainer.train_epoch(state, ds, epoch=1)
        dt = time.perf_counter() - t0
        auc = metrics["train_auc"]
    return metrics["steps"] * BATCH / dt, auc


if __name__ == "__main__":
    import json
    import os

    import jax
    print("backend:", jax.devices())
    results = []
    for pd, cd in [("float32", "float32"), ("bfloat16", "float32"),
                   ("bfloat16", "bfloat16")]:
        exs, auc = measure(pd, cd)
        results.append({"param_dtype": pd, "compute_dtype": cd,
                        "examples_per_sec": round(exs, 1),
                        "train_auc": round(float(auc), 4)})
        print(f"param={pd:9s} compute={cd:9s}  {exs:12.0f} ex/s  train_auc~{auc:.4f}")
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"backend": jax.devices()[0].platform, "batch": BATCH,
                       "rows": ROWS, "optimizer": "sparse_adamw",
                       "results": results}, f, indent=2)
        print("wrote", path)
