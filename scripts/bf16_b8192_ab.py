"""bf16 tables x large batch: does the throughput ceiling move?

bf16 storage at b512 is slightly negative (RNG/write-back overhead beats
the halved table traffic, artifacts/bf16_r03.json); b8192 fp32 is the
current ceiling (~3.2M ex/s). At b8192 the per-step table traffic is 16x
larger, so bf16's halved gather/scatter bytes should finally pay.
Interleaved best-of-N epochs, one process.

Usage: python scripts/bf16_b8192_ab.py [--json artifacts/bf16_b8192_r05.json]
"""

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

BATCH = 8192
STEPS = 512
ROUNDS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="artifacts/bf16_b8192_r05.json")
    args = ap.parse_args()

    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer
    from news_recsys_tpu.zoo import MIND_FEATURES, MIND_TABLE_SIZE, mind_config

    rng = np.random.default_rng(0)
    n = BATCH * STEPS
    arrays = {k: rng.integers(1, MIND_TABLE_SIZE[k], n).astype(np.int32)
              for k in MIND_FEATURES}
    arrays["label"] = (rng.random(n) < 0.1).astype(np.float32).reshape(-1, 1)
    ds = PackedDataset(arrays)

    variants = {}
    for key, pd_, cd in (("fp32", "float32", "float32"),
                         ("bf16", "bfloat16", "bfloat16")):
        cfg = mind_config("dcn", batch_size=BATCH,
                          embedding_optimizer="rowwise_adagrad",
                          param_dtype=pd_, compute_dtype=cd)
        model = build_ranker(cfg, "dcn")
        tr = Trainer(cfg, model, workdir=tempfile.mkdtemp(), use_mesh=False)
        state = tr.fit(ds, max_epochs=1)            # compile + warm
        variants[key] = (tr, state)
        print(f"warmed {key}", flush=True)

    rates = {k: [] for k in variants}
    for r in range(ROUNDS):
        for key, (tr, state) in variants.items():
            t0 = time.perf_counter()
            state, metrics = tr.train_epoch(state, ds, epoch=r + 1)
            dt = time.perf_counter() - t0
            variants[key] = (tr, state)
            rates[key].append(metrics["steps"] * BATCH / dt)
            print(f"round {r} {key}: {rates[key][-1]:,.0f} ex/s", flush=True)

    out = {
        "what": "DCN b8192 rowwise_adagrad: fp32 vs bf16 tables+compute "
                "(sqrt-lr b8192 quality already evidenced at fp32, "
                "rankers_fullscale_r04.json)",
        "backend": "TPU v5 lite",
        "method": f"interleaved best-of-{ROUNDS} epochs ({STEPS} steps x "
                  f"b{BATCH}) in one process",
        "results": {k: {"best_ex_s": int(max(v)),
                        "median_ex_s": int(sorted(v)[len(v) // 2]),
                        "rounds": [int(x) for x in v]}
                    for k, v in rates.items()},
        "ratio_bf16_vs_fp32_best": round(max(rates["bf16"]) / max(rates["fp32"]), 4),
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
