"""Three-way DCN step-time comparison: arena OFF / arena (no gather merge)
/ arena + merged gather — min-of-N interleaved 512-step scans with the
empty-scan dispatch overhead subtracted (step_bisect.py methodology; epoch
walls proved too noisy for a ~5 us effect, artifacts/arena_ab_r05.json
rounds).

Usage: python scripts/arena_step_ab.py [--json artifacts/arena_step_ab_r05.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from news_recsys_tpu.config import ARRAY, SPARSE
from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.models.embedding import offset_ids
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.training import sparse_step as ss
from news_recsys_tpu.training.trainer import AucHist, Trainer
from news_recsys_tpu.zoo import MIND_FEATURES, MIND_TABLE_SIZE, mind_config

BATCH, STEPS, ROUNDS = 512, 512, 8


def gather_per_feature(schema, batch, tables, large):
    """The r04 unmerged gather path."""
    rows = {}
    for spec in schema.specs:
        if spec.kind in (SPARSE, ARRAY) and spec.table in large:
            rows[spec.name] = jnp.take(
                tables[spec.table], offset_ids(spec, batch[spec.name]),
                axis=0).astype(jnp.float32)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="artifacts/arena_step_ab_r05.json")
    ap.add_argument("--model", default="dcn", choices=["dcn", "attention"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = BATCH * STEPS
    if args.model == "attention":
        from news_recsys_tpu.zoo import attention_arrays, attention_config
        import dataclasses
        arrays = attention_arrays(n)
    else:
        arrays = {k: rng.integers(1, MIND_TABLE_SIZE[k], n).astype(np.int32)
                  for k in MIND_FEATURES}
        arrays["label"] = (rng.random(n) < 0.1).astype(np.float32).reshape(-1, 1)
    ds = PackedDataset(arrays)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(STEPS, BATCH)

    merged_impl = ss.gather_large_rows
    matrix = (("off", False, True), ("arena", True, True)) if args.model == "attention" \
        else (("off", False, True), ("arena_nomerge", True, False),
              ("arena_merge", True, True))
    variants = {}
    for key, arena, merge in matrix:
        if args.model == "attention":
            cfg = attention_config(batch_size=BATCH)
            cfg = dataclasses.replace(cfg, embeddings=dataclasses.replace(
                cfg.embeddings, arena_tables=arena))
        else:
            cfg = mind_config("dcn", batch_size=BATCH,
                              embedding_optimizer="rowwise_adagrad",
                              arena_tables=arena)
        model = build_ranker(cfg, args.model)
        with tempfile.TemporaryDirectory() as tmp:
            tr = Trainer(cfg, model, workdir=tmp, use_mesh=False)
            b0 = {k: np.asarray(v[:BATCH]) for k, v in ds.arrays.items()}
            b0["_valid"] = np.ones(BATCH, np.float32)
            state0 = tr.init_state(b0)
            packer = tr._packer(ds)
            int_mat, float_mat = tr._device_matrices(packer)
            layout_key = packer.layout_key()
        ss.gather_large_rows = merged_impl if merge else gather_per_feature
        fn = ss.make_sparse_chunk_fn(model, layout_key, BATCH, cfg)
        ss.gather_large_rows = merged_impl
        variants[key] = (fn, state0)

    @jax.jit
    def empty(x):
        def body(c, i):
            return c + i, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(STEPS, dtype=jnp.float32))
        return c

    def clone(s):
        return jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, s)

    # warm/compile
    jax.device_get(empty(jnp.float32(0)))
    for key, (fn, s0) in variants.items():
        jax.device_get(fn(clone(s0), AucHist.zeros(), int_mat, float_mat, idx)[2])
        print(f"compiled {key}", flush=True)

    acc = {"empty": [], **{k: [] for k in variants}}
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        jax.device_get(empty(jnp.float32(0)))
        acc["empty"].append(time.perf_counter() - t0)
        for key, (fn, s0) in variants.items():
            t0 = time.perf_counter()
            jax.device_get(fn(clone(s0), AucHist.zeros(), int_mat, float_mat, idx)[2])
            acc[key].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(
            f"{k}={acc[k][-1]*1e6/STEPS:.0f}us" for k in variants), flush=True)

    base = min(acc["empty"])
    out = {
        "what": f"{args.model} b512 rowwise_adagrad production chunk-fn step time: "
                "arena off / arena without gather merge / arena + merged "
                "gather (one take per arena)",
        "backend": "TPU v5 lite",
        "method": f"min of {ROUNDS} interleaved {STEPS}-step scans, empty-scan "
                  "overhead subtracted, jax.device_get-forced",
        "empty_scan_us": round(base * 1e6, 1),
        "per_step_us": {k: round((min(v) - base) * 1e6 / STEPS, 1)
                        for k, v in acc.items() if k != "empty"},
        "examples_per_sec": {k: int(BATCH / ((min(v) - base) / STEPS))
                             for k, v in acc.items() if k != "empty"},
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
