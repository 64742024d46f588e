"""Round-5 A/B: arena packing + merged forward gathers, e2e on TPU.

Measures (interleaved epochs in ONE process — cancels shared-chip drift,
best of N rounds per variant, methodology per .claude/skills/verify):

1. DCN b512 rowwise_adagrad: arena ON (merged gather + grouped dedup +
   single scatter) vs arena OFF — the VERDICT r04 ask #1 "combined e2e"
   number (r04 scatter-only merge gave +3.2%).
2. Attention ranker: shared-table (hist+item_id) gather merge ON vs OFF
   (OFF = the r04 per-feature gather path, monkeypatched back in).

Usage: python scripts/arena_gather_ab.py [--json artifacts/arena_ab_r05.json]
"""

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

ROWS = 512 * 1024
BATCH = 512
ROUNDS = 10


def timed_epochs(trainer, ds, state, n, batch=BATCH):
    rates = []
    for i in range(n):
        t0 = time.perf_counter()
        state, metrics = trainer.train_epoch(state, ds, epoch=i + 1)
        dt = time.perf_counter() - t0
        rates.append(metrics["steps"] * batch / dt)
    return state, rates


def ranking_arrays(rows):
    from news_recsys_tpu.zoo import MIND_FEATURES, MIND_TABLE_SIZE
    rng = np.random.default_rng(0)
    arrays = {name: rng.integers(1, MIND_TABLE_SIZE[name], rows).astype(np.int32)
              for name in MIND_FEATURES}
    arrays["label"] = (rng.random(rows) < 0.1).astype(np.float32).reshape(-1, 1)
    return arrays


def bench_dcn_arena(out):
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer
    from news_recsys_tpu.zoo import mind_config

    ds = PackedDataset(ranking_arrays(ROWS))
    variants = {}
    for arena in (False, True):
        cfg = mind_config("dcn", batch_size=BATCH,
                          embedding_optimizer="rowwise_adagrad",
                          arena_tables=arena)
        model = build_ranker(cfg, "dcn")
        tmp = tempfile.mkdtemp()
        tr = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        state = tr.fit(ds, max_epochs=1)          # compile + warm
        variants[arena] = (tr, state)

    rates = {False: [], True: []}
    for r in range(ROUNDS):
        for arena in (False, True):
            tr, state = variants[arena]
            state, rr = timed_epochs(tr, ds, state, 1)
            variants[arena] = (tr, state)
            rates[arena].append(rr[0])
            print(f"round {r} arena={arena}: {rr[0]:,.0f} ex/s", flush=True)
    best_off, best_on = max(rates[False]), max(rates[True])
    out["dcn_arena_combined"] = {
        "arena_off_ex_s": int(best_off), "arena_on_ex_s": int(best_on),
        "ratio_on_vs_off": round(best_on / best_off, 4),
        "median_off_ex_s": int(sorted(rates[False])[len(rates[False]) // 2]),
        "median_on_ex_s": int(sorted(rates[True])[len(rates[True]) // 2]),
        "rounds_off": [int(x) for x in rates[False]],
        "rounds_on": [int(x) for x in rates[True]],
        "note": "arena ON now merges the forward gathers too (one take per "
                "arena, split per feature) on top of r04's grouped-dedup "
                "single scatter",
    }


def bench_attention_merge(out):
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training import sparse_step
    from news_recsys_tpu.training.trainer import Trainer
    from news_recsys_tpu.zoo import attention_arrays, attention_config

    import jax.numpy as jnp
    from news_recsys_tpu.config import ARRAY, SPARSE
    from news_recsys_tpu.models.embedding import offset_ids

    def gather_unmerged(schema, batch, tables, large):
        """r04 per-feature gather path (for the OFF variant)."""
        rows = {}
        for spec in schema.specs:
            if spec.kind in (SPARSE, ARRAY) and spec.table in large:
                rows[spec.name] = jnp.take(
                    tables[spec.table], offset_ids(spec, batch[spec.name]),
                    axis=0).astype(jnp.float32)
        return rows

    rows_n = ROWS // 2
    arrays = attention_arrays(rows_n)
    ds = PackedDataset(arrays)
    merged_impl = sparse_step.gather_large_rows

    variants = {}
    for merged in (False, True):
        sparse_step.gather_large_rows = merged_impl if merged else gather_unmerged
        cfg = attention_config(batch_size=BATCH)
        model = build_ranker(cfg, "attention")
        tmp = tempfile.mkdtemp()
        tr = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        state = tr.fit(ds, max_epochs=1)
        variants[merged] = (tr, state)
    sparse_step.gather_large_rows = merged_impl

    # NOTE: the chunk fn was already jit-compiled per variant above, so the
    # monkeypatch is baked into each variant's compiled fn; interleaving is
    # safe.
    rates = {False: [], True: []}
    for r in range(ROUNDS):
        for merged in (False, True):
            tr, state = variants[merged]
            state, rr = timed_epochs(tr, ds, state, 1)
            variants[merged] = (tr, state)
            rates[merged].append(rr[0])
            print(f"round {r} merged={merged}: {rr[0]:,.0f} ex/s", flush=True)
    best_off, best_on = max(rates[False]), max(rates[True])
    out["attention_gather_merge"] = {
        "per_feature_ex_s": int(best_off), "merged_ex_s": int(best_on),
        "ratio_on_vs_off": round(best_on / best_off, 4),
        "rounds_off": [int(x) for x in rates[False]],
        "rounds_on": [int(x) for x in rates[True]],
        "note": "hist (B*30 ids) + item_id (B ids) share the item table; "
                "merge = ONE take of 15872 rows vs two takes",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="artifacts/arena_ab_r05.json")
    ap.add_argument("--skip-attention", action="store_true")
    args = ap.parse_args()

    out = {
        "what": "Arena packing + merged forward gathers (round-5): DCN arena "
                "ON/OFF combined e2e, attention shared-table gather merge",
        "backend": "TPU v5 lite",
        "method": f"interleaved epochs in one process, best of {ROUNDS} rounds "
                  f"per variant, batch {BATCH}, ROWS={ROWS}, rowwise_adagrad",
    }
    bench_dcn_arena(out)
    if not args.skip_attention:
        bench_attention_merge(out)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
