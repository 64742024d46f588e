"""Trustworthy step-time bisect of the sparse DCN train path on TPU.

Replaces the earlier profile_step*.py scripts, whose numbers were wrong in
three ways this script avoids (all recorded in .claude/skills/verify and
artifacts/step_breakdown_r03.json):

- ``block_until_ready`` does not reliably block through the tunnelled
  backend — every timing here forces completion with ``jax.device_get``;
- an empty jitted scan costs ~22 ms per EXECUTION through the tunnel
  (program launch + sync round trip), so per-step numbers subtract the
  measured empty-run fixed overhead instead of attributing it to the code
  under test;
- XLA deletes code whose outputs are unused or algebraically foldable
  (``sum(g) * 0`` folds to 0 and kills the whole backward) — every variant
  consumes ALL its outputs through an order-dependent iota dot.

Variants (incremental): input (batch take + unpack), + large-table
gathers, + fields/forward/loss, + backward; plus the full production
chunk fn and monkeypatched full-minus-{table update, AUC, dense opt}.
Interleaved min-of-5 rounds to cancel the shared chip's +-30% drift.
"""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from news_recsys_tpu.data.packed_dataset import PackedDataset, unpack_batch
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.training import sparse_step as ss
from news_recsys_tpu.training.trainer import AucHist, Trainer
from news_recsys_tpu.zoo import (MIND_FEATURES, MIND_TABLE_SIZE,
                                 attention_arrays, attention_config,
                                 mind_config)

BATCH, STEPS, ROUNDS = 512, 512, 5


def live(tree):
    """Order-dependent, non-foldable consumption of every leaf."""
    tot = jnp.float32(0)
    for i, leaf in enumerate(jax.tree.leaves(tree)):
        f = leaf.astype(jnp.float32).reshape(-1)
        w = jnp.arange(1, f.shape[0] + 1, dtype=jnp.float32)
        tot = tot + jnp.dot(f, w) * (1.0 + 0.1 * i)
    return tot


def tiny_consume(tree):
    t = jnp.float32(0)
    for leaf in jax.tree.leaves(tree):
        t = t + leaf.astype(jnp.float32).ravel()[0]
    return t * 1e-30


def main():
    which = "attention" if "--model" in sys.argv and \
        sys.argv[sys.argv.index("--model") + 1] == "attention" else "dcn"
    rng = np.random.default_rng(0)
    if which == "attention":
        ds = PackedDataset(attention_arrays(BATCH * STEPS))
        cfg = attention_config(batch_size=BATCH)
    else:
        arrays = {n: rng.integers(1, MIND_TABLE_SIZE[n], BATCH * STEPS).astype(np.int32)
                  for n in MIND_FEATURES}
        arrays["label"] = (rng.random(BATCH * STEPS) < 0.1).astype(np.float32).reshape(-1, 1)
        ds = PackedDataset(arrays)
        cfg = mind_config("dcn", batch_size=BATCH, embedding_optimizer="rowwise_adagrad")
    model = build_ranker(cfg, which)
    print(f"model: {which}")
    with tempfile.TemporaryDirectory() as tmp:
        tr = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        b0 = {k: np.asarray(v[:BATCH]) for k, v in ds.arrays.items()}
        b0["_valid"] = np.ones(BATCH, np.float32)
        state0 = tr.init_state(b0)
        packer = tr._packer(ds)
        int_mat, float_mat = tr._device_matrices(packer)
        layout_key = packer.layout_key()
    idx = jnp.arange(BATCH * STEPS, dtype=jnp.int32).reshape(STEPS, BATCH)

    schema = model.schema
    large = ss._large_tables(model.tables)
    inner0 = state0.params["params"]
    tables = inner0["embedder"]
    dense = {k: v for k, v in inner0.items() if k != "embedder"}
    small = {k: v for k, v in tables.items() if k not in large}

    # ---- fixed overhead: an empty scan of the same length
    @jax.jit
    def empty(x):
        def body(c, i):
            return c + i, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(STEPS, dtype=jnp.float32))
        return c

    # ---- incremental variants
    def make(kind):
        def run(int_mat, float_mat, idx_chunk):
            ones = jnp.ones(BATCH, jnp.float32)

            def body(c, ix):
                im = jnp.take(int_mat, ix, axis=0)
                fm = jnp.take(float_mat, ix, axis=0)
                batch = unpack_batch(im, fm, ones, layout_key)
                labels = batch["label"][:, 0]
                if kind == "input":
                    return c + live(batch), ()
                rows_in = ss.gather_large_rows(schema, batch, tables, large)
                if kind == "gathers":
                    return c + live(rows_in) + live(labels), ()

                unpooled = set(getattr(model, "unpooled_arrays", ()) or ())

                def loss_from(dense_p, small_t, rows):
                    fields, masks = ss.fields_from_rows(
                        schema, batch, rows, small_t, large, unpooled)
                    full = {"params": {**dense_p, "embedder": jax.tree.map(
                        jax.lax.stop_gradient, tables)}}
                    logits = model.apply(full, fields, masks,
                                         method=model.forward_from_fields)
                    per = optax.sigmoid_binary_cross_entropy(logits, labels)
                    return per.mean(), logits

                if kind == "fwd":
                    loss, logits = loss_from(dense, small, rows_in)
                    return c + loss + live(logits), ()
                (loss, _), grads = jax.value_and_grad(
                    loss_from, argnums=(0, 1, 2), has_aux=True)(dense, small, rows_in)
                return c + loss + live(grads), ()

            c, _ = jax.lax.scan(body, jnp.float32(0), idx_chunk)
            return c
        return jax.jit(run)

    # ---- production fn + monkeypatched subtractions
    orig_updater, orig_auc, orig_tx = (ss.make_table_updater,
                                       ss.binned_auc_update, ss.make_dense_tx)

    def noop_updater(cfg_, spec, mesh=None):
        def update(tbls, mu, nu, per_table, step, lr_t):
            s = tiny_consume(per_table)
            return dict(tbls), {k: v + s for k, v in mu.items()}, dict(nu)
        return update

    def noop_auc(hist, probs, labels, weights):
        return AucHist(pos=hist.pos + tiny_consume(probs), neg=hist.neg)

    def build_prod(name):
        ss.make_table_updater = noop_updater if "noupd" in name else orig_updater
        ss.binned_auc_update = noop_auc if "noauc" in name else orig_auc
        ss.make_dense_tx = (lambda c: optax.scale(1e-30)) if "nodense" in name else orig_tx
        fn = ss.make_sparse_chunk_fn(model, layout_key, BATCH, cfg)
        ss.make_table_updater, ss.binned_auc_update, ss.make_dense_tx = (
            orig_updater, orig_auc, orig_tx)
        return fn

    inc = {k: make(k) for k in ("input", "gathers", "fwd", "fwd_bwd")}
    prod = {k: build_prod(k) for k in ("full", "full_noupd", "full_noauc",
                                       "full_nodense")}

    def clone_state():
        return jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, state0)

    jax.device_get(empty(jnp.float32(0)))
    for f in inc.values():
        jax.device_get(f(int_mat, float_mat, idx))
    for f in prod.values():
        jax.device_get(f(clone_state(), AucHist.zeros(), int_mat, float_mat, idx)[2])

    acc = {"empty": []}
    acc.update({k: [] for k in list(inc) + list(prod)})
    for _ in range(ROUNDS):
        t0 = time.perf_counter(); jax.device_get(empty(jnp.float32(0)))
        acc["empty"].append((time.perf_counter() - t0) / STEPS * 1e6)
        for k, f in inc.items():
            t0 = time.perf_counter(); jax.device_get(f(int_mat, float_mat, idx))
            acc[k].append((time.perf_counter() - t0) / STEPS * 1e6)
        for k, f in prod.items():
            s, h = clone_state(), AucHist.zeros()
            jax.device_get(h.pos[0])
            t0 = time.perf_counter()
            jax.device_get(f(s, h, int_mat, float_mat, idx)[2])
            acc[k].append((time.perf_counter() - t0) / STEPS * 1e6)

    fixed = min(acc["empty"])
    print(f"fixed overhead (empty scan): {fixed:6.1f} us/step "
          f"(~{fixed * STEPS / 1000:.0f} ms per execution)")
    for k, v in acc.items():
        if k == "empty":
            continue
        print(f"{k:14s} min={min(v):7.1f}  real≈{min(v) - fixed:6.1f} us/step")


if __name__ == "__main__":
    main()
