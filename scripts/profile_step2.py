"""Finer breakdown of the sparse DCN step's 268us on the single TPU chip.

Increments measured as scan-of-256-steps, device_get-synced:
  unpack      — index-gather the batch rows + unpack
  gathers     — + large-table row gathers (user 94k x 32, item 65k x 32)
  fields_fwd  — + field build + DCN forward (no grad)
  fwd_bwd     — + backward (value_and_grad)
  dense_opt   — + dense AdamW on towers+small tables
  auc         — + binned AUC hist update
  sort1       — one argsort(512 int32) + segment_sum per table, alone
  sort_joint  — single 1024-wide dedup across both tables, alone
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from news_recsys_tpu.data.packed_dataset import PackedDataset, unpack_batch
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.training import sparse_step as ss
from news_recsys_tpu.training.trainer import AucHist, Trainer, binned_auc_update
from news_recsys_tpu.zoo import MIND_FEATURES, MIND_TABLE_SIZE, mind_config

BATCH = 512
STEPS = 256


def timeit(name, fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[-1])
    dt = time.perf_counter() - t0
    print(f"{name:12s} {dt/STEPS*1e6:8.1f} us/step")
    return out


def main():
    import tempfile

    rng = np.random.default_rng(0)
    rows = BATCH * STEPS
    arrays = {
        name: rng.integers(1, MIND_TABLE_SIZE[name], rows).astype(np.int32)
        for name in MIND_FEATURES
    }
    arrays["label"] = (rng.random(rows) < 0.1).astype(np.float32).reshape(-1, 1)
    ds = PackedDataset(arrays)
    cfg = mind_config("dcn", batch_size=BATCH, embedding_optimizer="rowwise_adagrad")
    model = build_ranker(cfg, "dcn")
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        batch0 = {k: np.asarray(v[:BATCH]) for k, v in ds.arrays.items()}
        batch0["_valid"] = np.ones(BATCH, np.float32)
        state = trainer.init_state(batch0)
        packer = trainer._packer(ds)
        int_mat, float_mat = trainer._device_matrices(packer)
        layout_key = packer.layout_key()
        idx = jnp.arange(rows, dtype=jnp.int32).reshape(STEPS, BATCH)

    schema = model.schema
    large = ss._large_tables(model.tables)
    params = state.params
    inner = params["params"]
    tables = inner["embedder"]
    dense = {k: v for k, v in inner.items() if k != "embedder"}
    small = {k: v for k, v in tables.items() if k not in large}
    ones = jnp.ones(BATCH, jnp.float32)

    def scan_over(body):
        def run(carry, int_mat, float_mat, idx):
            def b(c, i):
                return body(c, i)
            carry, outs = jax.lax.scan(b, carry, idx)
            return carry, outs
        return jax.jit(run)

    # ---- unpack only
    def body_unpack(c, i):
        im = jnp.take(int_mat, i, axis=0)
        fm = jnp.take(float_mat, i, axis=0)
        batch = unpack_batch(im, fm, ones, layout_key)
        s = sum(jnp.sum(v) for v in batch.values() if v.dtype != jnp.int32)
        return c + s, s
    timeit("unpack", scan_over(body_unpack), jnp.zeros(()), int_mat, float_mat, idx)

    # ---- + gathers
    def body_gather(c, i):
        im = jnp.take(int_mat, i, axis=0)
        fm = jnp.take(float_mat, i, axis=0)
        batch = unpack_batch(im, fm, ones, layout_key)
        rows_in = ss.gather_large_rows(schema, batch, tables, large)
        s = sum(jnp.sum(v) for v in rows_in.values())
        return c + s, s
    timeit("gathers", scan_over(body_gather), jnp.zeros(()), int_mat, float_mat, idx)

    # ---- + fields + forward
    def fwd(batch, rows_in):
        fields, masks = ss.fields_from_rows(schema, batch, rows_in, small, large, ())
        full = {"params": {**dense, "embedder": tables}}
        return model.apply(full, fields, masks, method=model.forward_from_fields)

    def body_fwd(c, i):
        im = jnp.take(int_mat, i, axis=0)
        fm = jnp.take(float_mat, i, axis=0)
        batch = unpack_batch(im, fm, ones, layout_key)
        rows_in = ss.gather_large_rows(schema, batch, tables, large)
        logits = fwd(batch, rows_in)
        return c + jnp.sum(logits), jnp.sum(logits)
    timeit("fields_fwd", scan_over(body_fwd), jnp.zeros(()), int_mat, float_mat, idx)

    # ---- + backward
    def body_bwd(c, i):
        im = jnp.take(int_mat, i, axis=0)
        fm = jnp.take(float_mat, i, axis=0)
        batch = unpack_batch(im, fm, ones, layout_key)
        rows_in = ss.gather_large_rows(schema, batch, tables, large)
        labels = batch["label"][:, 0]

        def loss_from(dense_p, small_t, r):
            fields, masks = ss.fields_from_rows(schema, batch, r, small_t, large, ())
            full = {"params": {**dense_p, "embedder": tables}}
            logits = model.apply(full, fields, masks, method=model.forward_from_fields)
            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_from, argnums=(0, 1, 2))(dense, small, rows_in)
        s = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return c + s, loss
    timeit("fwd_bwd", scan_over(body_bwd), jnp.zeros(()), int_mat, float_mat, idx)

    # ---- dense AdamW alone (on tower+small grads of ones)
    tx = ss.make_dense_tx(cfg)
    combined0 = {"dense": dense, "small": small}
    opt0 = tx.init(combined0)

    def body_opt(carry, i):
        combined, opt = carry
        g = jax.tree.map(lambda x: x * 0 + 1e-6, combined)
        upd, opt = tx.update(g, opt, combined)
        combined = optax.apply_updates(combined, upd)
        return (combined, opt), jnp.sum(combined["dense"]["mlp"]["layers_0"]["kernel"]) if "mlp" in combined["dense"] else jnp.zeros(())
    def run_opt(carry, idx):
        def b(c, i):
            return body_opt(c, i)
        carry, outs = jax.lax.scan(b, carry, idx)
        return carry, outs
    try:
        timeit("dense_opt", jax.jit(run_opt), (combined0, opt0), jnp.arange(STEPS))
    except Exception as e:
        print("dense_opt failed:", type(e).__name__, str(e)[:120])

    # ---- binned AUC alone
    probs = jnp.linspace(0, 1, BATCH)
    labels = (jnp.arange(BATCH) % 7 == 0).astype(jnp.float32)

    def body_auc(h, i):
        h = binned_auc_update(h, probs + i * 0.0, labels, ones)
        return h, jnp.zeros(())
    def run_auc(h, idx):
        h, outs = jax.lax.scan(body_auc, h, idx)
        return h, outs
    timeit("auc", jax.jit(run_auc), AucHist.zeros(), jnp.arange(STEPS))

    # ---- dedup variants
    ids_u = jnp.asarray(rng.integers(1, 94_059, (STEPS, BATCH)), jnp.int32)
    ids_i = jnp.asarray(rng.integers(1, 65_240, (STEPS, BATCH)), jnp.int32)
    g32 = jnp.ones((BATCH, 32), jnp.float32)

    def body_sort2(c, ids2):
        iu, ii = ids2
        ru, gu, _ = ss._dedup_rows(iu, g32, 94_100)
        ri, gi, _ = ss._dedup_rows(ii, g32, 65_300)
        return c + jnp.sum(gu) + jnp.sum(gi) + jnp.sum(ru) + jnp.sum(ri), jnp.zeros(())
    def run_sort2(c, iu, ii):
        c, outs = jax.lax.scan(body_sort2, c, (iu, ii))
        return c, outs
    timeit("sort2x512", jax.jit(run_sort2), jnp.zeros(()), ids_u, ids_i)

    OFF = 1 << 20
    def body_sortj(c, ids2):
        iu, ii = ids2
        joint = jnp.concatenate([iu, ii + OFF])
        gj = jnp.concatenate([g32, g32])
        rj, gjs, _ = ss._dedup_rows(joint, gj, 2 * OFF)
        return c + jnp.sum(gjs) + jnp.sum(rj), jnp.zeros(())
    def run_sortj(c, iu, ii):
        c, outs = jax.lax.scan(body_sortj, c, (iu, ii))
        return c, outs
    timeit("sort_joint", jax.jit(run_sortj), jnp.zeros(()), ids_u, ids_i)


if __name__ == "__main__":
    main()
