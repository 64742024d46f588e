"""Step-time breakdown of the sparse (rowwise_adagrad) DCN train path on TPU.

Measures, per step (batch 512, full MIND tables), via scan-of-N-steps timing:
  full        — the production chunk step (unchanged)
  no_update   — same minus the large-table updates (grads still computed)
  no_dedup    — full minus the sort/dedup (scatter-add semantics, wrong adagrad
                moments under duplicate ids, timing only)
  fwd_bwd     — forward+backward only (no optimizers at all)
Prints a table of us/step so we know what to attack.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.training.trainer import AucHist, Trainer
from news_recsys_tpu.zoo import MIND_FEATURES, MIND_TABLE_SIZE, mind_config

BATCH = 512
STEPS = 256


def make_ds(rows):
    rng = np.random.default_rng(0)
    arrays = {
        name: rng.integers(1, MIND_TABLE_SIZE[name], rows).astype(np.int32)
        for name in MIND_FEATURES
    }
    arrays["label"] = (rng.random(rows) < 0.1).astype(np.float32).reshape(-1, 1)
    return PackedDataset(arrays)


def time_variant(name, run, state, hist, int_mat, float_mat, idx):
    # donated args: keep fresh copies
    import copy
    s = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, state)
    h = jax.tree.map(jnp.copy, hist)
    out = run(s, h, int_mat, float_mat, idx)      # compile
    jax.device_get(out[2])                        # true sync through the tunnel
    s, h = out[0], out[1]
    t0 = time.perf_counter()
    out = run(s, h, int_mat, float_mat, idx)
    jax.device_get(out[2])
    dt = time.perf_counter() - t0
    us = dt / STEPS * 1e6
    print(f"{name:12s} {us:8.1f} us/step   {BATCH/ (dt/STEPS) / 1e6:6.2f}M ex/s")
    return out


def main():
    import tempfile

    ds = make_ds(BATCH * STEPS)
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
        idx = jnp.arange(BATCH * STEPS, dtype=jnp.int32).reshape(STEPS, BATCH)

        from news_recsys_tpu.training import sparse_step as ss

        run_full = ss.make_sparse_chunk_fn(model, layout_key, BATCH, cfg)
        time_variant("full", run_full, state, AucHist.zeros(), int_mat, float_mat, idx)

        # ---- variant: no large-table update (monkeypatched updater)
        orig_updater = ss.make_table_updater

        def no_update(cfg_, spec, mesh=None):
            def update(tables, mu, nu, per_table, step, lr_t):
                # consume grads so they aren't DCE'd: add a scalar to mu
                s = sum(jnp.sum(p[1]) * 0 for pairs in per_table.values() for p in pairs)
                return dict(tables), {k: v + s for k, v in mu.items()}, dict(nu)
            return update

        ss.make_table_updater = no_update
        run_nu = ss.make_sparse_chunk_fn(model, layout_key, BATCH, cfg)
        time_variant("no_update", run_nu, state, AucHist.zeros(), int_mat, float_mat, idx)

        # ---- variant: no dedup (raw ids, scatter-add grads; wrong moments, timing only)
        def no_dedup(cfg_, spec, mesh=None):
            def update(tables, mu, nu, per_table, step, lr_t):
                new_t, new_m = dict(tables), dict(mu)
                for tname, pairs in per_table.items():
                    ids = jnp.concatenate([p[0] for p in pairs])
                    g = jnp.concatenate([p[1] for p in pairs])
                    acc_rows = mu[tname][ids] + jnp.mean(g * g, axis=-1)
                    upd = lr_t * g / (jnp.sqrt(acc_rows) + 1e-10)[:, None]
                    new_t[tname] = tables[tname].at[ids].add(-upd)
                    new_m[tname] = mu[tname].at[ids].max(acc_rows)
                return new_t, new_m, dict(nu)
            return update

        ss.make_table_updater = no_dedup
        run_nd = ss.make_sparse_chunk_fn(model, layout_key, BATCH, cfg)
        time_variant("no_dedup", run_nd, state, AucHist.zeros(), int_mat, float_mat, idx)
        ss.make_table_updater = orig_updater

        # ---- variant: fwd+bwd only (no dense opt either)
        import optax
        from news_recsys_tpu.config import ARRAY, DENSE, SPARSE
        schema = model.schema
        large = ss._large_tables(model.tables)

        def make_fwd_bwd():
            from news_recsys_tpu.data.packed_dataset import unpack_batch

            def run(state, hist, int_mat, float_mat, idx_chunk):
                ones = jnp.ones(BATCH, jnp.float32)

                def body(carry, idx):
                    state, hist = carry
                    im = jnp.take(int_mat, idx, axis=0)
                    fm = jnp.take(float_mat, idx, axis=0)
                    batch = unpack_batch(im, fm, ones, layout_key)
                    inner = state.params["params"]
                    tables = inner["embedder"]
                    dense = {k: v for k, v in inner.items() if k != "embedder"}
                    small = {k: v for k, v in tables.items() if k not in large}
                    rows_in = ss.gather_large_rows(schema, batch, tables, large)
                    labels = batch["label"][:, 0]

                    def loss_from(dense_params, small_tbls, rows):
                        fields, masks = ss.fields_from_rows(
                            schema, batch, rows, small_tbls, large, ())
                        full = {"params": {**dense_params,
                                           "embedder": jax.tree.map(jax.lax.stop_gradient, tables)}}
                        logits = model.apply(full, fields, masks,
                                             method=model.forward_from_fields)
                        per_ex = optax.sigmoid_binary_cross_entropy(logits, labels)
                        return per_ex.mean(), logits

                    (loss, logits), grads = jax.value_and_grad(
                        loss_from, argnums=(0, 1, 2), has_aux=True)(dense, small, rows_in)
                    # fold grads into mu so nothing is DCE'd
                    gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads)) * 0
                    mu = {k: v + gsum for k, v in state.emb_mu.items()}
                    state = state.replace(emb_mu=mu, step=state.step + 1)
                    return (state, hist), loss

                (state, hist), losses = jax.lax.scan(body, (state, hist), idx_chunk)
                return state, hist, losses[-1]

            return jax.jit(run, donate_argnums=(0, 1))

        time_variant("fwd_bwd", make_fwd_bwd(), state, AucHist.zeros(),
                     int_mat, float_mat, idx)


if __name__ == "__main__":
    main()
