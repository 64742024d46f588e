"""DSSM retrieval training + batched ANN evaluation (HR@k / Recall@k).

Replaces the reference's DSSM Lightning loop (``DSSM/train.py``,
``DSSM/model.py:115-126`` training_step; ``:182-254`` epoch-end faiss eval):
the eval encodes the full item corpus once, then scores **all** query users
with one matmul+top_k sweep and applies per-user history dedup on host — vs
the reference's one-faiss-query-per-user bs=1 loop.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.packed_dataset import PackedDataset, iterate_batches
from ..models.dssm import DSSM, dssm_train_loss, _l2
from ..ops.topk import TopKSearcher
from ..utils.logging import get_logger
from .trainer import TrainState, make_optimizer

logger = get_logger("retrieval")


def make_dssm_train_step(model: DSSM, negative_sample_rate: int, temperature: float,
                         loss_type: str = "infonce", margin: float = 1.0):
    def step(state: TrainState, rng, batch):
        rng, sub = jax.random.split(rng)
        loss, grads = jax.value_and_grad(
            lambda p: dssm_train_loss(model, p, sub, batch, negative_sample_rate,
                                      temperature, loss_type, margin)
        )(state.params)
        state = state.apply_gradients(grads=grads)
        return state, rng, loss

    return jax.jit(step, donate_argnums=(0,))


def make_dssm_chunk_fn(model: DSSM, layout_key, batch_size: int,
                       negative_sample_rate: int, temperature: float,
                       loss_type: str = "infonce", margin: float = 1.0):
    """Device-resident chunked (lax.scan) DSSM training — one dispatch per
    chunk of steps, rng folded inside the scan."""
    from ..data.packed_dataset import unpack_batch

    def run(state: TrainState, rng, int_mat, float_mat, idx_chunk):
        ones = jnp.ones(batch_size, jnp.float32)

        def body(carry, idx):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            im = jnp.take(int_mat, idx, axis=0)
            fm = jnp.take(float_mat, idx, axis=0)
            batch = unpack_batch(im, fm, ones, layout_key)
            loss, grads = jax.value_and_grad(
                lambda p: dssm_train_loss(model, p, sub, batch, negative_sample_rate,
                                          temperature, loss_type, margin)
            )(state.params)
            state = state.apply_gradients(grads=grads)
            return (state, rng), loss

        (state, rng), losses = jax.lax.scan(body, (state, rng), idx_chunk)
        return state, rng, losses[-1]

    return jax.jit(run, donate_argnums=(0,))


def make_dssm_sparse_chunk_fn(model: DSSM, layout_key, batch_size: int, cfg: Config,
                              negative_sample_rate: int, temperature: float,
                              loss_type: str = "infonce", margin: float = 1.0,
                              mesh=None):
    """DSSM chunked training with ROWWISE embedding updates (sparse_adamw or
    rowwise_adagrad): differentiates w.r.t. the gathered user/item table
    rows — the dense (V, D) gradient never exists — and applies the same
    per-table rowwise optimizer as the ranking path."""
    from ..data.packed_dataset import unpack_batch
    from ..models.dssm import dssm_loss_from_embeddings
    from .sparse_step import (SparseTrainState, _large_tables, collect_per_table,
                              fields_from_rows, gather_large_rows, make_dense_tx,
                              make_table_updater)
    from .schedule import hold_cosine_floor

    hp = cfg.train_hparams
    sched = hold_cosine_floor(hp.lr, hp.min_lr, hp.lr_milestones)
    dense_tx = make_dense_tx(cfg)
    large = _large_tables(model.tables)
    table_update = make_table_updater(cfg, model.tables, mesh)
    u_schema, i_schema = model.user_schema, model.item_schema

    def run(state: SparseTrainState, rng, int_mat, float_mat, idx_chunk):
        ones = jnp.ones(batch_size, jnp.float32)

        def body(carry, idx):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            im = jnp.take(int_mat, idx, axis=0)
            fm = jnp.take(float_mat, idx, axis=0)
            batch = unpack_batch(im, fm, ones, layout_key)

            inner = state.params["params"]
            tables = inner["embedder"]
            dense = {k: v for k, v in inner.items() if k != "embedder"}
            small = {k: v for k, v in tables.items() if k not in large}

            rows_in = {**gather_large_rows(u_schema, batch, tables, large),
                       **gather_large_rows(i_schema, batch, tables, large)}

            def loss_from(dense_params, small_tbls, rows):
                u_fields, _ = fields_from_rows(u_schema, batch, rows, small_tbls, large)
                i_fields, _ = fields_from_rows(i_schema, batch, rows, small_tbls, large)
                full = {"params": {**dense_params,
                                   "embedder": jax.tree.map(jax.lax.stop_gradient, tables)}}
                u_emb, i_emb = model.apply(full, u_fields, i_fields,
                                           method=DSSM.towers_from_fields)
                return dssm_loss_from_embeddings(sub, u_emb, i_emb, batch,
                                                 negative_sample_rate, temperature,
                                                 loss_type, margin)

            loss, (dense_g, small_g, row_g) = jax.value_and_grad(
                loss_from, argnums=(0, 1, 2))(dense, small, rows_in)

            combined = {"dense": dense, "small": small}
            updates, dense_opt = dense_tx.update(
                {"dense": dense_g, "small": small_g}, state.dense_opt, combined)
            combined = optax.apply_updates(combined, updates)
            dense, small = combined["dense"], combined["small"]

            lr_t = sched(state.step)
            # a feature in BOTH schemas has one rows_in entry whose gradient
            # already sums both towers' contributions — collect it once
            per_table = collect_per_table(u_schema, batch, row_g, large)
            seen = {s.name for s in u_schema.specs}
            i_only = i_schema.subset([s.name for s in i_schema.specs
                                      if s.name not in seen])
            for t, pairs in collect_per_table(i_only, batch, row_g, large).items():
                per_table.setdefault(t, []).extend(pairs)
            new_tables, new_mu, new_nu = table_update(
                tables, state.emb_mu, state.emb_nu, per_table, state.step, lr_t)
            new_tables.update(small)

            params = {"params": {**dense, "embedder": new_tables}}
            state = SparseTrainState(params=params, dense_opt=dense_opt,
                                     emb_mu=new_mu, emb_nu=new_nu, step=state.step + 1)
            return (state, rng), loss

        (state, rng), losses = jax.lax.scan(body, (state, rng), idx_chunk)
        return state, rng, losses[-1]

    return jax.jit(run, donate_argnums=(0,))


class DSSMTrainer:
    """Two-tower trainer with per-epoch retrieval eval.

    Hyperparameters come from the config's ``dssm_cfg`` block (the
    reference exposes them as CLI flags, ``DSSM/train.py:11-18``):
    ``negative_sample_rate``, ``temperature``, ``loss`` (infonce|triplet),
    ``margin``.
    """

    DEVICE_RESIDENT_BYTES = 2 << 30   # datasets up to 2 GB live in HBM

    def __init__(self, cfg: Config, model: DSSM, workdir: Optional[str] = None,
                 negative_sample_rate: Optional[int] = None,
                 temperature: Optional[float] = None):
        dcfg = cfg.extra("dssm_cfg", {}) or {}
        if negative_sample_rate is None:
            negative_sample_rate = int(dcfg.get("negative_sample_rate", 3))
        if temperature is None:
            temperature = float(dcfg.get("temperature", 0.1))
        loss_type = str(dcfg.get("loss", "infonce"))
        margin = float(dcfg.get("margin", 1.0))
        self.cfg = cfg
        self.model = model
        self.negative_sample_rate = negative_sample_rate
        ts = time.strftime("%Y%m%d-%H%M%S")
        self.log_dir = workdir or os.path.join("experiments", f"{cfg.name}_{ts}")
        self.ckpt_dir = os.path.join(self.log_dir, "ckpts")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._loss_args = (negative_sample_rate, temperature, loss_type, margin)
        self.train_step = make_dssm_train_step(model, negative_sample_rate, temperature,
                                               loss_type, margin)
        self.encode_user = jax.jit(partial(model.apply, method=DSSM.user_embedding))
        self.encode_item = jax.jit(partial(model.apply, method=DSSM.item_embedding))
        self.global_step = 0

    @property
    def sparse_embeddings(self) -> bool:
        return self.cfg.train_hparams.embedding_optimizer in (
            "sparse_adamw", "rowwise_adagrad")

    def init_state(self, sample_batch):
        params = self.model.init(jax.random.PRNGKey(self.cfg.train_hparams.seed),
                                 jax.device_put(sample_batch))
        if self.sparse_embeddings:
            from .sparse_step import init_sparse_state, make_dense_tx
            return init_sparse_state(params, self.cfg, make_dense_tx(self.cfg),
                                     self.model.tables)
        return TrainState.create(apply_fn=self.model.apply, params=params,
                                 tx=make_optimizer(self.cfg))

    def _chunk_runner(self, layout_key, bs):
        # cache per (layout, batch): a fresh jax.jit wrapper per fit() call
        # would recompile every epoch range
        if not hasattr(self, "_runners"):
            self._runners = {}
        key = (layout_key, bs, self.sparse_embeddings)
        if key not in self._runners:
            if self.sparse_embeddings:
                self._runners[key] = make_dssm_sparse_chunk_fn(
                    self.model, layout_key, bs, self.cfg, *self._loss_args)
            else:
                self._runners[key] = make_dssm_chunk_fn(
                    self.model, layout_key, bs, *self._loss_args)
        return self._runners[key]

    def fit(self, train_ds: PackedDataset, epochs: Optional[int] = None,
            state=None):
        hp = self.cfg.train_hparams
        epochs = epochs if epochs is not None else hp.max_epoch
        if state is None:
            sample = next(iterate_batches(train_ds, self.cfg.dataset.batch_size, shuffle=False))
            state = self.init_state(sample)
        rng = jax.random.PRNGKey(hp.seed + 1)
        bs = self.cfg.dataset.batch_size
        from ..data.packed_dataset import BatchPacker
        packer = getattr(train_ds, "_packer_cache", None) or BatchPacker(train_ds)
        train_ds._packer_cache = packer
        device_resident = (
            packer.int_mat.nbytes + packer.float_mat.nbytes
            <= self.DEVICE_RESIDENT_BYTES
        )
        if device_resident and not hasattr(packer, "_dssm_dev"):
            packer._dssm_dev = (jax.device_put(packer.int_mat),
                                jax.device_put(packer.float_mat))
        run = self._chunk_runner(packer.layout_key(), bs)
        from .trainer import Trainer
        chunk_steps = Trainer.CHUNK_STEPS
        for epoch in range(epochs):
            if self.global_step >= hp.max_step:
                logger.info(f"Reached max_step={hp.max_step}; stopping.")
                break
            last = None
            perm_rng = np.random.default_rng(
                np.random.SeedSequence([self.cfg.dataset.shuffle_seed, epoch]))
            nb = min(packer.n // bs, hp.max_step - self.global_step)
            order = perm_rng.permutation(packer.n)[: nb * bs]
            pos = 0
            while pos < nb:
                c = min(chunk_steps, nb - pos)
                if device_resident:
                    int_dev, float_dev = packer._dssm_dev
                    idx = order[pos * bs : (pos + c) * bs].reshape(c, bs).astype(np.int32)
                else:
                    # slab-streamed: host gathers the chunk's rows, identity idx
                    slab = order[pos * bs : (pos + c) * bs]
                    int_dev = jax.device_put(packer.int_mat[slab])
                    float_dev = jax.device_put(packer.float_mat[slab])
                    idx = np.arange(c * bs, dtype=np.int32).reshape(c, bs)
                state, rng, last = run(state, rng, int_dev, float_dev,
                                       jax.device_put(idx))
                pos += c
                self.global_step += c
            if last is not None:
                logger.info(f"dssm epoch {epoch}: loss={float(jax.device_get(last)):.4f}")
            else:
                logger.warning(f"dssm epoch {epoch}: no steps ran "
                               f"(dataset rows {len(train_ds)} < batch_size {bs}?)")
            self.save_checkpoint(state, epoch)
        return state

    def save_checkpoint(self, state: TrainState, epoch: int) -> str:
        """Weight-only per-epoch checkpoints, full history (the reference's
        ModelCheckpoint(save_top_k=-1, save_weights_only=True),
        ``DSSM/train.py:54-60``)."""
        from flax import serialization
        path = os.path.join(self.ckpt_dir, f"epoch_{epoch:03d}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(state.params)))
        return path

    def load_params(self, state: TrainState, path: str):
        from flax import serialization
        with open(path, "rb") as f:
            restored = serialization.from_bytes(jax.device_get(state.params), f.read())
        return state.replace(params=restored)

    # -- encoding ------------------------------------------------------------

    def _encode(self, params, ds: PackedDataset, fn) -> np.ndarray:
        from ..data.packed_dataset import encode_dataset
        bs = self.cfg.dataset.eval_batch_size or self.cfg.dataset.batch_size
        return encode_dataset(params, ds, fn, bs)

    def encode_item_corpus(self, params, item_ds: PackedDataset) -> np.ndarray:
        return np.asarray(_l2(jnp.asarray(self._encode(params, item_ds, self.encode_item))))

    def encode_users(self, params, ds: PackedDataset) -> np.ndarray:
        return np.asarray(_l2(jnp.asarray(self._encode(params, ds, self.encode_user))))


def evaluate_retrieval(
    trainer: DSSMTrainer,
    params,
    item_ds: PackedDataset,
    query_ds: PackedDataset,
    target_item_ids: np.ndarray,
    histories: Sequence[np.ndarray],
    k: int = 10,
) -> Dict[str, float]:
    """HitRate@k with user-history dedup, batched over all queries.

    ``query_ds`` rows are (typically positive) dev impressions;
    ``target_item_ids`` the clicked item per row; ``histories`` the user's
    prior clicked item ids per row (excluded from the candidate list, as in
    ``DSSM/model.py:205-224``).
    """
    corpus = trainer.encode_item_corpus(params, item_ds)
    corpus_item_ids = item_ds.arrays["item_id"].astype(np.int64)
    users = trainer.encode_users(params, query_ds)

    max_hist = max((len(h) for h in histories), default=0)
    searcher = TopKSearcher(normalize=False)  # embeddings already normalized
    searcher.update_embedding(corpus)
    fetch = min(k + max_hist, corpus.shape[0])
    idx, _ = searcher.search(users, fetch)
    retrieved_ids = corpus_item_ids[idx]  # (Q, fetch)

    hits = 0
    for row in range(len(target_item_ids)):
        hist = set(int(x) for x in histories[row])
        kept = [int(i) for i in retrieved_ids[row] if int(i) not in hist][:k]
        if int(target_item_ids[row]) in kept:
            hits += 1
    hr = hits / max(1, len(target_item_ids))
    return {f"HR@{k}": hr, "num_queries": len(target_item_ids)}
