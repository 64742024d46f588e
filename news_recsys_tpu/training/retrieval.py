"""DSSM retrieval training + batched ANN evaluation (HR@k / Recall@k).

Replaces the reference's DSSM Lightning loop (``DSSM/train.py``,
``DSSM/model.py:115-126`` training_step; ``:182-254`` epoch-end faiss eval)
with a first-class :class:`DSSMTrainer` sharing the ranking
:class:`~news_recsys_tpu.training.trainer.Trainer` runtime — same
device-resident chunked ``lax.scan`` epochs, mesh support (DP batches +
row-sharded tables), Orbax mid-epoch checkpoints with ``fit(resume=True)``,
``metrics.jsonl``/TensorBoard scalars, and a per-epoch retrieval validation
block in ``val_log.log`` (the reference computes HR@10 at the end of every
train epoch, ``DSSM/model.py:230-254``).

The eval encodes the full item corpus once, then scores **all** query users
with one matmul+top_k sweep and applies history dedup fully vectorized on
host — vs the reference's one-faiss-query-per-user bs=1 loop.

Per-step negative-sampling keys are derived with ``fold_in(key, step)``
rather than threading a split chain, so mid-epoch resume reproduces the
exact same negatives as an uninterrupted run.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.packed_dataset import PackedDataset
from ..models.dssm import DSSM, dssm_train_loss, _l2
from ..ops.topk import TopKSearcher
from ..utils.logging import get_logger
from .trainer import Trainer, TrainState

logger = get_logger("retrieval")


def make_dssm_train_step(model: DSSM, negative_sample_rate: int, temperature: float,
                         loss_type: str = "infonce", margin: float = 1.0,
                         logq_table=None):
    def step(state: TrainState, rng, batch):
        sub = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(
            lambda p: dssm_train_loss(model, p, sub, batch, negative_sample_rate,
                                      temperature, loss_type, margin,
                                      logq_table=logq_table)
        )(state.params)
        state = state.apply_gradients(grads=grads)
        return state, rng, loss

    return jax.jit(step, donate_argnums=(0,))


def make_dssm_chunk_fn(model: DSSM, layout_key, batch_size: int,
                       negative_sample_rate: int, temperature: float,
                       loss_type: str = "infonce", margin: float = 1.0,
                       logq_table=None):
    """Device-resident chunked (lax.scan) DSSM training — one dispatch per
    chunk of steps; the per-step negatives key is ``fold_in(key, step)``."""
    from ..data.packed_dataset import unpack_batch

    def run(state: TrainState, rng, int_mat, float_mat, idx_chunk):
        ones = jnp.ones(batch_size, jnp.float32)

        def body(carry, idx):
            state, rng = carry
            sub = jax.random.fold_in(rng, state.step)
            im = jnp.take(int_mat, idx, axis=0)
            fm = jnp.take(float_mat, idx, axis=0)
            batch = unpack_batch(im, fm, ones, layout_key)
            loss, grads = jax.value_and_grad(
                lambda p: dssm_train_loss(model, p, sub, batch, negative_sample_rate,
                                          temperature, loss_type, margin,
                                          logq_table=logq_table)
            )(state.params)
            state = state.apply_gradients(grads=grads)
            return (state, rng), loss

        (state, rng), losses = jax.lax.scan(body, (state, rng), idx_chunk)
        return state, rng, losses[-1]

    return jax.jit(run, donate_argnums=(0,))


def make_dssm_sparse_chunk_fn(model: DSSM, layout_key, batch_size: int, cfg: Config,
                              negative_sample_rate: int, temperature: float,
                              loss_type: str = "infonce", margin: float = 1.0,
                              mesh=None, logq_table=None):
    """DSSM chunked training with ROWWISE embedding updates (sparse_adamw or
    rowwise_adagrad): differentiates w.r.t. the gathered user/item table
    rows — the dense (V, D) gradient never exists — and applies the same
    per-table rowwise optimizer as the ranking path. With a model-parallel
    mesh the table scatters run shard-local
    (:func:`~news_recsys_tpu.training.sparse_step.make_sharded_rowwise_update`)."""
    if cfg.train_hparams.embedding_update_period > 1:
        raise NotImplementedError(
            "embedding_update_period > 1 (lazy write-back) is implemented for "
            "the ranking path only; DSSM retrieval training applies exact "
            "per-step updates.")
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
            sub = jax.random.fold_in(rng, state.step)
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
                u_fields, _ = fields_from_rows(u_schema, batch, rows,
                                               small_tbls, large)
                i_fields, _ = fields_from_rows(i_schema, batch, rows,
                                               small_tbls, large)
                full = {"params": {**dense_params,
                                   "embedder": jax.tree.map(jax.lax.stop_gradient, tables)}}
                u_emb, i_emb = model.apply(full, u_fields, i_fields,
                                           method=DSSM.towers_from_fields)
                return dssm_loss_from_embeddings(sub, u_emb, i_emb, batch,
                                                 negative_sample_rate, temperature,
                                                 loss_type, margin,
                                                 logq_table=logq_table)

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


def format_retrieval_block(results: Dict[str, float], epoch: int) -> str:
    """Retrieval counterpart of ``format_validation_block``: one
    ``Retrieval:`` section per epoch, parseable by ``utils.log_analysis``."""
    lines = [f"\n{'=' * 20} Epoch {epoch} Validation Results {'=' * 20}",
             "Retrieval:"]
    for key in sorted(results):
        if key == "num_queries":
            continue
        lines.append(f"  {key}:    {results[key]:.4f}")
    lines.append(f"  Queries:  {int(results.get('num_queries', 0))}")
    lines.append("=" * 60)
    return "\n".join(lines) + "\n"


class DSSMTrainer(Trainer):
    """Two-tower trainer with per-epoch retrieval eval — a first-class
    :class:`Trainer`: mesh DP + row-sharded tables, chunked device-resident
    epochs, Orbax resume, ``metrics.jsonl``/TB logging all inherited.

    Hyperparameters come from the config's ``dssm_cfg`` block (the
    reference exposes them as CLI flags, ``DSSM/train.py:11-18``):
    ``negative_sample_rate``, ``temperature``, ``loss`` (infonce|triplet),
    ``margin``.
    """

    def __init__(self, cfg: Config, model: DSSM, workdir: Optional[str] = None,
                 mesh=None, use_mesh: bool = True, profile_steps: int = 0,
                 negative_sample_rate: Optional[int] = None,
                 temperature: Optional[float] = None):
        dcfg = cfg.extra("dssm_cfg", {}) or {}
        if negative_sample_rate is None:
            negative_sample_rate = int(dcfg.get("negative_sample_rate", 3))
        if temperature is None:
            temperature = float(dcfg.get("temperature", 0.1))
        loss_type = str(dcfg.get("loss", "infonce"))
        margin = float(dcfg.get("margin", 1.0))
        self.negative_sample_rate = negative_sample_rate
        self._loss_args = (negative_sample_rate, temperature, loss_type, margin)
        # dssm_cfg.logq_correction: sampling-bias-corrected InfoNCE — each
        # candidate's logit gets -log q(item) so in-batch negatives stop
        # penalizing popular items (models.dssm.info_nce_loss). The (V,)
        # log-q table is built from the TRAIN split at fit() time.
        self._logq = bool(dcfg.get("logq_correction", False))
        self._logq_table = None
        super().__init__(cfg, model, workdir=workdir, mesh=mesh,
                         use_mesh=use_mesh, profile_steps=profile_steps)
        # replace the ranking (BCE) single step with the two-tower one
        self.train_step = make_dssm_train_step(model, *self._loss_args)
        self.encode_user = jax.jit(partial(model.apply, method=DSSM.user_embedding))
        self.encode_item = jax.jit(partial(model.apply, method=DSSM.item_embedding))
        self._eval_data: Optional[Dict] = None

    # -- epoch carry: a PRNG key for in-batch negatives ----------------------

    def _epoch_carry(self, epoch: int):
        key = jax.random.PRNGKey(self.cfg.train_hparams.seed + 1)
        return self._put_replicated(key)

    def _carry_metrics(self, carry) -> Dict[str, float]:
        return {}

    def _chunked_step(self, layout_key, batch_size):
        if not hasattr(self, "_chunked_steps"):
            self._chunked_steps = {}
        key = (layout_key, batch_size)
        if key not in self._chunked_steps:
            if self.sparse_embeddings:
                self._chunked_steps[key] = make_dssm_sparse_chunk_fn(
                    self.model, layout_key, batch_size, self.cfg,
                    *self._loss_args, mesh=self.mesh,
                    logq_table=self._logq_table)
            else:
                self._chunked_steps[key] = make_dssm_chunk_fn(
                    self.model, layout_key, batch_size, *self._loss_args,
                    logq_table=self._logq_table)
        return self._chunked_steps[key]

    def fit(self, train_ds, dev_ds=None, warm_user_set=None, state=None,
            max_epochs=None, resume=False):
        if self._logq and self._logq_table is None:
            import jax.numpy as jnp

            from ..models.dssm import item_log_q
            vocab = int(self.cfg.embeddings.embedding_table_size["item_id"])
            self._logq_table = self._put_replicated(
                jnp.asarray(item_log_q(train_ds, vocab)))
            self.train_step = make_dssm_train_step(
                self.model, *self._loss_args, logq_table=self._logq_table)
            logger.info("logQ correction on: per-item sampling-bias table "
                        f"built from {len(train_ds)} train rows")
        return super().fit(train_ds, dev_ds=dev_ds, warm_user_set=warm_user_set,
                           state=state, max_epochs=max_epochs, resume=resume)

    # -- retrieval validation --------------------------------------------------

    def set_eval_data(self, item_ds: PackedDataset,
                      histories: Optional[Sequence[Sequence[int]]] = None,
                      k: int = 10) -> None:
        """Attach the retrieval-eval context used by :meth:`validate`:
        the item corpus to encode, per-query-row click histories (excluded
        from candidates), and the cutoff ``k``."""
        self._eval_data = {"item_ds": item_ds, "histories": histories, "k": k}

    def validate(self, state, ds: PackedDataset, epoch: int,
                 warm_user_set=None) -> Dict[str, float]:
        """Per-epoch HR@k over ``ds`` (the positive dev impressions), the
        reference's epoch-end faiss eval (``DSSM/model.py:230-254``) batched.
        Requires :meth:`set_eval_data` first."""
        if self._eval_data is None:
            logger.warning("DSSMTrainer.validate called without set_eval_data; skipping")
            return {}
        ev = self._eval_data
        histories = ev["histories"]
        if histories is None:
            histories = [[] for _ in range(len(ds))]
        res = evaluate_retrieval(self, state.params, ev["item_ds"], ds,
                                 target_item_ids=ds.arrays["item_id"],
                                 histories=histories, k=ev["k"])
        block = format_retrieval_block(res, epoch)
        if self.is_main:
            print(block)
            with open(self.val_log_path, "a") as f:
                f.write(block)
        self._log_scalars(self.global_step, epoch=epoch,
                          **{f"val_{k.lower().replace('@', '_at_')}": v
                             for k, v in res.items()})
        return res

    # -- checkpointing ---------------------------------------------------------

    def save_checkpoint(self, state, epoch: int) -> str:
        """Weight-only per-epoch checkpoints, full history (the reference's
        ModelCheckpoint(save_top_k=-1, save_weights_only=True),
        ``DSSM/train.py:54-60``). Full-state resume uses the inherited Orbax
        path (``ckpt_every_steps`` + ``fit(resume=True)``)."""
        from flax import serialization
        path = os.path.join(self.ckpt_dir, f"epoch_{epoch:03d}.msgpack")
        if jax.process_count() > 1:
            from ..parallel.distributed import fetch_pytree_to_host
            host_params = fetch_pytree_to_host(state.params, self.mesh)
            if not self.is_main:
                return path
        else:
            host_params = jax.device_get(state.params)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(host_params))
        return path

    def load_params(self, state, path: str):
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


def dedup_hit_rate(retrieved_ids: np.ndarray, target_item_ids: np.ndarray,
                   histories: Sequence[Sequence[int]], k: int) -> float:
    """HR@k after removing each row's history from its retrieved list —
    fully vectorized (no per-row Python loop over queries).

    A retrieved item is *kept* if not in the row's history; the target hits
    if it appears among the first ``k`` kept items. Membership is tested via
    a per-row keyed ``np.isin`` (row*base+item composite keys).
    """
    q, fetch = retrieved_ids.shape
    lens = np.fromiter((len(h) for h in histories), np.int64, len(histories))
    if lens.sum() > 0:
        flat = np.concatenate([np.asarray(h, np.int64) for h in histories if len(h)])
        base = int(max(retrieved_ids.max(initial=0), flat.max(initial=0))) + 2
        row_of = np.repeat(np.arange(q, dtype=np.int64), lens)
        hist_keys = row_of * base + flat
        ret_keys = np.arange(q, dtype=np.int64)[:, None] * base + retrieved_ids
        banned = np.isin(ret_keys, hist_keys)
    else:
        banned = np.zeros((q, fetch), bool)
    kept_rank = np.cumsum(~banned, axis=1) - 1          # rank among kept items
    is_target = retrieved_ids == np.asarray(target_item_ids, np.int64)[:, None]
    hits = np.any(is_target & ~banned & (kept_rank < k), axis=1)
    return float(hits.mean()) if q else 0.0


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

    hr = dedup_hit_rate(retrieved_ids, np.asarray(target_item_ids, np.int64),
                        histories, k)
    return {f"HR@{k}": hr, "num_queries": len(target_item_ids)}
