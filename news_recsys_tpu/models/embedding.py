"""Embedding engine: shared, shardable tables + the sorted-name concat contract.

TPU-first re-design of the reference's embedding machinery
(``base_model.py:141-166`` table construction, ``:262-282`` lookup/pooling,
``:284-308`` sorted-name gather+concat):

- one parameter per *unique* table (share-aliased features reuse a table);
- vocab row-counts are padded up to a multiple of 128 so tables tile onto
  (8,128)/(16,128) TPU layouts and divide evenly under row-sharding
  (``PartitionSpec('model', None)``) for any power-of-two mesh axis;
- row 0 is the padding row: lookups multiply by ``(ids != 0)`` which makes
  both the value and the gradient of row 0 exactly zero — the functional
  equivalent of torch ``nn.Embedding(padding_idx=0)``;
- array features are masked-mean pooled with the reference's ``+1e-8``
  denominator (``base_model.py:273-282``);
- the concat order is taken from :class:`~news_recsys_tpu.config.FeatureSchema`
  (sorted feature names) so FM / Wide&Deep column-slicing semantics are a
  schema-level invariant, not an implicit convention.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ARRAY, DENSE, SPARSE, Config, FeatureSchema, table_specs


def offset_ids(spec, ids):
    """Logical feature ids -> physical table rows (arena packing): real ids
    shift by ``spec.id_offset``, padding id 0 stays 0.

    Arena members additionally clamp out-of-range logical ids
    (``>= member_vocab``) to padding: pre-arena, ``jnp.take``'s clip mode and
    per-table bounds kept a corrupt id inside the feature's OWN table; with
    packing it would otherwise silently read/write the NEXT member's rows.
    """
    if spec.member_vocab > 0:
        ok = (ids > 0) & (ids < spec.member_vocab)
        return jnp.where(ok, ids + spec.id_offset, 0)
    return ids

VOCAB_PAD_MULTIPLE = 128

# Max combined flat ids for merging same-table gathers into one take.
# A TPU gather costs ~10 us fixed + ~4 ns/row (artifacts/
# scatter_ncurve_r04.json, attention_step_r04.json), so merging pays at
# small slot counts (DCN's user+item arena: 2x512 -> one 1024-row take)
# but LOSES above a few thousand rows where the concat + split copies of
# an already-materialized (N, D) gather output outweigh the one saved
# fixed cost (measured -3.6% e2e on the attention ranker's 15.9k-slot
# hist+item merge, artifacts/arena_ab_r05.json).
GATHER_MERGE_MAX_SLOTS = 4096

# Tables with vocab below this always stay float32 (and, on the sparse
# optimizer path, use exact dense AdamW): their full-table HBM traffic is
# trivial, so low-precision storage buys nothing and costs accuracy.
SMALL_VOCAB_THRESHOLD = 4096


def table_storage_dtype(table_dtype: str, vocab: int):
    """Storage dtype for a table: ``bfloat16`` applies to LARGE tables only.

    bf16 halves the HBM footprint and gather/scatter traffic of the big id
    tables (user 94k x 32, item 65k x 32 in the reference config) — the
    dominant memory traffic of a recsys step — while small side tables
    (category/subcategory, vocab < SMALL_VOCAB_THRESHOLD) keep full
    precision at negligible cost.
    """
    if table_dtype == "bfloat16" and vocab >= SMALL_VOCAB_THRESHOLD:
        return jnp.bfloat16
    return jnp.float32


def padded_vocab(vocab: int) -> int:
    """Round vocab+1 up to a multiple of 128: tiles TPU layouts, divides
    evenly under row-sharding, and guarantees at least one spare row above
    all real ids (the sparse-optimizer scatter sink)."""
    return ((vocab + 1 + VOCAB_PAD_MULTIPLE - 1) // VOCAB_PAD_MULTIPLE) * VOCAB_PAD_MULTIPLE


def embedding_init(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1); padding row zeroed."""
    table = jax.random.normal(key, shape, dtype)
    return table.at[0].set(0.0)


def scaled_embedding_init(scale: float):
    """N(0, scale) embedding init (``embeddings.init_scale``); 1.0 is the
    torch default the reference inherits. Shallow models that score directly
    from raw embeddings (LR/FM) need a small scale to start un-saturated."""
    if scale == 1.0:
        return embedding_init

    def init(key, shape, dtype=jnp.float32):
        table = jax.random.normal(key, shape, dtype) * jnp.asarray(scale, dtype)
        return table.at[0].set(0.0)

    return init


class EmbeddingCollection(nn.Module):
    """Owns every embedding table; provides lookup / pool / concat.

    ``tables``: mapping table-name -> (vocab, dim), typically from
    :func:`news_recsys_tpu.config.table_specs`.
    """

    tables: Tuple[Tuple[str, Tuple[int, int]], ...]  # hashable static spec
    # "float32" | "bfloat16": storage dtype for LARGE tables (see
    # table_storage_dtype); lookups always return float32.
    table_dtype: str = "float32"
    # N(0, init_scale) table init; 1.0 = torch default (reference parity)
    init_scale: float = 1.0

    def setup(self):
        params = {}
        init = scaled_embedding_init(self.init_scale)
        for name, (vocab, dim) in self.tables:
            dtype = table_storage_dtype(self.table_dtype, vocab)
            params[name] = self.param(
                name, init, (padded_vocab(vocab), dim), dtype)
        self._tables = params

    @staticmethod
    def from_config(cfg: Config) -> "EmbeddingCollection":
        return EmbeddingCollection(tables=tuple(sorted(table_specs(cfg).items())),
                                   table_dtype=cfg.mesh.param_dtype,
                                   init_scale=cfg.embeddings.init_scale)

    # -- single-feature ops -------------------------------------------------

    def lookup(self, table_name: str, ids: jnp.ndarray) -> jnp.ndarray:
        """Gather rows; id 0 (padding) yields exact zeros (value and grad).

        With an active explicit-collectives mesh
        (:func:`news_recsys_tpu.parallel.sharded_embedding.set_active_mesh`)
        the gather runs as a shard_map local-lookup + psum over the row
        shards; otherwise GSPMD partitions the plain take.
        """
        from ..parallel.sharded_embedding import active_mesh, sharded_lookup

        table = self._tables[table_name]
        ctx = active_mesh()
        if ctx is not None:
            mesh, model_axis, data_axis = ctx
            emb = sharded_lookup(table, ids, mesh, model_axis, data_axis)
        else:
            emb = jnp.take(table, ids, axis=0)
        # bf16-stored tables upcast after the gather: HBM reads move half the
        # bytes, downstream field math stays float32.
        emb = emb.astype(jnp.float32)
        return emb * (ids != 0).astype(emb.dtype)[..., None]

    @staticmethod
    def pool(emb: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Masked mean over axis 1: (B, L, D), (B, L) -> (B, D)."""
        mask = mask.astype(emb.dtype)[..., None]
        return (emb * mask).sum(axis=1) / (mask.sum(axis=1) + 1e-8)

    @staticmethod
    def _use_fused_pool(table) -> bool:
        """Route pooled array lookups through the Pallas fused kernel?

        Gated off (the default) unless NRT_PALLAS enables kernels; excluded
        under an explicit-collectives mesh (the kernel would bypass the
        shard_map lookup) and for bf16 tables (fp32 slab tiling)."""
        from ..ops import pallas_mode
        from ..parallel.sharded_embedding import active_mesh
        return (pallas_mode() != "off" and active_mesh() is None
                and table.dtype == jnp.float32)

    # -- batch-level contract ----------------------------------------------

    def _merged_lookups(self, batch, schema: FeatureSchema, unpooled):
        """Zero-masked embeddings for features sharing a PHYSICAL table,
        gathered with ONE ``jnp.take`` per table (concat flat ids -> take ->
        split): each TPU gather carries ~10 us fixed cost, so share-aliased
        features (``hist``+``item_id``) and arena members pay it once.

        Only plain-take lookups merge — skipped under an active
        explicit-collectives mesh (lookups go through shard_map) and for
        array features routed to the Pallas fused pool. Returns
        {feature: emb} for merged features; others fall through to
        :meth:`lookup`."""
        from ..parallel.sharded_embedding import active_mesh
        if active_mesh() is not None:
            return {}
        by_table: Dict[str, list] = {}
        for spec in schema.specs:
            if spec.kind == SPARSE or (
                    spec.kind == ARRAY
                    and (spec.name in unpooled
                         or not self._use_fused_pool(self._tables[spec.table]))):
                by_table.setdefault(spec.table, []).append(spec)
        out = {}
        for tname, specs in by_table.items():
            if len(specs) < 2:
                continue
            flat = [offset_ids(s, batch[s.name]).reshape(-1) for s in specs]
            if sum(x.shape[0] for x in flat) > GATHER_MERGE_MAX_SLOTS:
                continue
            joint = jnp.take(self._tables[tname], jnp.concatenate(flat),
                             axis=0).astype(jnp.float32)
            off = 0
            for s, ids in zip(specs, flat):
                n = ids.shape[0]
                emb = joint[off:off + n].reshape(
                    batch[s.name].shape + (joint.shape[-1],))
                mask_shape = ids.reshape(batch[s.name].shape)
                out[s.name] = emb * (mask_shape != 0).astype(emb.dtype)[..., None]
                off += n
        return out

    def embed_fields(self, batch: Dict[str, jnp.ndarray], schema: FeatureSchema,
                     unpooled=()):
        """Per-field embeddings in schema (sorted-name) order: list of (B, d_f).

        Dense features contribute their raw value as one column
        (``base_model.py:262-265``). Array features in ``unpooled`` return
        their raw (B, L, D) sequence instead of the masked mean (sequence
        models pool them themselves). Features sharing a physical table are
        gathered jointly (:meth:`_merged_lookups`).
        """
        merged = self._merged_lookups(batch, schema, unpooled)
        parts = []
        for spec in schema.specs:
            val = batch[spec.name]
            if spec.kind != DENSE:
                val = offset_ids(spec, val)
            if spec.kind == DENSE:
                parts.append(val.astype(jnp.float32)[:, None])
            elif spec.kind == SPARSE:
                if val.ndim != 1:
                    raise ValueError(
                        f"Sparse feature '{spec.name}' has {val.ndim}-D input "
                        f"{val.shape}; sequence features must be declared in "
                        "features.array_feature_names (with array_max_length).")
                parts.append(merged[spec.name] if spec.name in merged
                             else self.lookup(spec.table, val))
            elif spec.kind == ARRAY:
                emb = merged.get(spec.name)
                if spec.name in unpooled:
                    parts.append(emb if emb is not None
                                 else self.lookup(spec.table, val))  # (B, L, D)
                    continue
                mask = batch.get(f"{spec.name}_mask")
                if mask is None:
                    mask = (val != 0)
                table = self._tables[spec.table]
                if emb is None and self._use_fused_pool(table):
                    # Pallas fused gather+masked-mean (NRT_PALLAS gate):
                    # streams table rows HBM->VMEM and writes only the
                    # (B, D) pooled result — the (B, L, D) gathered
                    # embeddings never round-trip HBM. Exact math parity
                    # with lookup+pool (ops/fused_lookup_pool.py; padding
                    # id 0 carries zero value, weight, and grad).
                    from ..ops.fused_lookup_pool import fused_lookup_pool
                    parts.append(fused_lookup_pool(table, val, mask))
                    continue
                if emb is None:
                    emb = self.lookup(spec.table, val)
                parts.append(self.pool(emb, mask))
            else:
                raise ValueError(spec.kind)
        return parts

    def embed_batch(self, batch: Dict[str, jnp.ndarray], schema: FeatureSchema) -> jnp.ndarray:
        """Concat per-feature embeddings in schema (sorted-name) order.

        Returns (B, schema.total_dim) — the reference's
        ``get_embeddings_from_batch`` contract (``base_model.py:284-308``).
        """
        return jnp.concatenate(self.embed_fields(batch, schema), axis=1)


def make_collection(cfg: Config) -> EmbeddingCollection:
    return EmbeddingCollection.from_config(cfg)
