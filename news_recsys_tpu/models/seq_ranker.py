"""Attention-based sequence ranker over the user's click history.

New model family beyond the reference's zoo: the reference ships
``MultiHeadSelfAttention`` / ``TransformerBlock`` utilities but no model
uses them (``utils.py:20-61``; "generative recommendation" is a stated TODO
in its ``documents/TODO.md:5``). This ranker puts them to work, DIN/SASRec
style:

1. the ``hist`` array feature (padded item-id sequence, table shared with
   ``item_id``) is embedded WITHOUT mean-pooling;
2. masked Transformer blocks contextualize the sequence;
3. target-aware attention pools it: weights = softmax over history of
   (h_l . e_target)/sqrt(D), masked to real entries;
4. the pooled history vector joins the usual sorted-name field concat and
   feeds the standard MLP tower.

All static shapes; the (B, L, D) sequence work is one fused attention stack
on the MXU.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config, FeatureSchema, build_schema, table_specs
from .embedding import EmbeddingCollection
from .layers import MLP, TransformerBlock
from .rankers import DEFAULT_HIDDEN


class AttentionSeqRanker(nn.Module):
    tables: Tuple[Tuple[str, Tuple[int, int]], ...]
    schema: FeatureSchema              # rank features EXCLUDING the sequence
    hist_feature: str = "hist"
    hist_table: str = "item_id"
    num_layers: int = 1
    num_heads: int = 2
    ff_dim: int = 64
    hidden: Sequence[int] = DEFAULT_HIDDEN

    def setup(self):
        self.embedder = EmbeddingCollection(tables=self.tables)
        dim = dict(self.tables)[self.hist_table][1]
        self.blocks = [
            TransformerBlock(embed_dim=dim, num_heads=self.num_heads, ff_dim=self.ff_dim)
            for _ in range(self.num_layers)
        ]
        self.tower = MLP(dims=tuple(self.hidden))

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        fields = self.embedder.embed_fields(batch, self.schema)

        hist_ids = batch[self.hist_feature]                       # (B, L)
        mask = batch.get(f"{self.hist_feature}_mask")
        if mask is None:
            mask = (hist_ids != 0).astype(jnp.float32)
        h = self.embedder.lookup(self.hist_table, hist_ids)       # (B, L, D)
        for blk in self.blocks:
            h = blk(h, mask)

        # target-aware attention pooling
        target = self.embedder.lookup(self.hist_table, batch["item_id"])  # (B, D)
        scores = jnp.einsum("bld,bd->bl", h, target) / jnp.sqrt(
            jnp.asarray(h.shape[-1], jnp.float32))
        scores = jnp.where(mask > 0, scores, -1e9)
        alpha = jax.nn.softmax(scores, axis=-1)
        # rows with empty history: all -1e9 -> uniform alpha; zero them out
        alpha = alpha * (mask.sum(axis=1, keepdims=True) > 0)
        seq_vec = jnp.einsum("bl,bld->bd", alpha, h)

        x = jnp.concatenate(fields + [seq_vec], axis=1)
        return self.tower(x)[:, 0]


def build_attention_ranker(cfg: Config) -> AttentionSeqRanker:
    acfg = cfg.extra("attention_cfg", {}) or {}
    hist_feature = acfg.get("hist_feature", "hist")
    tables = tuple(sorted(table_specs(cfg).items()))
    f = cfg.features
    rank_names = sorted((set(f.user_feature_names) | set(f.item_feature_names)) - {hist_feature})
    hist_table = cfg.embeddings.share_emb_table_features.get(hist_feature, hist_feature)
    return AttentionSeqRanker(
        tables=tables,
        schema=build_schema(cfg, rank_names),
        hist_feature=hist_feature,
        hist_table=hist_table,
        num_layers=int(acfg.get("num_layers", 1)),
        num_heads=int(acfg.get("num_heads", 2)),
        ff_dim=int(acfg.get("ff_dim", 64)),
    )
