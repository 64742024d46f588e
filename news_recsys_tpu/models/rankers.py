"""Ranking model zoo: LR, Deep (DNN), Wide&Deep, FM, DCN v1/v2.

Functional parity with the reference's ``src/model/sort/*`` models, designed
as pure flax modules over the shared :class:`EmbeddingCollection`. Every
model returns **logits** ``(B,)``; sigmoid lives in the loss / inference
wrapper (numerically better than the reference's probability-space BCE,
mathematically identical).

Slicing contracts (explicit here, implicit in the reference):
- FM: per field, column 0 of the embedding is the first-order weight ``w``,
  columns 1..d the latent vector ``v`` (``fm/model.py:48-59``); second order
  via the ½[(Σv)² − Σv²] identity (``fm/model.py:18-26``).
- Wide&Deep: for wide features, column 0 is the wide (linear) part, columns
  1..d the deep part (``widedeep/model.py:53-69``).
- DCN v1 cross: ``x0 · (x_l^T w) + b + x_l`` (``dcn_arch.py:5-30``), with the
  rank-1 structure exploited: ``(x0 x_l^T) w == x0 * (x_l · w)`` — a dot and
  a broadcast instead of a BxDxD outer product, which is the TPU-friendly
  formulation (O(BD) memory instead of O(BD²)).
- DCN v2: ``x0 * Linear(x_l) + x_l`` (``dcn_arch.py:33-50``).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import Config, FeatureSchema, build_schema, table_specs
from .embedding import EmbeddingCollection
from .layers import MLP, Linear

DEFAULT_HIDDEN = (128, 128, 128, 64, 1)


class RankerBase(nn.Module):
    """Shared plumbing: embedding collection + rank-feature schema.

    Every ranker factors as ``__call__ = forward_from_fields(embed_fields)``;
    the sparse-embedding train step exploits this split to differentiate
    w.r.t. the per-field embeddings instead of the full tables
    (:mod:`news_recsys_tpu.training.sparse_step`).
    """

    tables: Tuple[Tuple[str, Tuple[int, int]], ...]
    schema: FeatureSchema

    # array features a subclass consumes as raw (B, L, D) sequences instead
    # of mean-pooled vectors (their masks travel via the ``masks`` argument)
    unpooled_arrays: Tuple[str, ...] = ()

    # mesh.param_dtype / mesh.compute_dtype from the config: large-table
    # storage dtype and tower matmul dtype ("float32" | "bfloat16").
    table_dtype: str = "float32"
    compute_dtype: str = "float32"
    # embeddings.init_scale: N(0, scale) table init (1.0 = torch default)
    emb_init_scale: float = 1.0

    @property
    def tower_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        self.embedder = EmbeddingCollection(tables=self.tables,
                                            table_dtype=self.table_dtype,
                                            init_scale=self.emb_init_scale)
        self._setup_tower()

    def _setup_tower(self):
        raise NotImplementedError

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        fields = self.embedder.embed_fields(batch, self.schema,
                                            unpooled=set(self.unpooled_arrays))
        masks = self._collect_masks(batch)
        return self.forward_from_fields(fields, masks)

    def _collect_masks(self, batch):
        masks = {}
        for name in self.unpooled_arrays:
            m = batch.get(f"{name}_mask")
            if m is None:
                m = (batch[name] != 0).astype(jnp.float32)
            masks[name] = m
        return masks

    def forward_from_fields(self, fields, masks=None) -> jnp.ndarray:
        raise NotImplementedError


class LRRanker(RankerBase):
    """Logistic regression via dim-1 embeddings: logit = Σ features.

    Reference: ``lr/model.py:17-27`` (score_fc = torch.sum over the concat).
    """

    def _setup_tower(self):
        pass

    def forward_from_fields(self, fields, masks=None):
        return jnp.sum(jnp.concatenate(fields, axis=1), axis=1)


class DeepRanker(RankerBase):
    """Concat embeddings -> MLP [128,128,128,64,1] (``deep/model.py:12-29``)."""

    hidden: Sequence[int] = DEFAULT_HIDDEN

    def _setup_tower(self):
        self.tower = MLP(dims=tuple(self.hidden), dtype=self.tower_dtype)

    def forward_from_fields(self, fields, masks=None):
        return self.tower(jnp.concatenate(fields, axis=1))[:, 0]


class WideDeepRanker(RankerBase):
    """Wide (sum of column-0 slices + bias) + Deep MLP (``widedeep/model.py``)."""

    wide_features: Tuple[str, ...] = ()
    hidden: Sequence[int] = DEFAULT_HIDDEN

    def _setup_tower(self):
        self.tower = MLP(dims=tuple(self.hidden), dtype=self.tower_dtype)
        self.bias = self.param("bias", nn.initializers.zeros, (1,))

    def forward_from_fields(self, fields, masks=None):
        wide_cols, deep_cols = [], []
        for spec, emb in zip(self.schema.specs, fields):
            if spec.name in self.wide_features:
                wide_cols.append(emb[:, 0:1])
                deep_cols.append(emb[:, 1:])
            else:
                deep_cols.append(emb)
        wide_out = jnp.sum(jnp.concatenate(wide_cols, axis=1), axis=1) + self.bias[0]
        deep_out = self.tower(jnp.concatenate(deep_cols, axis=1))[:, 0]
        return wide_out + deep_out


class FMRanker(RankerBase):
    """Factorization machine on column-sliced embeddings (``fm/model.py``)."""

    def _setup_tower(self):
        self.bias = self.param("bias", nn.initializers.zeros, (1,))

    def forward_from_fields(self, fields, masks=None):
        from ..ops.fm_kernel import fm_second_order

        dims = {e.shape[1] for e in fields}
        assert len(dims) == 1, "FM requires equal embedding dims across fields"
        w = jnp.concatenate([e[:, 0:1] for e in fields], axis=1)      # (B, nf)
        v = jnp.stack([e[:, 1:] for e in fields], axis=1)             # (B, nf, d-1)
        first = jnp.sum(w, axis=1)
        second = fm_second_order(v)
        return self.bias[0] + first + second


class DeepFMRanker(RankerBase):
    """DeepFM: FM first+second order PLUS a deep MLP tower over the same
    shared embeddings, summed into one logit (Guo et al. 2017).

    Named in the build target's config list ("DeepFM ranker: FM
    second-order pairwise kernel + deep tower"); the reference zoo ships FM
    and Deep separately (``src/model/sort/{fm,deep}``) — this combines them
    on the shared-embedding contract: the FM part slices column 0 / columns
    1.. exactly like :class:`FMRanker`, the deep part consumes the full
    concat like :class:`DeepRanker`.
    """

    hidden: Sequence[int] = DEFAULT_HIDDEN

    def _setup_tower(self):
        self.bias = self.param("bias", nn.initializers.zeros, (1,))
        self.tower = MLP(dims=tuple(self.hidden), dtype=self.tower_dtype)

    def forward_from_fields(self, fields, masks=None):
        from ..ops.fm_kernel import fm_second_order

        dims = {e.shape[1] for e in fields}
        assert len(dims) == 1, "DeepFM requires equal embedding dims across fields"
        w = jnp.concatenate([e[:, 0:1] for e in fields], axis=1)
        v = jnp.stack([e[:, 1:] for e in fields], axis=1)
        fm = jnp.sum(w, axis=1) + fm_second_order(v)
        deep = self.tower(jnp.concatenate(fields, axis=1))[:, 0]
        return self.bias[0] + fm + deep


class CrossNetV1(nn.Module):
    """Stacked DCN-v1 cross layers using the rank-1 identity (see module doc).

    Routed through :func:`news_recsys_tpu.ops.dcn_kernel.dcn_cross_stack`:
    XLA-fused chain by default (fastest in honest microbenchmarks at these
    dims), fused Pallas kernel with ``NRT_PALLAS=on``. Param layout matches
    the per-layer reference (w_i: (dim, 1), b_i: (dim,), ``dcn_arch.py:7-11``).
    """

    num_layers: int = 3

    @nn.compact
    def __call__(self, x0):
        from ..ops.dcn_kernel import dcn_cross_stack

        dim = x0.shape[-1]
        ws, bs = [], []
        for i in range(self.num_layers):
            ws.append(self.param(f"w_{i}", nn.initializers.xavier_uniform(), (dim, 1)))
            bs.append(self.param(f"b_{i}", nn.initializers.zeros, (dim,)))
        ws = jnp.stack([w[:, 0] for w in ws])    # (NL, D)
        bs = jnp.stack(bs)                       # (NL, D)
        return dcn_cross_stack(x0, ws, bs)


class CrossNetV2(nn.Module):
    """Stacked DCN-v2 cross layers with ReLU between (``dcn_arch.py:69-90``)."""

    num_layers: int = 3

    @nn.compact
    def __call__(self, x0):
        dim = x0.shape[-1]
        x = x0
        for _ in range(self.num_layers):
            x = x0 * Linear(dim)(x) + x
            x = nn.relu(x)
        return x


class DCNRanker(RankerBase):
    """Cross net + MLP over concat[x, cross(x)] (``dcn/model.py:16-29``)."""

    cross_layers: int = 3
    cross_version: int = 1
    hidden: Sequence[int] = DEFAULT_HIDDEN

    def _setup_tower(self):
        cls = CrossNetV1 if self.cross_version == 1 else CrossNetV2
        self.cross = cls(num_layers=self.cross_layers)
        self.tower = MLP(dims=tuple(self.hidden), dtype=self.tower_dtype)

    def forward_from_fields(self, fields, masks=None):
        x = jnp.concatenate(fields, axis=1)
        cross = self.cross(x)
        return self.tower(jnp.concatenate([x, cross], axis=1))[:, 0]


# ---------------------------------------------------------------------------
# Registry / constructors
# ---------------------------------------------------------------------------


def build_ranker(cfg: Config, name: str | None = None) -> RankerBase:
    """Construct a ranker by name with config-driven schema and tables."""
    name = name or cfg.name
    tables = tuple(sorted(table_specs(cfg).items()))
    schema = build_schema(cfg)
    dtypes = dict(table_dtype=cfg.mesh.param_dtype,
                  compute_dtype=cfg.mesh.compute_dtype,
                  emb_init_scale=cfg.embeddings.init_scale)
    if name == "lr":
        return LRRanker(tables=tables, schema=schema, **dtypes)
    if name == "deep":
        return DeepRanker(tables=tables, schema=schema, **dtypes)
    if name == "widedeep":
        wd = cfg.extra("wide_and_deep_cfg", {}) or {}
        wide = tuple(wd.get("wide_feature_names", ()))
        matching = [f for f in wide if f in schema]
        if not matching:
            raise ValueError(
                "widedeep requires wide_and_deep_cfg.wide_feature_names with at "
                f"least one feature from the rank schema {schema.names}; got {wide!r}"
            )
        return WideDeepRanker(tables=tables, schema=schema, wide_features=wide, **dtypes)
    if name == "fm":
        return FMRanker(tables=tables, schema=schema, **dtypes)
    if name == "deepfm":
        return DeepFMRanker(tables=tables, schema=schema, **dtypes)
    if name == "dcn":
        dcn = cfg.extra("dcn_cfg", {}) or {}
        return DCNRanker(
            tables=tables,
            schema=schema,
            cross_layers=int(dcn.get("num_layers", 3)),
            cross_version=int(dcn.get("version", 1)),
            **dtypes,
        )
    if name == "attention":
        from .seq_ranker import build_attention_ranker
        return build_attention_ranker(cfg)
    raise ValueError(f"Unknown ranker: {name!r}")


RANKER_NAMES = ("lr", "deep", "widedeep", "fm", "deepfm", "dcn", "attention")
