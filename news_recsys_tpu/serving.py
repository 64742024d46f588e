"""Retrieval serving path: corpus index + top-k recommendation.

The reference ships ``TopKSearcher`` as a standalone faiss serving primitive
(``TopKSearcher.py:7-83``) but never wires it into an end-to-end serving
flow. This module does: load trained DSSM params, encode the item corpus
once, then serve batched user -> top-k-news queries with per-user history
dedup, on either backend:

- ``backend="device"``: exact matmul + ``lax.top_k`` on the accelerator;
- ``backend="host"``: the threaded C++ searcher (no accelerator needed);
- ``backend="auto"``: device if one is available, else host.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from .config import Config
from .data.packed_dataset import Batch, PackedDataset, iterate_batches
from .models.dssm import DSSM, _l2
from .utils.logging import get_logger

logger = get_logger("serving")


class Recommender:
    def __init__(self, cfg: Config, model: DSSM, params, item_ds: PackedDataset,
                 backend: str = "auto", batch_size: int = 1024):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self._encode_user = jax.jit(partial(model.apply, method=DSSM.user_embedding))
        self._encode_item = jax.jit(partial(model.apply, method=DSSM.item_embedding))

        corpus = self._encode(item_ds, self._encode_item)
        corpus = np.asarray(_l2(jax.numpy.asarray(corpus)))
        self.item_ids = item_ds.arrays["item_id"].astype(np.int64)

        if backend == "auto":
            try:
                backend = "device" if jax.devices()[0].platform != "cpu" else "host"
            except Exception:
                backend = "host"
        self.backend = backend
        if backend == "host":
            from .native import HostTopKSearcher
            self.searcher = HostTopKSearcher(normalize=False)
        else:
            from .ops.topk import TopKSearcher
            self.searcher = TopKSearcher(normalize=False)
        self.searcher.update_embedding(corpus)
        logger.info(f"Recommender ready: {len(self.item_ids)} items, backend={self.backend}")

    def _encode(self, ds: PackedDataset, fn) -> np.ndarray:
        from .data.packed_dataset import encode_dataset
        return encode_dataset(self.params, ds, fn, self.batch_size)

    def recommend(self, user_batch: Batch, k: int = 10,
                  histories: Optional[Sequence[Sequence[int]]] = None
                  ) -> Tuple[List[List[int]], List[List[float]]]:
        """Top-k news ids per user row (history items excluded)."""
        users = PackedDataset({**user_batch})
        emb = self._encode(users, self._encode_user)
        emb = np.asarray(_l2(jax.numpy.asarray(emb)))
        max_hist = max((len(h) for h in histories), default=0) if histories else 0
        fetch = min(k + max_hist, len(self.item_ids))
        idx, scores = self.searcher.search(emb, fetch)
        rec_ids, rec_scores = [], []
        for row in range(len(emb)):
            hist = set(int(x) for x in histories[row]) if histories else set()
            ids_row, sc_row = [], []
            for j, i in enumerate(idx[row]):
                if i < 0:
                    continue
                item = int(self.item_ids[i])
                if item not in hist:
                    ids_row.append(item)
                    sc_row.append(float(scores[row][j]))
                if len(ids_row) >= k:
                    break
            rec_ids.append(ids_row)
            rec_scores.append(sc_row)
        return rec_ids, rec_scores
