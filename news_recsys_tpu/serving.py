"""Retrieval serving path: corpus index + top-k recommendation.

The reference ships ``TopKSearcher`` as a standalone faiss serving primitive
(``TopKSearcher.py:7-83``) but never wires it into an end-to-end serving
flow. This module does: load trained DSSM params, encode the item corpus
once, then serve batched user -> top-k-news queries with per-user history
dedup, on either backend:

- ``backend="device"``: exact matmul + ``lax.top_k`` on the accelerator;
- ``backend="host"``: the threaded C++ searcher (no accelerator needed);
- ``backend="auto"``: device if one is available, else host.

A trained Recommender persists as a single self-contained **bundle**
directory (:meth:`Recommender.save` / :meth:`Recommender.load`): config +
params + pre-encoded corpus (+ vocab maps when available), so a serving
process starts without the training artifacts or an item re-encode. A
dependency-free HTTP shim (:func:`serve_http`) exposes it as a JSON API.
"""

from __future__ import annotations

import json
import os
import shutil
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
import yaml

from .config import Config, config_from_dict, config_to_dict
from .data.packed_dataset import Batch, PackedDataset, iterate_batches
from .models.dssm import DSSM, _l2
from .utils.logging import get_logger

logger = get_logger("serving")

BUNDLE_FORMAT_VERSION = 1
_VOCAB_FILES = ("original_val_2_embedding_idx_dict.json",
                "embedding_idx_2_original_val_dict.json")


class Recommender:
    def __init__(self, cfg: Config, model: DSSM, params, item_ds: Optional[PackedDataset] = None,
                 backend: str = "auto", batch_size: int = 1024,
                 _corpus: Optional[np.ndarray] = None,
                 _item_ids: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self._encode_user = jax.jit(partial(model.apply, method=DSSM.user_embedding))
        self._encode_item = jax.jit(partial(model.apply, method=DSSM.item_embedding))

        if _corpus is not None:
            self.corpus = np.asarray(_corpus, np.float32)        # already L2-normed
            self.item_ids = np.asarray(_item_ids, np.int64)
        else:
            if item_ds is None:
                raise ValueError("Recommender needs item_ds (or a saved corpus)")
            corpus = self._encode(item_ds, self._encode_item)
            self.corpus = np.asarray(_l2(jax.numpy.asarray(corpus)))
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
        self.searcher.update_embedding(self.corpus)
        logger.info(f"Recommender ready: {len(self.item_ids)} items, backend={self.backend}")

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> str:
        """Persist as a self-contained bundle directory.

        Layout: ``config.yaml`` (full round-trippable config),
        ``params.msgpack`` (tower + embedding params), ``corpus.npz``
        (L2-normalized item embeddings + item ids), ``meta.json``, and
        ``vocab/*.json`` (raw-value <-> embedding-id maps, copied from the
        feature-extraction output when present, for request-side decoding
        via :class:`~news_recsys_tpu.utils.feature_id_mapper.FeatureIdMapper`).
        """
        from flax import serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.yaml"), "w") as f:
            yaml.safe_dump(config_to_dict(self.cfg), f, sort_keys=False)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(jax.device_get(self.params)))
        np.savez_compressed(os.path.join(path, "corpus.npz"),
                            corpus=self.corpus, item_ids=self.item_ids)
        fe_dir = os.path.join(self.cfg.paths.out_basedir, "extractored_feature")
        copied = []
        for fname in _VOCAB_FILES:
            src = os.path.join(fe_dir, fname)
            if os.path.exists(src):
                os.makedirs(os.path.join(path, "vocab"), exist_ok=True)
                shutil.copy(src, os.path.join(path, "vocab", fname))
                copied.append(fname)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"format_version": BUNDLE_FORMAT_VERSION,
                       "n_items": int(len(self.item_ids)),
                       "dim": int(self.corpus.shape[1]),
                       "vocab_files": copied}, f, indent=2)
        logger.info(f"Bundle saved -> {path}")
        return path

    @classmethod
    def load(cls, path: str, backend: str = "auto", batch_size: int = 1024) -> "Recommender":
        """Restore a bundle saved by :meth:`save`; no item re-encode."""
        from flax import serialization

        from .models.dssm import build_dssm

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if meta["format_version"] > BUNDLE_FORMAT_VERSION:
            raise ValueError(f"Bundle format {meta['format_version']} is newer "
                             f"than supported {BUNDLE_FORMAT_VERSION}")
        with open(os.path.join(path, "config.yaml")) as f:
            cfg = config_from_dict(yaml.safe_load(f))
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            params = serialization.msgpack_restore(f.read())
        with np.load(os.path.join(path, "corpus.npz")) as z:
            corpus, item_ids = z["corpus"], z["item_ids"]
        model = build_dssm(cfg)
        return cls(cfg, model, params, backend=backend, batch_size=batch_size,
                   _corpus=corpus, _item_ids=item_ids)

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


# ---------------------------------------------------------------------------
# HTTP shim — dependency-free JSON API over a loaded Recommender
# ---------------------------------------------------------------------------


def _user_batch_from_json(rec: Recommender, users: dict) -> Batch:
    """JSON feature lists -> typed arrays for the user tower schema."""
    schema = rec.model.user_schema
    batch: Batch = {}
    n = None
    for spec in schema.specs:
        if spec.name not in users:
            raise ValueError(f"missing user feature '{spec.name}' "
                             f"(required: {list(schema.names)})")
        vals = users[spec.name]
        arr = (np.asarray(vals, np.float32) if spec.kind == "dense"
               else np.asarray(vals, np.int32))
        if n is None:
            n = len(arr)
        elif len(arr) != n:
            raise ValueError(f"feature '{spec.name}' length {len(arr)} != {n}")
        batch[spec.name] = arr
    if n is None:
        raise ValueError("no user features supplied")
    batch["label"] = np.zeros((n, 1), np.float32)
    return batch


def make_http_handler(rec: Recommender):
    """Request handler class bound to ``rec``.

    - ``GET /healthz`` -> ``{"status": "ok", "items": N, "backend": ...}``
    - ``POST /recommend`` with body
      ``{"users": {<feature>: [..], ...}, "k": 10, "histories": [[..], ...]}``
      -> ``{"ids": [[..]], "scores": [[..]]}``
    """
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", "items": int(len(rec.item_ids)),
                                  "backend": rec.backend})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/recommend":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                batch = _user_batch_from_json(rec, req.get("users") or {})
                k = int(req.get("k", 10))
                if k <= 0:
                    raise ValueError(f"k must be positive, got {k}")
                histories = req.get("histories")
                ids, scores = rec.recommend(batch, k=k, histories=histories)
                self._reply(200, {"ids": ids, "scores": scores})
            except (ValueError, KeyError, TypeError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})

        def log_message(self, fmt, *args):  # route through our logger
            logger.info("http: " + fmt % args)

    return Handler


def serve_http(rec: Recommender, host: str = "127.0.0.1", port: int = 8321):
    """Serve ``rec`` over HTTP until interrupted. Returns the server object
    (callers in tests can run ``serve_forever`` on a thread and shut down)."""
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer((host, port), make_http_handler(rec))
    logger.info(f"Serving on http://{host}:{server.server_address[1]} "
                f"(POST /recommend, GET /healthz)")
    return server
