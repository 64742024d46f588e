"""DSSM two-tower, ANN top-k, and ItemCF tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.models.dssm import (build_dssm, dssm_train_loss,
                                         info_nce_loss, sample_in_batch_negatives,
                                         triplet_loss)
from news_recsys_tpu.models.itemcf import ItemCF
from news_recsys_tpu.ops.topk import TopKSearcher
from news_recsys_tpu.training.retrieval import DSSMTrainer, evaluate_retrieval

FEATS = ["user_id", "item_id", "category"]


def make_cfg(batch_size=64):
    return config_from_dict({
        "name": "dssm",
        "features": {
            "sparse_feature_names": FEATS,
            "item_feature_names": ["item_id", "category"],
            "user_feature_names": ["user_id"],
        },
        "embeddings": {
            "embedding_size": {k: 16 for k in FEATS},
            "embedding_table_size": {"user_id": 64, "item_id": 128, "category": 8},
        },
        "dataset": {"batch_size": batch_size},
        "train_hparams": {"max_epoch": 2, "lr": 5e-3, "min_lr": 1e-3,
                          "lr_milestones": [600, 1200], "max_step": 10000},
    })


def synthetic_pairs(rng, n=512, n_users=48, n_items=96, n_cats=6, item_cat=None):
    """Block structure: user u clicks items with category == u % n_cats."""
    if item_cat is None:
        item_cat = rng.integers(1, n_cats + 1, n_items + 1)
    users = rng.integers(1, n_users + 1, n)
    items = np.zeros(n, dtype=np.int64)
    labels = np.zeros(n, dtype=np.float32)
    for i in range(n):
        fav = (users[i] % n_cats) + 1
        if rng.random() < 0.7:
            matching = np.flatnonzero(item_cat[1:] == fav) + 1
            items[i] = rng.choice(matching) if len(matching) else rng.integers(1, n_items + 1)
            labels[i] = 1.0
        else:
            items[i] = rng.integers(1, n_items + 1)
            labels[i] = float(item_cat[items[i]] == fav)
    return {
        "user_id": users.astype(np.int32),
        "item_id": items.astype(np.int32),
        "category": item_cat[items].astype(np.int32),
        "label": labels.reshape(-1, 1),
    }, item_cat


def test_topk_searcher_exact():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((500, 16)).astype(np.float32)
    queries = rng.standard_normal((32, 16)).astype(np.float32)
    s = TopKSearcher(normalize=False)
    s.update_embedding(corpus)
    idx, scores = s.search(queries, k=5)
    ref = queries @ corpus.T
    ref_idx = np.argsort(-ref, axis=1)[:, :5]
    ref_scores = np.take_along_axis(ref, ref_idx, axis=1)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5)
    # indices can permute within equal scores; compare scores only + set
    for r in range(32):
        assert set(idx[r]) == set(ref_idx[r])


def test_in_batch_negatives_shape_and_source():
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    neg = sample_in_batch_negatives(jax.random.PRNGKey(0), emb, rate=3)
    assert neg.shape == (32, 3, 16)
    flat = np.asarray(neg).reshape(-1, 16)
    src = np.asarray(emb)
    for row in flat[:10]:
        assert np.any(np.all(np.isclose(src, row, atol=1e-6), axis=1))


def test_losses_finite_and_ordered():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    aligned = u  # perfect positives
    neg = jnp.asarray(rng.standard_normal((16, 3, 8)), jnp.float32)
    good = float(info_nce_loss(u, aligned, neg))
    bad = float(info_nce_loss(u, -aligned, neg))
    assert good < bad
    assert np.isfinite(float(triplet_loss(u, aligned, neg)))


def test_dssm_end_to_end_retrieval(tmp_path):
    cfg = make_cfg()
    rng = np.random.default_rng(3)
    train_arrays, item_cat = synthetic_pairs(rng, n=2048)
    train = PackedDataset(train_arrays)

    model = build_dssm(cfg)
    trainer = DSSMTrainer(cfg, model, workdir=str(tmp_path))
    state = trainer.fit(train, max_epochs=25)

    # item corpus: every item once
    n_items = 96
    item_ds = PackedDataset({
        "item_id": np.arange(1, n_items + 1, dtype=np.int32),
        "category": item_cat[1 : n_items + 1].astype(np.int32),
        "label": np.full((n_items, 1), -1, np.float32),
    })
    # queries: fresh positive pairs
    q_arrays, _ = synthetic_pairs(np.random.default_rng(4), n=256, item_cat=item_cat)
    pos = q_arrays["label"][:, 0] == 1
    query = PackedDataset({k: v[pos] for k, v in q_arrays.items()})
    res = evaluate_retrieval(
        trainer, state.params, item_ds, query,
        target_item_ids=query.arrays["item_id"],
        histories=[[] for _ in range(len(query))], k=20,
    )
    # ~16 matching items per category out of 96; random HR@20 ~ 0.21.
    assert res["HR@20"] > 0.4, res


def test_itemcf():
    # users cluster into two item groups
    interactions = {}
    for u in range(20):
        group = [1, 2, 3, 4] if u % 2 == 0 else [10, 11, 12, 13]
        interactions[u] = group[: 3 + (u % 2)]
    cf = ItemCF().fit(interactions)
    rec = cf.recall([1, 2], k=2)
    assert set(rec) <= {3, 4}
    hr = cf.hit_rate([([1, 2], 3), ([10, 11], 12)], k=3)
    assert hr == 1.0


@pytest.mark.parametrize("opt", ["sparse_adamw", "rowwise_adagrad"])
def test_dssm_sparse_optimizers(tmp_path, opt):
    """DSSM with rowwise embedding optimizers (large tables) retrieves the
    planted block structure comparably to dense AdamW."""
    raw = {
        "name": "dssm",
        "features": {
            "sparse_feature_names": FEATS,
            "item_feature_names": ["item_id", "category"],
            "user_feature_names": ["user_id"],
        },
        "embeddings": {
            # >= 4096 so user/item take the rowwise path
            "embedding_size": {k: 16 for k in FEATS},
            "embedding_table_size": {"user_id": 5000, "item_id": 5000, "category": 8},
        },
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 2, "lr": 5e-3, "min_lr": 1e-3,
                          "lr_milestones": [600, 1200], "max_step": 10000,
                          "embedding_optimizer": opt},
    }
    cfg = config_from_dict(raw)
    rng = np.random.default_rng(7)
    arrays, item_cat = synthetic_pairs(rng, n=2048)
    model = build_dssm(cfg)
    trainer = DSSMTrainer(cfg, model, workdir=str(tmp_path))
    state = trainer.fit(PackedDataset(arrays), max_epochs=10)
    from news_recsys_tpu.training.sparse_step import SparseTrainState
    assert isinstance(state, SparseTrainState)
    if opt == "rowwise_adagrad":
        assert state.emb_mu["user_id"].ndim == 1

    n_items = 96
    item_ds = PackedDataset({
        "item_id": np.arange(1, n_items + 1, dtype=np.int32),
        "category": item_cat[1: n_items + 1].astype(np.int32),
        "label": np.full((n_items, 1), -1, np.float32),
    })
    q_arrays, _ = synthetic_pairs(rng, n=256, item_cat=item_cat)
    pos = q_arrays["label"][:, 0] == 1
    query = PackedDataset({k: v[pos] for k, v in q_arrays.items()})
    res = evaluate_retrieval(trainer, state.params, item_ds, query,
                             target_item_ids=query.arrays["item_id"],
                             histories=[[] for _ in range(int(pos.sum()))], k=10)
    # block structure: matching-category items cluster; HR@10 far above the
    # 10/96 random baseline
    assert res["HR@10"] > 0.3, res


def _item_query(rng, item_cat, n_items=96):
    item_ds = PackedDataset({
        "item_id": np.arange(1, n_items + 1, dtype=np.int32),
        "category": item_cat[1: n_items + 1].astype(np.int32),
        "label": np.full((n_items, 1), -1, np.float32),
    })
    q_arrays, _ = synthetic_pairs(rng, n=256, item_cat=item_cat)
    pos = q_arrays["label"][:, 0] == 1
    query = PackedDataset({k: v[pos] for k, v in q_arrays.items()})
    return item_ds, query


@pytest.mark.parametrize("opt", ["adamw", "rowwise_adagrad"])
def test_dssm_mesh_matches_single_device(tmp_path, opt):
    """DSSM training on an 8-device DP mesh (and a 4x2 dp x tp mesh for the
    sparse path) must match single-device numerics."""
    import dataclasses
    from news_recsys_tpu.parallel.mesh import make_mesh

    cfg = make_cfg()
    if opt != "adamw":
        cfg = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
            cfg.train_hparams, embedding_optimizer=opt))
        cfg = dataclasses.replace(cfg, embeddings=dataclasses.replace(
            cfg.embeddings,
            embedding_table_size={"user_id": 5000, "item_id": 5000, "category": 8}))
    rng = np.random.default_rng(3)
    arrays, item_cat = synthetic_pairs(
        rng, n=1024, n_users=48 if opt == "adamw" else 1024,
        n_items=96 if opt == "adamw" else 2048)
    train = PackedDataset(arrays)
    model = build_dssm(cfg)

    t_single = DSSMTrainer(cfg, model, workdir=str(tmp_path / "s"), use_mesh=False)
    s_single = t_single.fit(train, max_epochs=2)

    mesh = make_mesh(data=8, model=1) if opt == "adamw" else make_mesh(data=4, model=2)
    t_mesh = DSSMTrainer(cfg, model, workdir=str(tmp_path / "m"), mesh=mesh)
    s_mesh = t_mesh.fit(train, max_epochs=2)

    u1 = t_single.encode_users(s_single.params, train)
    u2 = t_mesh.encode_users(s_mesh.params, train)
    np.testing.assert_allclose(u1, u2, atol=2e-4)
    i1 = t_single.encode_item_corpus(s_single.params, train)
    i2 = t_mesh.encode_item_corpus(s_mesh.params, train)
    np.testing.assert_allclose(i1, i2, atol=2e-4)


def test_dssm_per_epoch_eval_and_log(tmp_path):
    """fit(dev_ds=...) runs retrieval eval each epoch, writes parseable
    val_log.log blocks and metrics.jsonl scalars."""
    import json
    import os
    from news_recsys_tpu.utils.log_analysis import best_epoch, format_best_epoch, parse_log

    cfg = make_cfg()
    rng = np.random.default_rng(5)
    arrays, item_cat = synthetic_pairs(rng, n=1024)
    train = PackedDataset(arrays)
    item_ds, query = _item_query(np.random.default_rng(6), item_cat)

    model = build_dssm(cfg)
    trainer = DSSMTrainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    trainer.set_eval_data(item_ds, histories=None, k=10)
    trainer.fit(train, dev_ds=query, max_epochs=3)

    epochs = parse_log(trainer.val_log_path)
    assert len(epochs) == 3
    assert all("Retrieval" in e["data"] for e in epochs)
    assert all(0.0 <= e["data"]["Retrieval"]["HR@10"] <= 1.0 for e in epochs)
    best = best_epoch(epochs)
    assert best is not None
    report = format_best_epoch(epochs, "dssm")
    assert "HR@10" in report and "Best Epoch" in report

    scalars = [json.loads(l) for l in open(os.path.join(trainer.log_dir, "metrics.jsonl"))]
    assert any("val_hr_at_10" in s for s in scalars)
    assert os.path.exists(os.path.join(trainer.log_dir, "model_info.log"))


def test_dssm_orbax_resume_exact(tmp_path):
    """Interrupt DSSM training mid-run, fit(resume=True): same encodings as
    uninterrupted (incl. identical fold_in-derived negatives)."""
    import dataclasses
    cfg = make_cfg()
    cfg = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
        cfg.train_hparams, ckpt_every_steps=8))
    rng = np.random.default_rng(9)
    arrays, _ = synthetic_pairs(rng, n=1024)  # 16 steps/epoch at bs=64
    train = PackedDataset(arrays)
    model = build_dssm(cfg)

    t_ref = DSSMTrainer(cfg, model, workdir=str(tmp_path / "ref"), use_mesh=False)
    s_ref = t_ref.fit(train, max_epochs=2)

    cfg_cap = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
        cfg.train_hparams, ckpt_every_steps=8, max_step=24))
    t_a = DSSMTrainer(cfg_cap, model, workdir=str(tmp_path / "a"), use_mesh=False)
    t_a.fit(train, max_epochs=2)   # stops at step 24 (mid epoch 1), ckpt at 24
    assert t_a.global_step == 24

    t_b = DSSMTrainer(cfg, model, workdir=str(tmp_path / "b"), use_mesh=False)
    t_b.ckpt_dir = t_a.ckpt_dir
    s_b = t_b.fit(train, max_epochs=2, resume=True)
    assert t_b.global_step == 32
    np.testing.assert_allclose(t_ref.encode_users(s_ref.params, train),
                               t_b.encode_users(s_b.params, train), atol=1e-5)


def test_dedup_hit_rate_matches_naive():
    """Vectorized history-dedup HR equals the per-row reference loop."""
    from news_recsys_tpu.training.retrieval import dedup_hit_rate

    rng = np.random.default_rng(11)
    q, fetch, k = 64, 20, 5
    retrieved = np.stack([rng.choice(200, fetch, replace=False) for _ in range(q)])
    targets = rng.integers(0, 200, q)
    histories = [list(rng.choice(200, rng.integers(0, 10), replace=False))
                 for _ in range(q)]

    hits = 0
    for row in range(q):
        hist = set(int(x) for x in histories[row])
        kept = [int(i) for i in retrieved[row] if int(i) not in hist][:k]
        if int(targets[row]) in kept:
            hits += 1
    naive = hits / q
    fast = dedup_hit_rate(retrieved.astype(np.int64), targets, histories, k)
    assert abs(fast - naive) < 1e-12


def test_itemcf_fit_pairs_matches_naive():
    """Chunked pair-key counting + CSR prune reproduces the dict-of-dict
    reference similarity (itemCF_base.py:18-40) on random interactions."""
    from collections import defaultdict

    rng = np.random.default_rng(0)
    uids, items = [], []
    for u in range(200):
        for it in rng.integers(0, 120, size=rng.integers(1, 25)):
            uids.append(u)
            items.append(int(it))
    uids, items = np.array(uids), np.array(items)
    cf = ItemCF(max_history=15, max_neighbors=40, pair_chunk=1000).fit_pairs(uids, items)

    # naive: last-occurrence dedup, keep most recent 15, count pairs
    lists = defaultdict(list)
    for u, it in zip(uids.tolist(), items.tolist()):
        lists[u].append(it)
    cnt, co = defaultdict(int), defaultdict(int)
    for u, lst in lists.items():
        seen = {}
        for idx, it in enumerate(lst):
            seen[it] = idx
        ordered = sorted(seen, key=lambda x: seen[x])[-15:]
        for it in ordered:
            cnt[it] += 1
        for i in ordered:
            for j in ordered:
                if i != j:
                    co[(i, j)] += 1
    sim = defaultdict(dict)
    for (i, j), c in co.items():
        sim[i][j] = c / np.sqrt(cnt[i] * cnt[j])

    ids = cf._item_ids
    for idx in rng.choice(ids.size, 25, replace=False):
        i = int(ids[idx])
        s, e = cf._indptr[idx], cf._indptr[idx + 1]
        mine = sorted(float(w) for w in cf._wgt[s:e])
        ref = sorted(sorted(sim[i].values(), reverse=True)[:40])
        assert len(mine) == len(ref)
        assert np.allclose(mine, ref, atol=1e-5)


def test_itemcf_recall_batch_and_hit_rate():
    rng = np.random.default_rng(3)
    interactions = {u: ([1, 2, 3, 4] if u % 2 == 0 else [10, 11, 12, 13])[: 3 + u % 2]
                    for u in range(20)}
    cf = ItemCF().fit(interactions)
    topk = cf.recall_batch([[1, 2], [10, 11], [999]], k=3)
    assert set(topk[0][topk[0] >= 0].tolist()) <= {3, 4}
    assert set(topk[1][topk[1] >= 0].tolist()) <= {12, 13}
    assert (topk[2] == -1).all()  # unknown-history query pads with -1
    assert cf.hit_rate([([1, 2], 3), ([10, 11], 12)], k=3) == 1.0


def test_interactions_from_behaviors_vectorized():
    import pandas as pd

    from news_recsys_tpu.models.itemcf import interactions_from_behaviors

    df = pd.DataFrame({
        "impression_id": [1, 2, 3, 4],
        "user_id": [7, 7, 8, 8],
        "time": ["a", "b", "c", "d"],
        "history": ["1 2", "1 2 3", "", "5"],
        "item_id": [9, 4, 6, 5],
        "label": [0, 1, 1, 0],
    })
    u, i = interactions_from_behaviors(df)
    assert list(zip(u.tolist(), i.tolist())) == [
        (7, 1), (7, 2), (7, 3), (7, 4), (8, 5), (8, 6)]


def _hist_cfg(with_hist: bool, n_users=400, n_items=96, batch_size=64):
    feats = ["user_id", "item_id", "category"]
    features = {
        "sparse_feature_names": feats,
        "item_feature_names": ["item_id", "category"],
        "user_feature_names": ["user_id"] + (["hist"] if with_hist else []),
    }
    if with_hist:
        features["array_feature_names"] = ["hist"]
        features["array_max_length"] = {"hist": 6}
    emb = {
        "embedding_size": {k: 16 for k in feats},
        "embedding_table_size": {"user_id": n_users + 1, "item_id": n_items + 32,
                                 "category": 8},
    }
    if with_hist:
        emb["share_emb_table_features"] = {"hist": "item_id"}
    return config_from_dict({
        "name": "dssm",
        "features": features,
        "embeddings": emb,
        "dataset": {"batch_size": batch_size},
        "train_hparams": {"max_epoch": 2, "lr": 5e-3, "min_lr": 1e-3,
                          "lr_milestones": [600, 1200], "max_step": 10000},
    })


def _hist_pairs(rng, n, item_cat, n_users=400, n_cats=6, L=6, user_base=0):
    """Cold-start users: query users are DISJOINT from train users
    (``user_base`` offsets the id range), so the user_id embedding is
    untrained noise at eval time — only the click history (items of the
    favorite category) carries the signal."""
    n_items = len(item_cat) - 1
    users = rng.integers(1, n_users + 1, n) + user_base
    fav = (users % n_cats) + 1
    items = np.zeros(n, np.int64)
    labels = np.ones(n, np.float32)
    hist = np.zeros((n, L), np.int32)
    for i in range(n):
        matching = np.flatnonzero(item_cat[1:] == fav[i]) + 1
        items[i] = rng.choice(matching)
        hist[i] = rng.choice(matching, L)
    return {
        "user_id": users.astype(np.int32),
        "item_id": items.astype(np.int32),
        "category": item_cat[items].astype(np.int32),
        "hist": hist,
        "hist_mask": np.ones((n, L), np.float32),
        "label": labels.reshape(-1, 1),
    }


def test_dssm_history_tower_lifts_hr(tmp_path):
    """VERDICT r1 #9: history sequence in the DSSM user tower (pooled over
    the shared item table) must measurably lift retrieval HR over the
    id-only tower on cold users."""
    n_items, n_users = 96, 400
    rng = np.random.default_rng(7)
    item_cat = rng.integers(1, 7, n_items + 1)
    train_arrays = _hist_pairs(rng, 2048, item_cat, n_users=n_users)
    q_arrays = _hist_pairs(np.random.default_rng(8), 256, item_cat,
                           n_users=n_users, user_base=n_users)

    item_ds = PackedDataset({
        "item_id": np.arange(1, n_items + 1, dtype=np.int32),
        "category": item_cat[1: n_items + 1].astype(np.int32),
        "label": np.full((n_items, 1), -1, np.float32),
    })

    hrs = {}
    for with_hist in (False, True):
        cfg = _hist_cfg(with_hist, n_users=2 * n_users, n_items=n_items)
        keep = set(cfg.features.user_feature_names) | set(
            cfg.features.item_feature_names) | {"label"}
        if with_hist:
            keep.add("hist_mask")
        train = PackedDataset({k: v for k, v in train_arrays.items() if k in keep})
        query = PackedDataset({k: v for k, v in q_arrays.items() if k in keep})
        model = build_dssm(cfg)
        trainer = DSSMTrainer(cfg, model, workdir=str(tmp_path / f"h{with_hist}"))
        state = trainer.fit(train, max_epochs=12)
        res = evaluate_retrieval(
            trainer, state.params, item_ds, query,
            target_item_ids=query.arrays["item_id"],
            histories=[[] for _ in range(len(query))], k=20)
        hrs[with_hist] = res["HR@20"]
    # ~16 matching items/category of 96; random HR@20 ~= 0.21
    assert hrs[True] > hrs[False] + 0.1, hrs
    assert hrs[True] > 0.5, hrs

def test_dssm_hist_sparse_optimizer(tmp_path):
    """History arrays flow through the rowwise-optimizer DSSM step (row
    gradients reach the shared item table via the pooled hist field)."""
    from news_recsys_tpu.training.sparse_step import SparseTrainState
    n_users, n_items = 400, 96
    rng = np.random.default_rng(9)
    item_cat = rng.integers(1, 7, n_items + 1)
    arrays = _hist_pairs(rng, 512, item_cat, n_users=n_users)
    raw = _hist_cfg(True, n_users=4999, n_items=4968)  # tables >= 4096: rowwise path
    import dataclasses
    hp = dataclasses.replace(raw.train_hparams, embedding_optimizer="rowwise_adagrad")
    cfg = dataclasses.replace(raw, train_hparams=hp)
    model = build_dssm(cfg)
    trainer = DSSMTrainer(cfg, model, workdir=str(tmp_path))
    state = trainer.fit(PackedDataset(arrays), max_epochs=2)
    assert isinstance(state, SparseTrainState)
    # the shared item table is rowwise-updated and saw hist gradients
    assert "item_id" in state.emb_mu and state.emb_mu["item_id"].ndim == 1
    assert float(np.abs(np.asarray(state.emb_mu["item_id"]) - 0.1).max()) > 0
