"""Leave-one-out history augmentation for DSSM retrieval training."""

import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.data.hist_pairs import (concat_datasets,
                                             hist_augmented_pairs,
                                             positives_only)
from news_recsys_tpu.data.packed_dataset import PackedDataset


def make_cfg(**extras):
    return config_from_dict({
        "name": "dssm",
        "features": {"sparse_feature_names": ["user_id", "item_id", "category"],
                     "array_feature_names": ["hist"],
                     "item_feature_names": ["item_id", "category"],
                     "user_feature_names": ["user_id", "hist"],
                     "array_max_length": {"hist": 5}},
        "embeddings": {"embedding_size": {"user_id": 8, "item_id": 8, "category": 8},
                       "embedding_table_size": {"user_id": 100, "item_id": 50,
                                                "category": 10},
                       "share_emb_table_features": {"hist": "item_id"}},
        "dataset": {"batch_size": 16},
        "train_hparams": {"max_epoch": 1, "lr": 1e-2, "min_lr": 1e-3,
                          "lr_milestones": [100, 200], "max_step": 10**6},
        **extras,
    })


def make_data():
    # user 1: two rows, longer hist [3,4,5] on the second; user 2: hist [7,8];
    # user 3: single-entry hist (skipped); user 4: empty hist (skipped)
    train = PackedDataset({
        "user_id": np.array([1, 1, 2, 3, 4], np.int32),
        "item_id": np.array([10, 11, 12, 13, 14], np.int32),
        "category": np.array([1, 2, 3, 4, 5], np.int32),
        "hist": np.array([[3, 4, 0, 0, 0],
                          [3, 4, 5, 0, 0],
                          [7, 8, 0, 0, 0],
                          [9, 0, 0, 0, 0],
                          [0, 0, 0, 0, 0]], np.int32),
        "hist_mask": np.array([[1, 1, 0, 0, 0],
                               [1, 1, 1, 0, 0],
                               [1, 1, 0, 0, 0],
                               [1, 0, 0, 0, 0],
                               [0, 0, 0, 0, 0]], np.float32),
        "label": np.array([[1], [0], [1], [1], [0]], np.float32),
    })
    item_ids = np.arange(1, 50, dtype=np.int32)
    items = PackedDataset({
        "item_id": item_ids,
        "category": (item_ids % 9 + 1).astype(np.int32),
        "label": np.zeros((49, 1), np.float32),
    })
    return train, items


def test_leave_one_out_semantics():
    cfg = make_cfg()
    train, items = make_data()
    aug = hist_augmented_pairs(cfg, train, items)
    # user 1 contributes 3 pairs (longest row), user 2 contributes 2
    assert len(aug) == 5
    a = aug.arrays
    assert np.all(a["label"] == 1.0)
    for i in range(len(aug)):
        tgt = a["item_id"][i]
        row_hist = a["hist"][i]
        # target held OUT of the input history
        assert tgt not in row_hist
        # item features joined from the corpus
        assert a["category"][i] == tgt % 9 + 1
        # mask consistent with ids
        np.testing.assert_array_equal(a["hist_mask"][i], (row_hist != 0))
    # user 1's pairs use the LONGEST hist [3,4,5]: targets are exactly 3,4,5
    u1 = a["item_id"][a["user_id"] == 1]
    assert sorted(u1.tolist()) == [3, 4, 5]
    u2 = a["item_id"][a["user_id"] == 2]
    assert sorted(u2.tolist()) == [7, 8]
    # fixed hist width preserved
    assert a["hist"].shape[1] == train.arrays["hist"].shape[1]


def test_positives_only_and_concat():
    train, items = make_data()
    pos = positives_only(train)
    assert len(pos) == 3 and np.all(pos.arrays["label"] == 1)
    cfg = make_cfg()
    aug = hist_augmented_pairs(cfg, train, items)
    both = concat_datasets(pos, aug)
    assert len(both) == len(pos) + len(aug)
    assert set(both.arrays) == set(train.arrays)


def test_out_of_corpus_targets_dropped():
    cfg = make_cfg()
    train, items = make_data()
    # user 2's hist entry 8 missing from the corpus -> its pair dropped,
    # but 8 still appears in OTHER pairs' input histories
    items2 = PackedDataset({k: v[items.arrays["item_id"] != 8]
                            for k, v in items.arrays.items()})
    aug = hist_augmented_pairs(cfg, train, items2)
    assert len(aug) == 4
    assert 8 not in aug.arrays["item_id"]


def test_augmented_training_lifts_retrieval(tmp_path):
    """End-to-end: on clustered synthetic data, history-augmented DSSM
    training beats click-only training on HR@10 (the co-click signal is in
    histories, clicks are sparse)."""
    import dataclasses

    from news_recsys_tpu.models.dssm import build_dssm
    from news_recsys_tpu.training.retrieval import DSSMTrainer, evaluate_retrieval

    rng = np.random.default_rng(0)
    n_users, n_items, n_clusters = 300, 200, 8
    item_cluster = rng.integers(0, n_clusters, n_items + 1)
    user_cluster = rng.integers(0, n_clusters, n_users + 1)

    def sample_items(u, k):
        # 80% in-cluster
        incl = np.flatnonzero(item_cluster[1:] == user_cluster[u]) + 1
        out = rng.integers(1, n_items + 1, k)
        pick = rng.random(k) < 0.8
        ins = rng.choice(incl, k) if incl.size else out
        return np.where(pick, ins, out).astype(np.int32)

    L = 8
    rows = []
    for u in range(1, n_users + 1):
        h = sample_items(u, L)
        tgt = sample_items(u, 1)[0]
        rows.append((u, tgt, h))
    uids = np.array([r[0] for r in rows], np.int32)
    tgts = np.array([r[1] for r in rows], np.int32)
    hists = np.stack([r[2] for r in rows])
    train = PackedDataset({
        "user_id": uids, "item_id": tgts,
        "category": (item_cluster[tgts] + 1).astype(np.int32),
        "hist": hists, "hist_mask": np.ones_like(hists, np.float32),
        "label": np.ones((n_users, 1), np.float32),
    })
    item_ids = np.arange(1, n_items + 1, dtype=np.int32)
    items = PackedDataset({
        "item_id": item_ids,
        "category": (item_cluster[item_ids] + 1).astype(np.int32),
        "label": np.zeros((n_items, 1), np.float32),
    })
    # dev queries: fresh in-cluster targets
    q_tgts = np.array([sample_items(u, 1)[0] for u in range(1, n_users + 1)],
                      np.int32)
    query = PackedDataset({
        "user_id": uids, "item_id": q_tgts,
        "category": (item_cluster[q_tgts] + 1).astype(np.int32),
        "hist": hists, "hist_mask": np.ones_like(hists, np.float32),
        "label": np.ones((n_users, 1), np.float32),
    })
    histories = [h.tolist() for h in hists]

    cfg = make_cfg()
    cfg = dataclasses.replace(cfg, features=dataclasses.replace(
        cfg.features,
        sparse_feature_names=("user_id", "item_id", "category"),
        array_max_length={"hist": L}))
    cfg = dataclasses.replace(cfg, embeddings=dataclasses.replace(
        cfg.embeddings,
        embedding_table_size={"user_id": 400, "item_id": 250, "category": 10}))

    hrs = {}
    for augment in (False, True):
        model = build_dssm(cfg)
        tr = DSSMTrainer(cfg, model, workdir=str(tmp_path / f"a{augment}"),
                         use_mesh=False)
        ds = train
        if augment:
            aug = hist_augmented_pairs(cfg, train, items)
            ds = concat_datasets(positives_only(train), aug)
        state = tr.fit(ds, max_epochs=30)
        res = evaluate_retrieval(tr, state.params, items, query,
                                 target_item_ids=query.arrays["item_id"],
                                 histories=histories, k=10)
        hrs[augment] = res["HR@10"]
    # random HR@10 ~ 10/200 = 0.05; in-cluster structure should push the
    # augmented model well above both random and the click-only model
    assert hrs[True] > 0.15, hrs
    assert hrs[True] > hrs[False] + 0.05, hrs


def test_random_negative_rows():
    """Exposure-debias augmentation: label-0 rows pair each positive's user
    features with uniform corpus items whose item features are joined."""
    from news_recsys_tpu.data.hist_pairs import random_negative_rows

    cfg = make_cfg()
    train, items = make_data()
    neg = random_negative_rows(cfg, train, items, per_positive=3, seed=1)
    # 3 positives in make_data -> 9 negative rows
    assert len(neg) == 9
    a = neg.arrays
    assert np.all(a["label"] == 0.0)
    # user-side features copied from the positive source rows
    assert set(np.unique(a["user_id"])) <= {1, 2, 3}
    # item features joined consistently from the corpus
    for i in range(9):
        assert a["category"][i] == a["item_id"][i] % 9 + 1
    # sampled items span the corpus, not just the positives' items
    assert len(np.unique(a["item_id"])) > 3
    # hist columns ride along from the user side (same width)
    assert a["hist"].shape[1] == train.arrays["hist"].shape[1]
