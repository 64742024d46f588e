"""Full recall -> rank cascade serving (BASELINE 'DSSM recall -> DCN rank')."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.models.dssm import build_dssm
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.serving import CascadeRecommender, Recommender, serve_http
from news_recsys_tpu.training.retrieval import DSSMTrainer
from news_recsys_tpu.training.trainer import Trainer

from tests.test_retrieval import make_cfg, synthetic_pairs


def ranker_cfg():
    return config_from_dict({
        "name": "dcn",
        "features": {"sparse_feature_names": ["user_id", "item_id", "category"],
                     "item_feature_names": ["item_id", "category"],
                     "user_feature_names": ["user_id"]},
        "embeddings": {"embedding_size": {"user_id": 16, "item_id": 16,
                                          "category": 16},
                       "embedding_table_size": {"user_id": 64, "item_id": 128,
                                                "category": 8}},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 2, "lr": 5e-3, "min_lr": 1e-3,
                          "lr_milestones": [600, 1200], "max_step": 10000},
        "dcn_cfg": {"num_layers": 2, "version": 1},
    })


@pytest.fixture(scope="module")
def cascade(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cascade")
    rng = np.random.default_rng(5)
    arrays, item_cat = synthetic_pairs(rng, n=2048)
    train = PackedDataset(arrays)

    dssm_cfg = make_cfg()
    dssm = build_dssm(dssm_cfg)
    dtr = DSSMTrainer(dssm_cfg, dssm, workdir=str(tmp / "dssm"), use_mesh=False)
    dstate = dtr.fit(train, max_epochs=8)

    rcfg = ranker_cfg()
    ranker = build_ranker(rcfg, "dcn")
    rtr = Trainer(rcfg, ranker, workdir=str(tmp / "dcn"), use_mesh=False)
    rstate = rtr.fit(train, max_epochs=4)

    n_items = 96
    item_ds = PackedDataset({
        "item_id": np.arange(1, n_items + 1, dtype=np.int32),
        "category": item_cat[1: n_items + 1].astype(np.int32),
        "label": np.zeros((n_items, 1), np.float32),
    })
    recall = Recommender(dssm_cfg, dssm, dstate.params, item_ds, backend="device")
    casc = CascadeRecommender(recall, rcfg, ranker, rstate.params, item_ds,
                              fetch=40)
    return casc, recall, ranker, rstate, item_ds, item_cat


def test_cascade_orders_by_ranker_score(cascade):
    casc, recall, ranker, rstate, item_ds, item_cat = cascade
    users = {"user_id": np.arange(1, 9, dtype=np.int32),
             "label": np.zeros((8, 1), np.float32)}
    ids, scores = casc.recommend(users, k=5)
    cand_ids, _ = recall.recommend(users, k=casc.fetch)
    for r in range(8):
        assert len(ids[r]) == 5 and len(set(ids[r])) == 5
        assert set(ids[r]) <= set(cand_ids[r])           # cascade ⊆ recall
        assert sorted(scores[r], reverse=True) == scores[r]
        # scores match the ranker applied directly to (user, item) pairs
        batch = {"user_id": np.full(5, r + 1, np.int32),
                 "item_id": np.asarray(ids[r], np.int32),
                 "category": item_cat[np.asarray(ids[r])].astype(np.int32),
                 "label": np.zeros((5, 1), np.float32)}
        direct = 1 / (1 + np.exp(-np.asarray(ranker.apply(rstate.params, batch))))
        np.testing.assert_allclose(scores[r], direct, rtol=1e-4, atol=1e-5)


def test_cascade_history_dedup(cascade):
    casc = cascade[0]
    users = {"user_id": np.asarray([3], np.int32),
             "label": np.zeros((1, 1), np.float32)}
    base_ids, _ = casc.recommend(users, k=8)
    banned = base_ids[0][:4]
    ids, _ = casc.recommend(users, k=8, histories=[banned])
    assert not (set(ids[0]) & set(banned))


def test_cascade_bundle_roundtrip(cascade, tmp_path):
    casc = cascade[0]
    users = {"user_id": np.arange(1, 5, dtype=np.int32),
             "label": np.zeros((4, 1), np.float32)}
    want_ids, want_scores = casc.recommend(users, k=5)
    path = casc.save(str(tmp_path / "bundle"))
    loaded = CascadeRecommender.load(path, backend="device")
    got_ids, got_scores = loaded.recommend(users, k=5)
    assert got_ids == want_ids
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)


def test_cascade_http(cascade):
    casc = cascade[0]
    server = serve_http(casc, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["cascade"] is True and health["ranker"] == "dcn"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend",
            data=json.dumps({"users": {"user_id": [1, 2]}, "k": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["ids"]) == 2 and all(len(x) == 3 for x in out["ids"])
    finally:
        server.shutdown()
