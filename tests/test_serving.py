"""Serving-path tests: Recommender over a trained DSSM, both backends."""

import numpy as np
import pytest

from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.models.dssm import build_dssm
from news_recsys_tpu.serving import Recommender
from news_recsys_tpu.training.retrieval import DSSMTrainer
from tests.test_retrieval import make_cfg, synthetic_pairs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    cfg = make_cfg()
    rng = np.random.default_rng(5)
    arrays, item_cat = synthetic_pairs(rng, n=2048)
    train = PackedDataset(arrays)
    model = build_dssm(cfg)
    trainer = DSSMTrainer(cfg, model, workdir=str(tmp))
    state = trainer.fit(train, epochs=10)
    n_items = 96
    item_ds = PackedDataset({
        "item_id": np.arange(1, n_items + 1, dtype=np.int32),
        "category": item_cat[1: n_items + 1].astype(np.int32),
        "label": np.full((n_items, 1), -1, np.float32),
    })
    return cfg, model, state, item_ds, trainer


@pytest.mark.parametrize("backend", ["device", "host"])
def test_recommend(trained, backend):
    cfg, model, state, item_ds, _ = trained
    rec = Recommender(cfg, model, state.params, item_ds, backend=backend)
    users = {"user_id": np.arange(1, 9, dtype=np.int32),
             "label": np.zeros((8, 1), np.float32)}
    ids, scores = rec.recommend(users, k=5)
    assert len(ids) == 8
    for row_ids, row_scores in zip(ids, scores):
        assert len(row_ids) == 5
        assert len(set(row_ids)) == 5
        assert all(1 <= i <= 96 for i in row_ids)
        assert sorted(row_scores, reverse=True) == row_scores


def test_recommend_history_dedup(trained):
    cfg, model, state, item_ds, _ = trained
    rec = Recommender(cfg, model, state.params, item_ds, backend="device")
    users = {"user_id": np.asarray([1], np.int32), "label": np.zeros((1, 1), np.float32)}
    base_ids, _ = rec.recommend(users, k=5)
    excluded = base_ids[0][:2]
    ids, _ = rec.recommend(users, k=5, histories=[excluded])
    assert not (set(ids[0]) & set(excluded))


def test_dssm_epoch_checkpoints(trained):
    cfg, model, state, item_ds, trainer = trained
    import glob, os
    ckpts = sorted(glob.glob(os.path.join(trainer.ckpt_dir, "epoch_*.msgpack")))
    assert len(ckpts) == 10  # one per epoch, full history
    restored = trainer.load_params(state, ckpts[-1])
    a = np.asarray(jax_tree_first(state.params))
    b = np.asarray(jax_tree_first(restored.params))
    np.testing.assert_allclose(a, b)


def jax_tree_first(tree):
    import jax
    return jax.tree.leaves(tree)[0]
