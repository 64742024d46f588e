"""History/entity array features + attention sequence ranker, end-to-end."""

import os

import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.data.feature_extraction import FeatureExtractionPipeline
from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.data.preprocess import run_preprocess
from news_recsys_tpu.data.synthetic import generate_mind
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.training.trainer import Trainer

FEATS = ["user_id", "item_id", "category", "subcategory", "user_click_category"]


def make_cfg(tmp):
    return config_from_dict({
        "name": "attention",
        "paths": {"data_path": str(tmp / "raw"), "out_basedir": str(tmp / "out")},
        "features": {
            "feature_names": FEATS + ["hist", "entities"],
            "sparse_feature_names": FEATS,
            "array_feature_names": ["hist", "entities"],
            "item_feature_names": ["item_id", "category", "subcategory", "entities"],
            "user_feature_names": ["user_id", "user_click_category", "hist"],
            "array_max_length": {"hist": 10, "entities": 4},
        },
        "embeddings": {
            "embedding_size": {**{k: 16 for k in FEATS}, "entities": 8},
            "embedding_table_size": {"user_id": 200, "item_id": 400, "category": 20,
                                     "subcategory": 200, "user_click_category": 20,
                                     "entities": 100},
            "share_emb_table_features": {"hist": "item_id"},
        },
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 2, "lr": 3e-3, "min_lr": 1e-4,
                          "lr_milestones": [200, 600], "max_step": 10000},
        "attention_cfg": {"num_layers": 1, "num_heads": 2, "ff_dim": 32},
    })


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("seq")
    generate_mind(str(tmp / "raw"), n_news=150, n_users=80,
                  n_impressions_train=400, n_impressions_dev=100, seed=11)
    cfg = make_cfg(tmp)
    run_preprocess(cfg.paths.data_path, cfg.paths.out_basedir)
    FeatureExtractionPipeline(cfg, write_text=True).run()
    return tmp, cfg


def test_array_features_extracted(pipeline):
    tmp, cfg = pipeline
    ds = PackedDataset.open_split(cfg, "train")
    assert ds.arrays["hist"].shape[1] == 10
    assert ds.arrays["hist_mask"].shape == ds.arrays["hist"].shape
    assert ds.arrays["entities"].shape[1] == 4
    # masks mark real prefix entries
    h, m = ds.arrays["hist"], ds.arrays["hist_mask"]
    assert ((h > 0) == (m > 0)).all()
    # entity ids within vocab bounds
    assert ds.arrays["entities"].max() < 100
    # some rows have non-empty history and entities
    assert m.sum() > 0 and ds.arrays["entities_mask"].sum() > 0


def test_text_roundtrip_with_arrays(pipeline):
    tmp, cfg = pipeline
    fe = tmp / "out" / "extractored_feature"
    packed = PackedDataset.open_split(cfg, "train")
    from_text = PackedDataset.from_text(str(fe / "train_features.txt"), cfg, native=False)
    for k in ["hist", "entities", "hist_mask", "entities_mask"]:
        np.testing.assert_array_equal(packed.arrays[k], from_text.arrays[k], err_msg=k)
    # native C++ parser agrees too
    from_native = PackedDataset.from_text(str(fe / "train_features.txt"), cfg, native=True)
    for k in ["hist", "entities", "user_id"]:
        np.testing.assert_array_equal(packed.arrays[k], from_native.arrays[k], err_msg=k)


def test_attention_ranker_trains(pipeline, tmp_path):
    tmp, cfg = pipeline
    train = PackedDataset.open_split(cfg, "train")
    dev = PackedDataset.open_split(cfg, "dev")
    model = build_ranker(cfg, "attention")
    tr = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    state = tr.fit(train, max_epochs=2)
    scores = tr.predict(state.params, dev)
    assert scores.shape == (len(dev),)
    assert np.isfinite(scores).all()
    assert scores.std() > 1e-4  # not collapsed


def test_deep_with_arrays_mean_pooling(pipeline, tmp_path):
    """The classic rankers also accept array features (masked mean pool)."""
    tmp, cfg = pipeline
    train = PackedDataset.open_split(cfg, "train")
    model = build_ranker(cfg, "deep")
    tr = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    state = tr.fit(train, max_epochs=1)
    scores = tr.predict(state.params, train)
    assert np.isfinite(scores).all()


def test_attention_ranker_sparse_optimizer(pipeline, tmp_path):
    """The attention ranker trains with the sparse rowwise optimizer, and
    matches the dense optimizer's prediction trend (both finite, learning)."""
    import dataclasses
    tmp, cfg = pipeline
    # bump user/item vocab above the large-table threshold is unnecessary for
    # correctness; this exercises both the small- and large-table branches.
    cfg_sp = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
        cfg.train_hparams, embedding_optimizer="sparse_adamw"))
    train = PackedDataset.open_split(cfg_sp, "train")
    model = build_ranker(cfg_sp, "attention")
    tr = Trainer(cfg_sp, model, workdir=str(tmp_path), use_mesh=False)
    state = tr.fit(train, max_epochs=2)
    scores = tr.predict(state.params, train)
    assert np.isfinite(scores).all()
    assert scores.std() > 1e-4
    # hist row gradients actually reached the shared item table
    from news_recsys_tpu.training.metrics import pooled_auc
    auc = pooled_auc(train.arrays["label"][:, 0], scores)
    assert auc > 0.6, auc
