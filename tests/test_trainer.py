"""End-to-end training tests on synthetic data (CPU, 8 virtual devices)."""

import json
import os

import jax
import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.data.feature_extraction import FeatureExtractionPipeline
from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.data.preprocess import run_preprocess
from news_recsys_tpu.data.synthetic import generate_mind
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.parallel.mesh import make_mesh
from news_recsys_tpu.training.trainer import Trainer

FEATS = ["user_id", "item_id", "category", "subcategory", "user_click_category"]


def make_cfg(tmp, name="deep", batch_size=64, max_epoch=2):
    return config_from_dict({
        "name": name,
        "paths": {"data_path": str(tmp / "raw"), "out_basedir": str(tmp / "out")},
        "features": {
            "feature_names": FEATS,
            "sparse_feature_names": FEATS,
            "item_feature_names": ["item_id", "category", "subcategory"],
            "user_feature_names": ["user_id", "user_click_category"],
        },
        "embeddings": {
            "embedding_size": {k: 16 for k in FEATS},
            "embedding_table_size": {"user_id": 200, "item_id": 400, "category": 20,
                                     "subcategory": 200, "user_click_category": 20},
        },
        "dataset": {"batch_size": batch_size},
        "train_hparams": {"max_epoch": max_epoch, "lr": 5e-3, "min_lr": 1e-4,
                          "lr_milestones": [50, 200], "max_step": 10000, "val_freq": 1},
        "wide_and_deep_cfg": {"wide_feature_names": ["category"]},
    })


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    generate_mind(str(tmp / "raw"), n_news=150, n_users=80,
                  n_impressions_train=500, n_impressions_dev=120, seed=7)
    cfg = make_cfg(tmp)
    run_preprocess(cfg.paths.data_path, cfg.paths.out_basedir)
    FeatureExtractionPipeline(cfg).run()
    return tmp


def _load(tmp, cfg):
    train = PackedDataset.open_split(cfg, "train")
    dev = PackedDataset.open_split(cfg, "dev")
    warm = set(json.load(open(os.path.join(cfg.paths.out_basedir, "preprocess", "train_user_ids.json"))))
    return train, dev, warm


def test_e2e_deep_learns(data_dir, tmp_path):
    cfg = make_cfg(data_dir, "deep", max_epoch=3)
    train, dev, warm = _load(data_dir, cfg)
    model = build_ranker(cfg, "deep")
    trainer = Trainer(cfg, model, workdir=str(tmp_path / "exp"), use_mesh=False)
    state = trainer.fit(train, dev, warm_user_set=warm)

    # artifacts
    assert os.path.exists(trainer.val_log_path)
    assert os.path.exists(os.path.join(trainer.log_dir, "model_info.log"))
    content = open(trainer.val_log_path).read()
    assert "Validation Results" in content and "Warm Start Users" in content

    # the synthetic data has category-affinity signal; model should beat random
    res = trainer.validate(state, dev, epoch=99, warm_user_set=warm)
    assert res["Overall"]["AUC"] > 0.55, res["Overall"]


def test_checkpoint_roundtrip(data_dir, tmp_path):
    cfg = make_cfg(data_dir, "deep", max_epoch=1)
    train, dev, warm = _load(data_dir, cfg)
    model = build_ranker(cfg, "deep")
    trainer = Trainer(cfg, model, workdir=str(tmp_path / "exp"), use_mesh=False)
    state = trainer.fit(train, max_epochs=1)
    path = trainer.save_checkpoint(state, epoch=0)
    scores_before = trainer.predict(state.params, dev)

    trainer2 = Trainer(cfg, model, workdir=str(tmp_path / "exp2"), use_mesh=False)
    sample = next(iter([dev.take(np.arange(cfg.dataset.batch_size))]))
    sample["_valid"] = np.ones(cfg.dataset.batch_size, np.float32)
    state2 = trainer2.init_state(sample)
    state2 = trainer2.load_checkpoint(state2, path)
    scores_after = trainer2.predict(state2.params, dev)
    np.testing.assert_allclose(scores_before, scores_after, rtol=1e-6)


def test_slab_streaming_matches_device_resident(data_dir, tmp_path):
    """A device_resident_bytes budget too small for the dataset forces the
    slab-streamed path (with the per-slab cap); results must be identical to
    the device-resident path."""
    import dataclasses
    cfg = make_cfg(data_dir, "deep", max_epoch=1)
    train, dev, warm = _load(data_dir, cfg)
    model = build_ranker(cfg, "deep")

    t_res = Trainer(cfg, model, workdir=str(tmp_path / "r"), use_mesh=False)
    s_res = t_res.fit(train, max_epochs=1)

    # budget ≈ 3 batches of rows -> slab path, slab cap of a few steps
    per_row = sum(v.nbytes for v in train.arrays.values()) / len(train)
    cfg_slab = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
        cfg.train_hparams,
        device_resident_bytes=int(per_row * cfg.dataset.batch_size * 3)))
    t_slab = Trainer(cfg_slab, model, workdir=str(tmp_path / "s"), use_mesh=False)
    packer = t_slab._packer(train)
    assert not t_slab._use_device_resident(packer)
    assert 1 <= t_slab._slab_chunk_cap(packer, cfg.dataset.batch_size) <= 4
    s_slab = t_slab.fit(train, max_epochs=1)

    p1 = t_res.predict(s_res.params, dev)
    p2 = t_slab.predict(s_slab.params, dev)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_data_parallel_mesh_matches_single_device(data_dir, tmp_path):
    """DP over 8 CPU devices must give the same numbers as single-device."""
    cfg = make_cfg(data_dir, "deep", max_epoch=1, batch_size=64)
    train, dev, warm = _load(data_dir, cfg)
    model = build_ranker(cfg, "deep")

    t_single = Trainer(cfg, model, workdir=str(tmp_path / "s"), use_mesh=False)
    s_single = t_single.fit(train, max_epochs=1)

    mesh = make_mesh(data=8, model=1)
    t_mesh = Trainer(cfg, model, workdir=str(tmp_path / "m"), mesh=mesh)
    s_mesh = t_mesh.fit(train, max_epochs=1)

    p1 = t_single.predict(s_single.params, dev)
    p2 = t_mesh.predict(s_mesh.params, dev)
    np.testing.assert_allclose(p1, p2, atol=1e-4)


def test_model_parallel_embedding_sharding(data_dir, tmp_path):
    """Row-sharded embedding tables (model=2) must match replicated training."""
    cfg = make_cfg(data_dir, "deep", max_epoch=1, batch_size=64)
    train, dev, warm = _load(data_dir, cfg)
    model = build_ranker(cfg, "deep")

    t_single = Trainer(cfg, model, workdir=str(tmp_path / "s"), use_mesh=False)
    s_single = t_single.fit(train, max_epochs=1)

    mesh = make_mesh(data=4, model=2)
    t_mesh = Trainer(cfg, model, workdir=str(tmp_path / "m"), mesh=mesh)
    s_mesh = t_mesh.fit(train, max_epochs=1)

    p1 = t_single.predict(s_single.params, dev)
    p2 = t_mesh.predict(s_mesh.params, dev)
    np.testing.assert_allclose(p1, p2, atol=1e-4)
