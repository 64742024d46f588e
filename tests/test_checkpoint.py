"""Orbax sharded checkpointing: roundtrip, cross-mesh restore, resume."""

import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.parallel.mesh import make_mesh
from news_recsys_tpu.training.trainer import Trainer

FEATS = ["user_id", "item_id"]


def make_cfg():
    return config_from_dict({
        "name": "deep",
        "features": {"sparse_feature_names": FEATS,
                     "item_feature_names": ["item_id"], "user_feature_names": ["user_id"]},
        "embeddings": {"embedding_size": {k: 16 for k in FEATS},
                       "embedding_table_size": {"user_id": 300, "item_id": 500}},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 1, "lr": 1e-2, "min_lr": 1e-3,
                          "lr_milestones": [100, 200], "max_step": 10000},
    })


def make_ds(n=256, seed=0):
    rng = np.random.default_rng(seed)
    return PackedDataset({
        "user_id": rng.integers(1, 300, n).astype(np.int32),
        "item_id": rng.integers(1, 500, n).astype(np.int32),
        "label": (rng.random(n) < 0.3).astype(np.float32).reshape(-1, 1),
    })


def test_cross_mesh_restore(tmp_path):
    """Save on a 4x2 mesh, restore on single device: identical predictions."""
    cfg = make_cfg()
    ds = make_ds()
    model = build_ranker(cfg, "deep")

    mesh = make_mesh(data=4, model=2)
    t1 = Trainer(cfg, model, workdir=str(tmp_path / "a"), mesh=mesh)
    s1 = t1.fit(ds, max_epochs=1)
    t1.save_checkpoint_sharded(s1, step=self_step(s1))
    p1 = t1.predict(s1.params, ds)

    t2 = Trainer(cfg, model, workdir=str(tmp_path / "b"), use_mesh=False)
    sample = ds.take(np.arange(64))
    sample["_valid"] = np.ones(64, np.float32)
    s2 = t2.init_state(sample)
    # point t2's manager at t1's checkpoints
    t2.ckpt_dir = t1.ckpt_dir
    t2._ckpt_mgr = None
    s2, ok = t2.restore_latest(s2)
    assert ok
    p2 = t2.predict(s2.params, ds)
    np.testing.assert_allclose(p1, p2, atol=1e-5)
    assert int(s2.step) == int(self_step(s1))


def self_step(state):
    return int(np.asarray(state.step))


def test_resume_continues_step(tmp_path):
    cfg = make_cfg()
    ds = make_ds()
    model = build_ranker(cfg, "deep")
    t = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    s = t.fit(ds, max_epochs=1)
    step1 = self_step(s)
    assert step1 == 4  # 256 / 64
    t.save_checkpoint_sharded(s, step1)

    t2 = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    sample = ds.take(np.arange(64))
    sample["_valid"] = np.ones(64, np.float32)
    s2 = t2.init_state(sample)
    s2, ok = t2.restore_latest(s2)
    assert ok and t2.global_step == step1
    s2, _ = t2.train_epoch(s2, ds, epoch=1)
    assert self_step(s2) == 2 * step1


def test_sparse_state_sharded_roundtrip(tmp_path):
    """Orbax save/restore + fit(resume=True) for the sparse optimizer state."""
    import dataclasses
    from news_recsys_tpu.config import config_from_dict
    cfg_raw = {
        "name": "deep",
        "features": {"sparse_feature_names": FEATS,
                     "item_feature_names": ["item_id"], "user_feature_names": ["user_id"]},
        "embeddings": {"embedding_size": {k: 16 for k in FEATS},
                       "embedding_table_size": {"user_id": 5000, "item_id": 5000}},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 1, "lr": 1e-2, "min_lr": 1e-3,
                          "lr_milestones": [100, 200], "max_step": 10000,
                          "embedding_optimizer": "sparse_adamw"},
    }
    cfg = config_from_dict(cfg_raw)
    rng = np.random.default_rng(0)
    n = 256
    ds = PackedDataset({
        "user_id": rng.integers(1, 5000, n).astype(np.int32),
        "item_id": rng.integers(1, 5000, n).astype(np.int32),
        "label": (rng.random(n) < 0.3).astype(np.float32).reshape(-1, 1),
    })
    model = build_ranker(cfg, "deep")
    t = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    s = t.fit(ds, max_epochs=1)
    t.save_checkpoint_sharded(s, int(np.asarray(s.step)))
    p1 = t.predict(s.params, ds)

    t2 = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    s2 = t2.fit(ds, max_epochs=0, resume=True)
    assert t2.global_step == 4
    p2 = t2.predict(s2.params, ds)
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_mid_epoch_periodic_checkpoint(tmp_path):
    """ckpt_every_steps writes sharded checkpoints mid-epoch."""
    import dataclasses
    cfg = make_cfg()
    cfg = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
        cfg.train_hparams, ckpt_every_steps=2,
        chunk_steps=2))  # checkpoint opportunity every 2 steps
    ds = make_ds(n=512)  # 8 steps of 64
    model = build_ranker(cfg, "deep")
    t = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    s = t.fit(ds, max_epochs=1)
    steps = t.checkpoint_manager().all_steps()
    assert list(steps) == [2, 4, 6, 8]


def test_resume_keeps_ckpt_cadence(tmp_path):
    """Post-resume mid-epoch checkpoints keep landing on ckpt_every_steps
    multiples (regression: _last_step_ckpt defaulted to 0 after restore,
    forcing a 1-step chunk + an immediate redundant checkpoint)."""
    import dataclasses
    cfg = make_cfg()
    cfg = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
        cfg.train_hparams, ckpt_every_steps=3, chunk_steps=8))
    ds = make_ds(n=512)  # 8 steps/epoch at bs=64
    model = build_ranker(cfg, "deep")
    t = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    t.fit(ds, max_epochs=1)  # checkpoints at steps 3, 6
    assert list(t.checkpoint_manager().all_steps()) == [3, 6]

    t2 = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    t2.fit(ds, max_epochs=2, resume=True)  # resumes at step 6, runs to 16
    assert list(t2.checkpoint_manager().all_steps()) == [3, 6, 9, 12, 15]


def test_mid_epoch_resume_exact_data_order(tmp_path):
    """Interrupted mid-epoch + fit(resume=True) must produce the SAME final
    state as an uninterrupted run (no rows replayed or skipped)."""
    cfg = make_cfg()
    ds = make_ds(n=512)  # 8 steps/epoch at bs=64
    model = build_ranker(cfg, "deep")

    # uninterrupted: 2 epochs
    t_ref = Trainer(cfg, model, workdir=str(tmp_path / "ref"), use_mesh=False)
    s_ref = t_ref.fit(ds, max_epochs=2)
    p_ref = t_ref.predict(s_ref.params, ds)

    # interrupted: simulate a mid-epoch kill at step 12 by capping max_step
    import dataclasses
    cfg_cap = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
        cfg.train_hparams, max_step=12))
    t_b = Trainer(cfg_cap, model, workdir=str(tmp_path / "b"), use_mesh=False)
    s_b = t_b.fit(ds, max_epochs=2)          # stops at step 12 (mid epoch 1)
    assert t_b.global_step == 12
    t_b.save_checkpoint_sharded(s_b, 12)

    # resume with the uncapped config from t_b's checkpoints
    t_c = Trainer(cfg, model, workdir=str(tmp_path / "c"), use_mesh=False)
    t_c.ckpt_dir = t_b.ckpt_dir
    s_c = t_c.fit(ds, max_epochs=2, resume=True)
    assert t_c.global_step == 16
    p_c = t_c.predict(s_c.params, ds)
    np.testing.assert_allclose(p_ref, p_c, atol=1e-5)


def test_resume_across_truncated_epochs(tmp_path):
    """Resume ACROSS max_step-truncated epochs (multi-session continuation
    with a raised max_step each time) must replay/skip no rows: the final
    state matches an uninterrupted run and the last epoch's val_log block is
    byte-identical."""
    import dataclasses
    cfg = make_cfg()
    ds = make_ds(n=512)      # 8 steps/epoch at bs=64
    dev = make_ds(n=256, seed=1)
    model = build_ranker(cfg, "deep")

    def with_hp(**kw):
        return dataclasses.replace(cfg, train_hparams=dataclasses.replace(
            cfg.train_hparams, **kw))

    # uninterrupted reference: 3 epochs = 24 steps
    t_ref = Trainer(with_hp(max_step=100), model,
                    workdir=str(tmp_path / "ref"), use_mesh=False)
    s_ref = t_ref.fit(ds, dev_ds=dev, max_epochs=3)
    p_ref = t_ref.predict(s_ref.params, ds)

    # session A: truncated mid-epoch-1 at step 12 (ckpt lands exactly there)
    t_a = Trainer(with_hp(max_step=12, ckpt_every_steps=4), model,
                  workdir=str(tmp_path / "a"), use_mesh=False)
    t_a.fit(ds, dev_ds=dev, max_epochs=3)
    assert t_a.global_step == 12

    # session B: resumes at (epoch 1, offset 4), truncated again mid-epoch-2
    t_b = Trainer(with_hp(max_step=20, ckpt_every_steps=4), model,
                  workdir=str(tmp_path / "b"), use_mesh=False)
    t_b.ckpt_dir = t_a.ckpt_dir
    t_b.fit(ds, dev_ds=dev, max_epochs=3, resume=True)
    assert t_b.global_step == 20

    # session C: resumes at (epoch 2, offset 4) and completes epoch 2
    t_c = Trainer(with_hp(max_step=100), model,
                  workdir=str(tmp_path / "c"), use_mesh=False)
    t_c.ckpt_dir = t_b.ckpt_dir
    s_c = t_c.fit(ds, dev_ds=dev, max_epochs=3, resume=True)
    assert t_c.global_step == 24
    p_c = t_c.predict(s_c.params, ds)
    np.testing.assert_allclose(p_ref, p_c, atol=1e-6)

    # the completed epoch-2 validation block must match byte-for-byte
    def last_block(path):
        text = open(path).read()
        return text[text.rindex("Epoch 2 "):]
    assert last_block(t_c.val_log_path) == last_block(t_ref.val_log_path)


def test_resume_at_max_step_is_noop(tmp_path):
    """Resuming from a checkpoint already at max_step must not re-validate or
    re-checkpoint a 0-step epoch."""
    import dataclasses
    cfg = make_cfg()
    cfg = dataclasses.replace(cfg, train_hparams=dataclasses.replace(
        cfg.train_hparams, max_step=8, ckpt_every_steps=4))
    ds = make_ds(n=512)
    model = build_ranker(cfg, "deep")
    t = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    t.fit(ds, max_epochs=3)
    assert t.global_step == 8

    t2 = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    t2.fit(ds, max_epochs=3, resume=True)
    assert t2.global_step == 8
    # no new checkpoints beyond session 1's
    assert list(t2.checkpoint_manager().all_steps()) == [4, 8]
    assert open(t2.val_log_path).read() == ""


def test_adagrad_state_sharded_roundtrip(tmp_path):
    """Orbax save/restore for the rowwise-adagrad state ((V,) accumulator,
    empty emb_nu)."""
    from news_recsys_tpu.config import config_from_dict
    cfg = config_from_dict({
        "name": "deep",
        "features": {"sparse_feature_names": FEATS,
                     "item_feature_names": ["item_id"], "user_feature_names": ["user_id"]},
        "embeddings": {"embedding_size": {k: 16 for k in FEATS},
                       "embedding_table_size": {"user_id": 5000, "item_id": 5000}},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 1, "lr": 1e-2, "min_lr": 1e-3,
                          "lr_milestones": [100, 200], "max_step": 10000,
                          "embedding_optimizer": "rowwise_adagrad"},
    })
    rng = np.random.default_rng(0)
    n = 256
    ds = PackedDataset({
        "user_id": rng.integers(1, 5000, n).astype(np.int32),
        "item_id": rng.integers(1, 5000, n).astype(np.int32),
        "label": (rng.random(n) < 0.3).astype(np.float32).reshape(-1, 1),
    })
    model = build_ranker(cfg, "deep")
    t = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    s = t.fit(ds, max_epochs=1)
    t.save_checkpoint_sharded(s, int(np.asarray(s.step)))
    p1 = t.predict(s.params, ds)

    t2 = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    s2 = t2.fit(ds, max_epochs=0, resume=True)
    assert t2.global_step == 4
    np.testing.assert_allclose(np.asarray(s2.emb_mu["user_id"]),
                               np.asarray(s.emb_mu["user_id"]), atol=0)
    p2 = t2.predict(s2.params, ds)
    np.testing.assert_allclose(p1, p2, atol=1e-6)
