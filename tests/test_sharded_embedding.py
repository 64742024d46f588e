"""Explicit shard_map embedding lookup: value + gradient parity with plain
gather, and full-trainer equivalence on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recsys_tpu.parallel.mesh import make_mesh
from news_recsys_tpu.parallel.sharded_embedding import (active_mesh,
                                                        set_active_mesh,
                                                        sharded_lookup)


@pytest.fixture(autouse=True)
def _clear_mesh():
    yield
    set_active_mesh(None)


@pytest.mark.parametrize("model_axis", [2, 4])
def test_lookup_value_parity(model_axis):
    mesh = make_mesh(data=8 // model_axis, model=model_axis)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((256, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 256, (32,)), jnp.int32)

    out = sharded_lookup(table, ids, mesh)
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_lookup_2d_ids():
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((128, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, (16, 5)), jnp.int32)
    out = sharded_lookup(table, ids, mesh)
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_lookup_gradient_parity():
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((128, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 128, (32,)), jnp.int32)

    def loss_sharded(t):
        return jnp.sum(sharded_lookup(t, ids, mesh) ** 2)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    g1 = jax.grad(loss_sharded)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


def test_trainer_explicit_collectives_matches_gspmd(tmp_path):
    """Full training epoch: explicit shard_map lookups == GSPMD partitioning."""
    from news_recsys_tpu.config import config_from_dict
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer

    FEATS = ["user_id", "item_id"]
    raw = {
        "name": "deep",
        "features": {"sparse_feature_names": FEATS,
                     "item_feature_names": ["item_id"], "user_feature_names": ["user_id"]},
        "embeddings": {"embedding_size": {k: 16 for k in FEATS},
                       "embedding_table_size": {"user_id": 300, "item_id": 500}},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 1, "lr": 1e-2, "min_lr": 1e-3,
                          "lr_milestones": [100, 200], "max_step": 1000},
    }
    rng = np.random.default_rng(3)
    n = 512
    ds = PackedDataset({
        "user_id": rng.integers(1, 300, n).astype(np.int32),
        "item_id": rng.integers(1, 500, n).astype(np.int32),
        "label": (rng.random(n) < 0.3).astype(np.float32).reshape(-1, 1),
    })

    cfg_g = config_from_dict(raw)
    model = build_ranker(cfg_g, "deep")
    mesh = make_mesh(data=4, model=2)

    t1 = Trainer(cfg_g, model, workdir=str(tmp_path / "g"), mesh=mesh)
    s1 = t1.fit(ds, max_epochs=1)
    p1 = t1.predict(s1.params, ds)

    cfg_e = config_from_dict({**raw, "mesh": {"data": 4, "model": 2, "explicit_collectives": True}})
    t2 = Trainer(cfg_e, model, workdir=str(tmp_path / "e"), mesh=mesh)
    assert active_mesh() is not None
    s2 = t2.fit(ds, max_epochs=1)
    p2 = t2.predict(s2.params, ds)
    set_active_mesh(None)

    np.testing.assert_allclose(p1, p2, atol=2e-4)
