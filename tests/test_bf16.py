"""bf16 embedding storage + bf16 tower compute.

Large tables can be stored in bfloat16 (``mesh.param_dtype``): half the HBM
footprint and gather/scatter bytes. The rowwise sparse optimizer keeps fp32
moments and writes updated rows back with stochastic rounding, so tiny Adam
deltas accumulate in expectation. Towers optionally run their matmuls in
bf16 (``mesh.compute_dtype``) with fp32 params and fp32 logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.models.embedding import table_storage_dtype
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.training.sparse_step import stochastic_round_bf16
from news_recsys_tpu.training.trainer import Trainer

FEATS = ["user_id", "item_id", "category"]


def make_cfg(param_dtype="bfloat16", compute_dtype="float32", lr=5e-3,
             optimizer="sparse_adamw", name="deep"):
    return config_from_dict({
        "name": name,
        "features": {"sparse_feature_names": FEATS,
                     "item_feature_names": ["item_id", "category"],
                     "user_feature_names": ["user_id"]},
        # vocab >= 4096 so user/item are LARGE (bf16-eligible, rowwise path)
        "embeddings": {"embedding_size": {k: 16 for k in FEATS},
                       "embedding_table_size": {"user_id": 5000, "item_id": 5000,
                                                "category": 20}},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 3, "lr": lr, "min_lr": 1e-3,
                          "lr_milestones": [200, 600], "max_step": 100000,
                          "embedding_optimizer": optimizer},
        "mesh": {"param_dtype": param_dtype, "compute_dtype": compute_dtype},
    })


def make_ds(n=2048, seed=0, n_users=4999, n_items=4999):
    rng = np.random.default_rng(seed)
    users = rng.integers(1, n_users, n).astype(np.int32)
    items = rng.integers(1, n_items, n).astype(np.int32)
    cats = (items % 19 + 1).astype(np.int32)
    labels = ((users % 2) == (items % 2)).astype(np.float32)
    noise = rng.random(n) < 0.1
    labels = np.where(noise, 1 - labels, labels)
    return PackedDataset({"user_id": users, "item_id": items, "category": cats,
                          "label": labels.reshape(-1, 1)})


def test_stochastic_round_unbiased():
    lo = jnp.asarray(jnp.bfloat16(1.0), jnp.float32)
    hi = jnp.asarray(jnp.nextafter(jnp.bfloat16(1.0), jnp.bfloat16(2.0)), jnp.float32)
    x = jnp.full((4096,), lo + 0.25 * (hi - lo), jnp.float32)
    rounded = stochastic_round_bf16(x, jax.random.PRNGKey(0)).astype(jnp.float32)
    # every sample lands on one of the two bf16 neighbours
    assert set(np.unique(np.asarray(rounded))) <= {float(lo), float(hi)}
    # ~25% round up (unbiased): mean recovers x far below bf16 resolution
    frac_up = float(jnp.mean(rounded == hi))
    assert abs(frac_up - 0.25) < 0.05, frac_up
    # exactly-representable values pass through untouched (incl. sign/zero)
    exact = jnp.asarray([0.0, -0.0, 1.0, -3.5, 256.0], jnp.float32)
    out = stochastic_round_bf16(exact, jax.random.PRNGKey(1)).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(exact))


def test_bf16_requires_sparse_optimizer():
    with pytest.raises(ValueError, match="sparse_adamw"):
        make_cfg(optimizer="adamw")


def test_bad_dtype_rejected():
    with pytest.raises(ValueError, match="param_dtype"):
        make_cfg(param_dtype="float16")


def test_table_storage_dtype_split():
    assert table_storage_dtype("bfloat16", 5000) == jnp.bfloat16
    assert table_storage_dtype("bfloat16", 20) == jnp.float32   # small stays fp32
    assert table_storage_dtype("float32", 5000) == jnp.float32


def test_bf16_table_dtypes_after_init():
    cfg = make_cfg()
    model = build_ranker(cfg, "deep")
    batch = {"user_id": jnp.ones(4, jnp.int32), "item_id": jnp.ones(4, jnp.int32),
             "category": jnp.ones(4, jnp.int32), "label": jnp.zeros((4, 1))}
    params = model.init(jax.random.PRNGKey(0), batch)
    emb = params["params"]["embedder"]
    assert emb["user_id"].dtype == jnp.bfloat16
    assert emb["item_id"].dtype == jnp.bfloat16
    assert emb["category"].dtype == jnp.float32
    # tower params stay fp32 even under bf16 compute
    cfg2 = make_cfg(compute_dtype="bfloat16")
    model2 = build_ranker(cfg2, "deep")
    params2 = model2.init(jax.random.PRNGKey(0), batch)
    kernel = jax.tree_util.tree_leaves(params2["params"]["tower"])[0]
    assert kernel.dtype == jnp.float32
    # logits fp32 under bf16 compute
    logits = model2.apply(params2, batch)
    assert logits.dtype == jnp.float32


def test_bf16_training_matches_fp32_quality(tmp_path):
    ds = make_ds()
    from news_recsys_tpu.training.metrics import pooled_auc
    results = {}
    for tag, (pd, cd) in {"fp32": ("float32", "float32"),
                          "bf16": ("bfloat16", "bfloat16")}.items():
        cfg = make_cfg(param_dtype=pd, compute_dtype=cd)
        model = build_ranker(cfg, "deep")
        tr = Trainer(cfg, model, workdir=str(tmp_path / tag), use_mesh=False)
        state = tr.fit(ds, max_epochs=12)
        scores = tr.predict(state.params, ds)
        # tables still bf16 after training (write-back preserved storage dtype)
        if tag == "bf16":
            assert state.params["params"]["embedder"]["user_id"].dtype == jnp.bfloat16
            assert state.emb_mu["user_id"].dtype == jnp.float32
        results[tag] = pooled_auc(ds.arrays["label"][:, 0], scores)
    assert results["bf16"] > 0.75, results
    assert abs(results["bf16"] - results["fp32"]) < 0.1, results


def test_bf16_with_model_parallel_mesh(tmp_path):
    """bf16 tables + row-sharded scatters (stochastic rounding inside
    shard_map) train and predict finitely, tables stay bf16 and sharded."""
    from news_recsys_tpu.parallel.mesh import make_mesh
    ds = make_ds(n=512)
    cfg = make_cfg(compute_dtype="bfloat16")
    model = build_ranker(cfg, "deep")
    mesh = make_mesh(data=4, model=2)
    tr = Trainer(cfg, model, workdir=str(tmp_path), mesh=mesh)
    state = tr.fit(ds, max_epochs=1)
    tbl = state.params["params"]["embedder"]["user_id"]
    assert tbl.dtype == jnp.bfloat16
    assert len(tbl.sharding.device_set) == 8
    scores = tr.predict(state.params, ds)
    assert np.isfinite(scores).all()
