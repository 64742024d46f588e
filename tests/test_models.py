import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recsys_tpu.config import build_schema, config_from_dict
from news_recsys_tpu.models.rankers import RANKER_NAMES, build_ranker

CFG = {
    "name": "deep",
    "features": {
        "sparse_feature_names": ["user_id", "item_id", "category", "subcategory", "user_click_category"],
        "dense_feature_names": [],
        "array_feature_names": ["hist"],
        "item_feature_names": ["item_id", "category", "subcategory"],
        "user_feature_names": ["user_id", "user_click_category", "hist"],
        "array_max_length": {"hist": 8},
    },
    "embeddings": {
        "embedding_size": {
            "user_id": 32, "item_id": 32, "category": 16,
            "subcategory": 16, "user_click_category": 16,
        },
        "embedding_table_size": {
            "user_id": 1000, "item_id": 500, "category": 18,
            "subcategory": 270, "user_click_category": 18,
        },
        "share_emb_table_features": {"hist": "item_id"},
    },
    "wide_and_deep_cfg": {"wide_feature_names": ["category", "subcategory"]},
}


def make_batch(rng, b=16):
    return {
        "user_id": jnp.asarray(rng.integers(0, 1000, b), jnp.int32),
        "item_id": jnp.asarray(rng.integers(0, 500, b), jnp.int32),
        "category": jnp.asarray(rng.integers(0, 18, b), jnp.int32),
        "subcategory": jnp.asarray(rng.integers(0, 270, b), jnp.int32),
        "user_click_category": jnp.asarray(rng.integers(0, 18, b), jnp.int32),
        "hist": jnp.asarray(rng.integers(0, 500, (b, 8)), jnp.int32),
        "hist_mask": jnp.asarray(rng.integers(0, 2, (b, 8)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, (b, 1)), jnp.float32),
    }


@pytest.fixture(scope="module")
def cfg():
    return config_from_dict(CFG)


@pytest.mark.parametrize("name", RANKER_NAMES)
def test_ranker_forward(cfg, name):
    if name in ("fm", "deepfm"):
        # FM requires equal embedding dims across fields (train_cf_fm.yaml:31-36)
        raw = {**CFG, "embeddings": {
            **CFG["embeddings"],
            "embedding_size": {k: 16 for k in CFG["embeddings"]["embedding_size"]},
        }}
        cfg = config_from_dict(raw)
    model = build_ranker(cfg, name)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)
    logits = jax.jit(model.apply)(params, batch)
    assert logits.shape == (16,)
    assert np.isfinite(np.asarray(logits)).all()


def test_schema_contract(cfg):
    schema = build_schema(cfg)
    # Sorted-name order is the concat contract (base_model.py:286)
    assert schema.names == tuple(sorted(schema.names))
    assert schema.total_dim == 32 + 32 + 16 + 16 + 16 + 32  # + hist(->item_id dim 32)
    off = 0
    for s in schema.specs:
        assert s.offset == off
        off += s.dim


def test_padding_row_is_zero_and_no_grad(cfg):
    model = build_ranker(cfg, "deep")
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    batch["item_id"] = jnp.zeros_like(batch["item_id"])  # all padding ids

    params = model.init(jax.random.PRNGKey(0), batch)

    def loss(p):
        return jnp.sum(model.apply(p, batch) ** 2)

    grads = jax.grad(loss)(params)
    item_grad = grads["params"]["embedder"]["item_id"]
    # padding id 0 must receive zero gradient
    assert np.allclose(np.asarray(item_grad[0]), 0.0)
