"""Pallas kernel correctness tests (interpreter mode on CPU): forward and
gradient parity against pure-XLA / reference-transliteration math."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

os.environ["NRT_PALLAS"] = "interpret"

from news_recsys_tpu.ops.dcn_kernel import (dcn_cross_stack,
                                            reference_cross_stack)
from news_recsys_tpu.ops.fm_kernel import fm_second_order
from news_recsys_tpu.ops.fused_lookup_pool import (fused_lookup_pool,
                                                   reference_lookup_pool)


@pytest.fixture(autouse=True)
def _interpret_mode():
    os.environ["NRT_PALLAS"] = "interpret"
    yield
    os.environ["NRT_PALLAS"] = ""


def test_fused_lookup_pool_forward():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    table = table.at[0].set(0.0)
    ids = jnp.asarray(rng.integers(0, 64, (16, 5)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (16, 5)), jnp.float32)
    out = fused_lookup_pool(table, ids, mask)
    ref = reference_lookup_pool(table, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fused_lookup_pool_grad():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((32, 4)), jnp.float32).at[0].set(0.0)
    ids = jnp.asarray(rng.integers(0, 32, (8, 6)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (8, 6)), jnp.float32)

    def f_fused(t):
        return jnp.sum(fused_lookup_pool(t, ids, mask) ** 2)

    def f_ref(t):
        return jnp.sum(reference_lookup_pool(t, ids, mask) ** 2)

    g_fused = jax.grad(f_fused)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
    # padding row gets zero grad
    np.testing.assert_allclose(np.asarray(g_fused[0]), 0.0)


def test_scatter_rows_sorted_parity():
    """Pallas touched-slab scatter == XLA .at[rows].set on the contract
    inputs: rows non-decreasing, duplicates carrying identical values."""
    from news_recsys_tpu.ops.scatter_rows import scatter_rows_set

    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.standard_normal((256, 32)), jnp.float32)
    rows = np.sort(rng.integers(0, 256, 40)).astype(np.int32)
    rows[7] = rows[6]                      # duplicates (identical values)
    vals = rng.standard_normal((40, 32)).astype(np.float32)
    vals[7] = vals[6]
    # table is donated — hand each call its own copy
    out_xla = scatter_rows_set(jnp.array(table), jnp.asarray(rows), jnp.asarray(vals))
    out_pl = scatter_rows_set(jnp.array(table), jnp.asarray(rows), jnp.asarray(vals),
                              use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_pl), np.asarray(out_xla))


def test_scatter_rows_unsorted_asserts():
    """Interpret mode enforces the sortedness contract (compiled mode would
    silently corrupt revisited slabs)."""
    from news_recsys_tpu.ops.scatter_rows import scatter_rows_set

    table = jnp.zeros((64, 16), jnp.float32)
    rows = jnp.asarray([9, 3], jnp.int32)          # decreasing
    vals = jnp.ones((2, 16), jnp.float32)
    with pytest.raises(Exception):
        jax.block_until_ready(
            scatter_rows_set(table, rows, vals, use_pallas=True, interpret=True))


def _sparse_cfg(optimizer):
    from news_recsys_tpu.config import config_from_dict
    feats = ["user_id", "item_id"]
    return config_from_dict({
        "name": "deep",
        "features": {"sparse_feature_names": feats,
                     "item_feature_names": ["item_id"], "user_feature_names": ["user_id"]},
        "embeddings": {"embedding_size": {k: 16 for k in feats},
                       "embedding_table_size": {"user_id": 5000, "item_id": 5000}},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 2, "lr": 1e-2, "min_lr": 1e-3,
                          "lr_milestones": [100, 200], "max_step": 10000,
                          "embedding_optimizer": optimizer},
    })


@pytest.mark.parametrize("optimizer", ["rowwise_adagrad", "sparse_adamw"])
def test_sparse_train_pallas_scatter_parity(optimizer, tmp_path):
    """End-to-end sparse training with the Pallas scatter (sorted dedup
    layout) produces the SAME tables as the XLA scatter path."""
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer

    rng = np.random.default_rng(5)
    n = 256
    ds = PackedDataset({
        "user_id": rng.integers(1, 5000, n).astype(np.int32),
        "item_id": rng.integers(1, 5000, n).astype(np.int32),
        "label": (rng.random(n) < 0.3).astype(np.float32).reshape(-1, 1),
    })
    cfg = _sparse_cfg(optimizer)

    tables = {}
    for mode in ("", "interpret"):
        os.environ["NRT_PALLAS"] = mode
        model = build_ranker(cfg, "deep")
        t = Trainer(cfg, model, workdir=str(tmp_path / (mode or "off")),
                    use_mesh=False)
        s = t.fit(ds, max_epochs=2)
        tables[mode] = jax.device_get(s.params["params"]["embedder"])
    for name in tables[""]:
        # compare the ADDRESSABLE rows (ids are always < vocab): the two
        # layouts route zero-grad filler slots to different unreadable
        # padding rows above the vocab, which AdamW weight-decay perturbs
        np.testing.assert_allclose(tables["interpret"][name][:5000],
                                   tables[""][name][:5000],
                                   atol=1e-7, err_msg=name)


def test_fused_pool_wired_into_model(tmp_path):
    """EmbeddingCollection routes pooled array features through the Pallas
    fused lookup+pool kernel under the NRT_PALLAS gate, with identical
    predictions to the XLA path."""
    from news_recsys_tpu.config import config_from_dict
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.ops import fused_lookup_pool as flp_mod

    feats = ["user_id", "item_id"]
    cfg = config_from_dict({
        "name": "deep",
        "features": {"feature_names": feats + ["hist"],
                     "sparse_feature_names": feats,
                     "array_feature_names": ["hist"],
                     "item_feature_names": ["item_id"],
                     "user_feature_names": ["user_id", "hist"],
                     "array_max_length": {"hist": 6}},
        "embeddings": {"embedding_size": {k: 16 for k in feats},
                       "embedding_table_size": {"user_id": 200, "item_id": 400},
                       "share_emb_table_features": {"hist": "item_id"}},
        "dataset": {"batch_size": 32},
        "train_hparams": {"max_epoch": 1, "lr": 1e-2, "min_lr": 1e-3,
                          "lr_milestones": [100, 200], "max_step": 1000},
    })
    rng = np.random.default_rng(6)
    hist = rng.integers(0, 400, (32, 6)).astype(np.int32)
    batch = {
        "user_id": rng.integers(1, 200, 32).astype(np.int32),
        "item_id": rng.integers(1, 400, 32).astype(np.int32),
        "hist": hist,
        "hist_mask": (hist != 0).astype(np.float32),
        "label": (rng.random(32) < 0.3).astype(np.float32).reshape(-1, 1),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_ranker(cfg, "deep")
    params = model.init(jax.random.PRNGKey(0), batch)

    calls = []
    real = flp_mod.fused_lookup_pool

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    os.environ["NRT_PALLAS"] = ""
    out_off = model.apply(params, batch)
    flp_mod.fused_lookup_pool = spy
    try:
        os.environ["NRT_PALLAS"] = "interpret"
        out_on = model.apply(params, batch)
    finally:
        flp_mod.fused_lookup_pool = real
    assert calls, "fused_lookup_pool was not used with NRT_PALLAS set"
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=1e-5, atol=1e-6)


def test_fm_second_order():
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((256, 5, 15)), jnp.float32)
    out = fm_second_order(v)
    sum_v = jnp.sum(v, axis=1)
    ref = 0.5 * jnp.sum(sum_v**2 - jnp.sum(v**2, axis=1), axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    g = jax.grad(lambda v: jnp.sum(fm_second_order(v) ** 2))(v)
    g_ref = jax.grad(lambda v: jnp.sum((0.5 * jnp.sum(jnp.sum(v, 1)**2 - jnp.sum(v**2, 1), 1)) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-3)


def test_dcn_cross_stack():
    rng = np.random.default_rng(3)
    B, D, NL = 128, 16, 3
    x0 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((NL, D)) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.standard_normal((NL, D)) * 0.1, jnp.float32)

    out = dcn_cross_stack(x0, ws, bs)
    ref = reference_cross_stack(x0, ws, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # gradient parity vs autodiff through the reference formulation
    def f(x0, ws, bs):
        return jnp.sum(dcn_cross_stack(x0, ws, bs) ** 2)

    def f_ref(x0, ws, bs):
        return jnp.sum(reference_cross_stack(x0, ws, bs) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(x0, ws, bs)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x0, ws, bs)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)
