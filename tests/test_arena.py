"""Arena table packing (embeddings.arena_tables): same-dim large tables in
one physical parameter, logical ids offset per feature.

Equivalence is at the FUNCTION level: with params mapped between layouts
(arena rows [off+1, off+vocab) = logical rows [1, vocab)), forward outputs
and parameter gradients are identical — packing is a pure storage layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from news_recsys_tpu.config import arena_layout, config_from_dict, table_specs
from news_recsys_tpu.data.packed_dataset import PackedDataset
from news_recsys_tpu.models.embedding import padded_vocab
from news_recsys_tpu.models.rankers import build_ranker
from news_recsys_tpu.training.trainer import Trainer

FEATS = ["user_id", "item_id", "category"]
VOCABS = {"user_id": 5000, "item_id": 4300, "category": 20}


def make_cfg(arena: bool, lr=5e-3, optimizer="rowwise_adagrad"):
    return config_from_dict({
        "name": "deep",
        "features": {"sparse_feature_names": FEATS,
                     "item_feature_names": ["item_id", "category"],
                     "user_feature_names": ["user_id"]},
        "embeddings": {"embedding_size": {k: 16 for k in FEATS},
                       "embedding_table_size": dict(VOCABS),
                       "arena_tables": arena},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 3, "lr": lr, "min_lr": 1e-3,
                          "lr_milestones": [200, 600], "max_step": 100000,
                          "embedding_optimizer": optimizer},
    })


def make_ds(n=1024, seed=0):
    rng = np.random.default_rng(seed)
    users = rng.integers(1, VOCABS["user_id"], n).astype(np.int32)
    items = rng.integers(1, VOCABS["item_id"], n).astype(np.int32)
    cats = (items % 19 + 1).astype(np.int32)
    labels = (((users % 2) == (items % 2)) ^ (rng.random(n) < 0.1)).astype(np.float32)
    return PackedDataset({"user_id": users, "item_id": items, "category": cats,
                          "label": labels.reshape(-1, 1)})


def map_params_to_arena(cfg_on, params_off, params_on):
    """Copy the per-table params into the arena layout (row 0 = padding)."""
    layout = arena_layout(cfg_on)
    arena_specs = table_specs(cfg_on)
    emb_off = params_off["params"]["embedder"]
    emb_on = dict(params_on["params"]["embedder"])
    for aname in {a for a, _, _ in layout.values()}:
        arena = jnp.zeros((padded_vocab(arena_specs[aname][0]),
                           arena_specs[aname][1]), jnp.float32)
        for lname, (an, off, _) in layout.items():
            if an != aname:
                continue
            vocab = VOCABS[lname]
            arena = arena.at[off + 1: off + vocab].set(emb_off[lname][1:vocab])
        emb_on[aname] = arena
    for lname in emb_off:
        if lname not in layout:
            emb_on[lname] = emb_off[lname]
    # dense tower params are layout-independent: copy them from the
    # per-table model so BOTH nets are the same function
    return {"params": {**params_off["params"], "embedder": emb_on}}


def test_arena_layout_shapes():
    cfg = make_cfg(True)
    layout = arena_layout(cfg)
    assert set(layout) == {"user_id", "item_id"}   # category < ARENA_MIN_VOCAB
    specs = table_specs(cfg)
    assert "arena_d16" in specs and "category" in specs
    assert specs["arena_d16"][0] == 1 + (5000 - 1) + (4300 - 1)
    offs = {layout["item_id"][1], layout["user_id"][1]}
    assert 0 in offs and len(offs) == 2


def test_arena_forward_and_grad_equivalence():
    cfg_off, cfg_on = make_cfg(False), make_cfg(True)
    m_off, m_on = build_ranker(cfg_off, "deep"), build_ranker(cfg_on, "deep")
    ds = make_ds(256)
    batch = {k: jnp.asarray(v[:64]) for k, v in ds.arrays.items()}
    p_off = m_off.init(jax.random.PRNGKey(0), batch)
    p_on = map_params_to_arena(cfg_on, p_off, m_on.init(jax.random.PRNGKey(1), batch))

    y_off = m_off.apply(p_off, batch)
    y_on = m_on.apply(p_on, batch)
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_on),
                               rtol=1e-6, atol=1e-6)

    labels = batch["label"][:, 0]

    def loss(model, p):
        return optax.sigmoid_binary_cross_entropy(model.apply(p, batch), labels).mean()

    g_off = jax.grad(lambda p: loss(m_off, p))(p_off)
    g_on = jax.grad(lambda p: loss(m_on, p))(p_on)
    layout = arena_layout(cfg_on)
    emb_g_off = g_off["params"]["embedder"]
    emb_g_on = g_on["params"]["embedder"]
    for lname, (aname, off, _) in layout.items():
        vocab = VOCABS[lname]
        np.testing.assert_allclose(
            np.asarray(emb_g_on[aname][off + 1: off + vocab]),
            np.asarray(emb_g_off[lname][1:vocab]),
            rtol=1e-5, atol=1e-7, err_msg=lname)
    # dense tower grads identical too
    for k in g_off["params"]:
        if k == "embedder":
            continue
        a = jax.tree.leaves(g_off["params"][k])
        b = jax.tree.leaves(g_on["params"][k])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("optimizer", ["rowwise_adagrad", "sparse_adamw", "adamw"])
def test_arena_trainer_learns(tmp_path, optimizer):
    """Full Trainer epochs with arena packing on: the whole sparse path
    (joint dedup / dense route / matmul dedup, arena vocab bounds) runs and
    the model learns."""
    from news_recsys_tpu.training.metrics import pooled_auc

    cfg = make_cfg(True, optimizer=optimizer)
    model = build_ranker(cfg, "deep")
    ds = make_ds(2048)
    tr = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    state = tr.fit(ds, max_epochs=3)
    preds = tr.predict(state.params, ds)
    auc = pooled_auc(ds.arrays["label"][:, 0], np.asarray(preds))
    assert auc > 0.62, auc


def test_arena_with_data_parallel_mesh(tmp_path):
    """Arena packing under a DP mesh matches its own single-device run."""
    from news_recsys_tpu.parallel.mesh import make_mesh

    cfg = make_cfg(True, optimizer="rowwise_adagrad")
    model = build_ranker(cfg, "deep")
    ds = make_ds(512)
    t1 = Trainer(cfg, model, workdir=str(tmp_path / "s"), use_mesh=False)
    p1 = t1.predict(t1.fit(ds, max_epochs=1).params, ds)
    mesh = make_mesh(data=8, model=1)
    t2 = Trainer(cfg, model, workdir=str(tmp_path / "m"), mesh=mesh)
    p2 = t2.predict(t2.fit(ds, max_epochs=1).params, ds)
    np.testing.assert_allclose(p1, p2, atol=2e-4)


def test_arena_with_model_parallel_mesh(tmp_path):
    """Arena param row-shards over the model axis (padded vocab is a
    multiple of 128, so it divides any power-of-two axis) and the
    shard-local scatter update runs."""
    from news_recsys_tpu.parallel.mesh import make_mesh

    cfg = make_cfg(True, optimizer="rowwise_adagrad")
    model = build_ranker(cfg, "deep")
    ds = make_ds(512)
    mesh = make_mesh(data=4, model=2)
    tr = Trainer(cfg, model, workdir=str(tmp_path), mesh=mesh)
    state = tr.fit(ds, max_epochs=1)
    preds = tr.predict(state.params, ds)
    assert np.isfinite(np.asarray(preds)).all()


def test_arena_oob_id_clamps_to_padding(tmp_path):
    """A corrupt logical id >= the member's OWN vocab must clamp to padding:
    forward reads zeros, and a training step never writes another member's
    rows. (Pre-arena, per-table bounds confined OOB ids to the feature's
    own table.)"""
    cfg = make_cfg(True)
    model = build_ranker(cfg, "deep")
    ds = make_ds(64)
    batch = {k: jnp.asarray(v[:64]) for k, v in ds.arrays.items()}
    params = model.init(jax.random.PRNGKey(0), batch)

    # forward: item_id at its own vocab bound (4300) would land at
    # user rows without the clamp; it must equal the padding-id forward
    bad = dict(batch)
    bad["item_id"] = batch["item_id"].at[0].set(VOCABS["item_id"])
    pad = dict(batch)
    pad["item_id"] = batch["item_id"].at[0].set(0)
    np.testing.assert_allclose(np.asarray(model.apply(params, bad)),
                               np.asarray(model.apply(params, pad)),
                               rtol=1e-6, atol=1e-6)

    # training: one epoch whose item ids are ALL out of range; the other
    # member's (user_id) arena rows that no user id touches must stay
    # bit-identical, and no NaNs appear
    from news_recsys_tpu.config import arena_layout as _al
    layout = _al(cfg)
    aname, uoff, _ = layout["user_id"]
    rng = np.random.default_rng(3)
    n = 128
    users = rng.integers(1, 100, n).astype(np.int32)     # touch rows uoff+1..uoff+99
    items = np.full(n, VOCABS["item_id"] + 5, np.int32)  # every item id corrupt
    ds_bad = PackedDataset({
        "user_id": users, "item_id": items,
        "category": (users % 19 + 1).astype(np.int32),
        "label": (users % 2).astype(np.float32).reshape(-1, 1)})
    tr = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    state = tr.init_state(ds_bad.take(np.arange(64)))
    a0 = np.asarray(state.params["params"]["embedder"][aname]).copy()
    state = tr.fit(ds_bad, max_epochs=1, state=state)
    a1 = np.asarray(state.params["params"]["embedder"][aname])
    ioff = layout["item_id"][1]
    ivocab = VOCABS["item_id"]
    # the item member's whole real-row range untouched (its ids were corrupt)
    np.testing.assert_array_equal(a1[ioff + 1: ioff + ivocab],
                                  a0[ioff + 1: ioff + ivocab])
    # user rows above 100 untouched
    np.testing.assert_array_equal(a1[uoff + 100: uoff + VOCABS["user_id"]],
                                  a0[uoff + 100: uoff + VOCABS["user_id"]])
    assert np.isfinite(a1).all()


def test_arena_bf16_trainer_learns(tmp_path):
    """bf16 table storage + arena packing (the bench bf16 line's combo):
    stochastic-rounded write-back over the packed param, model learns."""
    import dataclasses

    from news_recsys_tpu.training.metrics import pooled_auc

    cfg = make_cfg(True, lr=5e-3)
    cfg = dataclasses.replace(cfg, mesh=dataclasses.replace(
        cfg.mesh, param_dtype="bfloat16"))
    model = build_ranker(cfg, "deep")
    ds = make_ds()
    tr = Trainer(cfg, model, workdir=str(tmp_path), use_mesh=False)
    state = tr.fit(ds, max_epochs=3)
    import jax.numpy as jnp
    assert state.params["params"]["embedder"]["arena_d16"].dtype == jnp.bfloat16
    auc = pooled_auc(ds.arrays["label"][:, 0], tr.predict(state.params, ds))
    assert auc > 0.75, auc   # bf16 write-back costs a little vs fp32's ~0.85


def test_arena_excludes_array_feature_tables():
    """Tables backing array features never pack (their B*L slots would put
    the whole arena on the dense full-table route — measured 2.3x slower on
    the attention ranker)."""
    from news_recsys_tpu.config import arena_layout, config_from_dict

    cfg = config_from_dict({
        "name": "attention",
        "features": {"sparse_feature_names": ["user_id", "item_id"],
                     "array_feature_names": ["hist"],
                     "item_feature_names": ["item_id"],
                     "user_feature_names": ["user_id", "hist"],
                     "array_max_length": {"hist": 8}},
        "embeddings": {"embedding_size": {"user_id": 32, "item_id": 32},
                       "embedding_table_size": {"user_id": 94058, "item_id": 65239},
                       "share_emb_table_features": {"hist": "item_id"},
                       "arena_tables": True},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 1, "lr": 1e-3, "min_lr": 1e-4,
                          "lr_milestones": [100, 200], "max_step": 1000},
    })
    # item_id backs the hist array feature -> excluded; user_id alone
    # cannot form an arena -> no packing at all
    assert arena_layout(cfg) == {}
