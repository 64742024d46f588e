"""Device metric engine parity vs the (reference-parity-tested) host engine."""

import numpy as np
import pytest

from news_recsys_tpu.training.metrics import compute_user_metrics
from news_recsys_tpu.training.metrics_device import compute_user_metrics_device


def _make(rng, n=4000, n_users=250, quantize=None):
    uids = rng.integers(1, n_users + 1, n)
    scores = rng.random(n)
    if quantize:
        scores = np.round(scores * quantize) / quantize
    labels = (rng.random(n) < 0.12).astype(np.float64)
    warm = set(int(u) for u in rng.choice(np.arange(1, n_users + 1), n_users // 2, replace=False))
    return uids, scores, labels, warm


@pytest.mark.parametrize("quantize", [None, 6])
def test_device_matches_host(quantize):
    rng = np.random.default_rng(0)
    uids, scores, labels, warm = _make(rng, quantize=quantize)
    host = compute_user_metrics(uids, scores, labels, warm)
    dev = compute_user_metrics_device(uids, scores, labels, warm)
    for cohort in ("Overall", "Warm_Start", "Cold_Start"):
        for key, val in host[cohort].items():
            assert dev[cohort][key] == pytest.approx(val, abs=2e-5), (cohort, key)


def test_device_matches_host_large_n():
    """MIND-dev-scale parity (~2.6M rows): at this size the global positive
    rank sum reaches ~1e12 where f32 ulp is ~1e5, so pooled AUC/LogLoss are
    finalized on host in f64 — this test pins that down. Ties included
    (quantized scores); a few heavy users (~30k rows) stress the per-user
    f32 rank sums too."""
    rng = np.random.default_rng(7)
    n = 2_600_000
    n_users = 120_000
    uids = rng.integers(1, n_users + 1, n)
    uids[: 150_000] = rng.integers(1, 6, 150_000)    # heavy users: ~30k rows each
    scores = np.round(rng.random(n) * 50_000) / 50_000      # ties
    labels = (rng.random(n) < 0.08).astype(np.float64)
    warm = set(range(1, n_users // 2))
    host = compute_user_metrics(uids, scores, labels, warm)
    dev = compute_user_metrics_device(uids, scores, labels, warm)
    for cohort in ("Overall", "Warm_Start", "Cold_Start"):
        for key, val in host[cohort].items():
            # AUC/LogLoss share the host engine's f64 code path; the residual
            # 1e-8-scale difference is f64 summation order (sorted vs raw).
            tol = 0 if key == "User_Count" else (
                1e-7 if key in ("AUC", "LogLoss") else 1e-6)
            assert dev[cohort][key] == pytest.approx(val, abs=tol), (cohort, key)


def test_device_no_warm_set():
    rng = np.random.default_rng(1)
    uids, scores, labels, _ = _make(rng, n=1000, n_users=60)
    host = compute_user_metrics(uids, scores, labels, None)
    dev = compute_user_metrics_device(uids, scores, labels, None)
    for key, val in host["Overall"].items():
        assert dev["Overall"][key] == pytest.approx(val, abs=2e-5), key
    assert dev["Cold_Start"]["User_Count"] == 0


def test_device_engine_under_mesh_validate(tmp_path):
    """validate() routes to the device metric engine under a 4x2 mesh
    (regression: it was gated `mesh is None`), with host-engine parity."""
    import dataclasses

    import numpy as np

    from news_recsys_tpu.config import config_from_dict
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.parallel.mesh import make_mesh
    from news_recsys_tpu.training.metrics import compute_user_metrics
    from news_recsys_tpu.training.trainer import Trainer

    feats = ["user_id", "item_id"]
    cfg = config_from_dict({
        "name": "deep",
        "features": {"sparse_feature_names": feats,
                     "item_feature_names": ["item_id"], "user_feature_names": ["user_id"]},
        "embeddings": {"embedding_size": {k: 8 for k in feats},
                       "embedding_table_size": {"user_id": 100, "item_id": 200}},
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 1, "lr": 1e-2, "min_lr": 1e-3,
                          "lr_milestones": [100, 200], "max_step": 1000,
                          "device_metrics_min_rows": 0},
    })
    rng = np.random.default_rng(0)
    n = 512
    ds = PackedDataset({
        "user_id": rng.integers(1, 100, n).astype(np.int32),
        "item_id": rng.integers(1, 200, n).astype(np.int32),
        "label": (rng.random(n) < 0.3).astype(np.float32).reshape(-1, 1),
    })
    model = build_ranker(cfg, "deep")
    mesh = make_mesh(data=4, model=2)
    t = Trainer(cfg, model, workdir=str(tmp_path), mesh=mesh)
    state = t.fit(ds, max_epochs=1)

    calls = []
    from news_recsys_tpu.training import metrics_device
    real = metrics_device.compute_user_metrics_device

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    metrics_device.compute_user_metrics_device = spy
    try:
        res_dev = t.validate(state, ds, epoch=0, warm_user_set={1, 2, 3})
    finally:
        metrics_device.compute_user_metrics_device = real
    assert calls, "device metric engine was not used under the mesh"

    scores = t.predict(state.params, ds)
    res_host = compute_user_metrics(ds.arrays["user_id"], scores,
                                    ds.arrays["label"][:, 0], {1, 2, 3})
    for cohort in ("Overall", "Warm_Start", "Cold_Start"):
        for metric, v in res_host[cohort].items():
            assert abs(res_dev[cohort][metric] - v) < 1e-4, (cohort, metric)
