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


def test_device_no_warm_set():
    rng = np.random.default_rng(1)
    uids, scores, labels, _ = _make(rng, n=1000, n_users=60)
    host = compute_user_metrics(uids, scores, labels, None)
    dev = compute_user_metrics_device(uids, scores, labels, None)
    for key, val in host["Overall"].items():
        assert dev["Overall"][key] == pytest.approx(val, abs=2e-5), key
    assert dev["Cold_Start"]["User_Count"] == 0
