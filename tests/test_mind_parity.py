"""mind_parity harness: the reference-table metric function."""

import sys

import numpy as np

sys.path.insert(0, "scripts")

from mind_parity import per_user_ranking_metrics  # noqa: E402


def test_per_user_ranking_metrics_hand_computed():
    # user 1: scores [.9,.8,.7] labels [0,1,0] -> first pos rank 2:
    #   MRR 1/2; nDCG@5 = nDCG@10 = 1/log2(3) / (1/log2(2)) = 0.6309
    # user 2: pos at rank 1 -> MRR 1, nDCG 1
    # user 3: no positives -> all 0
    uids = np.array([1, 1, 1, 2, 2, 3, 3], np.int64)
    scores = np.array([.9, .8, .7, .6, .5, .4, .3], np.float32)
    labels = np.array([0, 1, 0, 1, 0, 0, 0], np.float32)
    m = per_user_ranking_metrics(uids, scores, labels)
    np.testing.assert_allclose(m["MRR"], (0.5 + 1.0 + 0.0) / 3, atol=1e-6)
    ndcg_u1 = (1 / np.log2(3)) / (1 / np.log2(2))
    np.testing.assert_allclose(m["nDCG@5"], (ndcg_u1 + 1.0 + 0.0) / 3, atol=1e-6)
    np.testing.assert_allclose(m["nDCG@10"], m["nDCG@5"], atol=1e-9)


def test_per_user_metrics_match_engine_ndcg10():
    """nDCG@10 from the harness == the metric engine's NDCG@10 on random
    data (same per-user grouping and formulas)."""
    from news_recsys_tpu.training.metrics import compute_user_metrics

    rng = np.random.default_rng(0)
    n = 5000
    uids = rng.integers(1, 300, n).astype(np.int64)
    scores = rng.random(n).astype(np.float32)
    labels = (rng.random(n) < 0.2).astype(np.float32)
    m = per_user_ranking_metrics(uids, scores, labels)
    ref = compute_user_metrics(uids, scores, labels, None)
    np.testing.assert_allclose(m["nDCG@10"], ref["Overall"]["NDCG@10"], atol=1e-6)
    np.testing.assert_allclose(m["AUC"], ref["Overall"]["AUC"], atol=1e-6)
    np.testing.assert_allclose(m["MRR"], ref["Overall"]["MRR@10"], atol=1e-6)
