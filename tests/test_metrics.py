"""Metric engine parity tests vs a line-by-line transliteration of the
reference's validation loop (base_model.py:333-492), including tie handling."""

import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from news_recsys_tpu.training.metrics import (
    compute_user_metrics,
    format_validation_block,
    pooled_auc,
    pooled_logloss,
)


def reference_metrics(user_ids, scores, labels, warm_user_set, k=10):
    """Direct transliteration of the reference loop semantics."""
    user_scores = {}
    for uid, s, l in zip(user_ids, scores, labels):
        user_scores.setdefault(uid, []).append((s, l))

    all_preds, all_labels = [], []
    warm_preds, warm_labels, cold_preds, cold_labels = [], [], [], []
    m_all = {"auc": [], "ndcg": [], "hr": [], "mrr": []}
    m_warm = {"auc": [], "ndcg": [], "hr": [], "mrr": []}
    m_cold = {"auc": [], "ndcg": [], "hr": [], "mrr": []}

    for uid, items in user_scores.items():
        preds = [x[0] for x in items]
        labs = [x[1] for x in items]
        all_preds.extend(preds)
        all_labels.extend(labs)
        is_cold = warm_user_set is not None and uid not in warm_user_set
        (cold_preds if is_cold else warm_preds).extend(preds)
        (cold_labels if is_cold else warm_labels).extend(labs)
        tgt = m_cold if is_cold else m_warm

        if len(set(labs)) > 1:
            auc = roc_auc_score(labs, preds)
            m_all["auc"].append(auc)
            tgt["auc"].append(auc)

        sorted_items = sorted(items, key=lambda x: x[0], reverse=True)
        top_k = sorted_items[:k]
        num_pos = sum(1 for x in items if x[1] == 1)
        if num_pos == 0:
            for m in (m_all, tgt):
                m["hr"].append(0.0)
                m["ndcg"].append(0.0)
                m["mrr"].append(0.0)
            continue
        hr = 1.0 if any(x[1] == 1 for x in top_k) else 0.0
        m_all["hr"].append(hr)
        tgt["hr"].append(hr)
        dcg = sum(1.0 / np.log2(r + 1) for r, (_, l) in enumerate(top_k, 1) if l == 1)
        idcg = sum(1.0 / np.log2(r + 1) for r in range(1, min(num_pos, k) + 1))
        ndcg = dcg / idcg if idcg > 0 else 0.0
        m_all["ndcg"].append(ndcg)
        tgt["ndcg"].append(ndcg)
        mrr = 0.0
        for r, (_, l) in enumerate(top_k, 1):
            if l == 1:
                mrr = 1.0 / r
                break
        m_all["mrr"].append(mrr)
        tgt["mrr"].append(mrr)

    def mean(l):
        return float(np.mean(l)) if l else 0.0

    def auc_ll(preds, labs):
        auc, ll = 0.0, 0.0
        if preds:
            if len(set(labs)) > 1:
                auc = roc_auc_score(labs, preds)
            eps = 1e-15
            p = np.clip(preds, eps, 1 - eps)
            y = np.array(labs)
            ll = float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))
        return auc, ll

    oa, ol = auc_ll(all_preds, all_labels)
    wa, wl = auc_ll(warm_preds, warm_labels)
    ca, cl = auc_ll(cold_preds, cold_labels)
    return {
        "Overall": {"AUC": oa, "LogLoss": ol, "GAUC": mean(m_all["auc"]),
                    f"NDCG@{k}": mean(m_all["ndcg"]), f"HR@{k}": mean(m_all["hr"]),
                    f"MRR@{k}": mean(m_all["mrr"])},
        "Warm_Start": {"AUC": wa, "LogLoss": wl, "GAUC": mean(m_warm["auc"]),
                       f"NDCG@{k}": mean(m_warm["ndcg"]), f"HR@{k}": mean(m_warm["hr"]),
                       f"MRR@{k}": mean(m_warm["mrr"]), "User_Count": len(m_warm["hr"])},
        "Cold_Start": {"AUC": ca, "LogLoss": cl, "GAUC": mean(m_cold["auc"]),
                       f"NDCG@{k}": mean(m_cold["ndcg"]), f"HR@{k}": mean(m_cold["hr"]),
                       f"MRR@{k}": mean(m_cold["mrr"]), "User_Count": len(m_cold["hr"])},
    }


def _make_data(rng, n=5000, n_users=300, quantize=None):
    uids = rng.integers(1, n_users + 1, n)
    scores = rng.random(n)
    if quantize:
        scores = np.round(scores * quantize) / quantize  # force ties
    labels = (rng.random(n) < 0.1).astype(np.float64)
    warm = set(int(u) for u in rng.choice(np.arange(1, n_users + 1), n_users // 2, replace=False))
    return uids, scores, labels, warm


@pytest.mark.parametrize("quantize", [None, 8])
def test_parity_with_reference_loop(quantize):
    rng = np.random.default_rng(0)
    uids, scores, labels, warm = _make_data(rng, quantize=quantize)
    ours = compute_user_metrics(uids, scores, labels, warm)
    ref = reference_metrics(list(uids), list(scores), list(labels), warm)
    for cohort in ("Overall", "Warm_Start", "Cold_Start"):
        for key, val in ref[cohort].items():
            assert ours[cohort][key] == pytest.approx(val, abs=1e-10), (cohort, key)


def test_quantized_ties_topk_order():
    # Heavy ties: only 3 distinct scores. Stable order must match Python sorted().
    rng = np.random.default_rng(1)
    uids, scores, labels, warm = _make_data(rng, n=2000, n_users=50, quantize=3)
    ours = compute_user_metrics(uids, scores, labels, warm)
    ref = reference_metrics(list(uids), list(scores), list(labels), warm)
    for key, val in ref["Overall"].items():
        assert ours["Overall"][key] == pytest.approx(val, abs=1e-10), key


def test_pooled_auc_matches_sklearn():
    rng = np.random.default_rng(2)
    y = (rng.random(1000) < 0.3).astype(int)
    s = np.round(rng.random(1000) * 20) / 20
    assert pooled_auc(y, s) == pytest.approx(roc_auc_score(y, s), abs=1e-12)


def test_single_class_user_and_empty():
    # one user, all negatives
    res = compute_user_metrics(np.array([5, 5]), np.array([0.3, 0.7]), np.array([0.0, 0.0]), None)
    assert res["Overall"]["GAUC"] == 0.0
    assert res["Overall"]["HR@10"] == 0.0
    assert res["Warm_Start"]["User_Count"] == 1
    res = compute_user_metrics(np.array([]), np.array([]), np.array([]), set())
    assert res["Overall"]["AUC"] == 0.0


def test_format_block():
    rng = np.random.default_rng(3)
    uids, scores, labels, warm = _make_data(rng, n=500, n_users=40)
    res = compute_user_metrics(uids, scores, labels, warm)
    block = format_validation_block(res, epoch=3)
    assert "Epoch 3 Validation Results" in block
    assert "Warm Start Users" in block and "Cold Start Users" in block
    assert "NDCG@10" in block


def test_binned_auc_hist_onehot_exact():
    """The one-hot-matmul histogram must equal a numpy bincount exactly
    (weights are 0/1 so the f32 matmul sum is exact), and the streaming
    AUC estimate must track sklearn within bin resolution."""
    import jax.numpy as jnp

    from news_recsys_tpu.training.trainer import (
        AUC_BINS, AucHist, binned_auc_update, binned_auc_value)

    rng = np.random.default_rng(11)
    hist = AucHist.zeros()
    all_p, all_l = [], []
    for _ in range(4):
        probs = rng.random(512).astype(np.float32)
        labels = (rng.random(512) < 0.3).astype(np.float32)
        weights = (rng.random(512) < 0.9).astype(np.float32)
        hist = binned_auc_update(hist, jnp.asarray(probs), jnp.asarray(labels),
                                 jnp.asarray(weights))
        all_p.append(probs); all_l.append((labels, weights))
        bins = np.clip((probs * AUC_BINS).astype(np.int64), 0, AUC_BINS - 1)
        ref_pos = np.bincount(bins, weights * labels, minlength=AUC_BINS)
        ref_neg = np.bincount(bins, weights * (1 - labels), minlength=AUC_BINS)
    # final-state check vs accumulated bincounts
    accum_pos = np.zeros(AUC_BINS); accum_neg = np.zeros(AUC_BINS)
    for probs, (labels, weights) in zip(all_p, all_l):
        bins = np.clip((probs * AUC_BINS).astype(np.int64), 0, AUC_BINS - 1)
        accum_pos += np.bincount(bins, weights * labels, minlength=AUC_BINS)
        accum_neg += np.bincount(bins, weights * (1 - labels), minlength=AUC_BINS)
    np.testing.assert_array_equal(np.asarray(hist.pos), accum_pos)
    np.testing.assert_array_equal(np.asarray(hist.neg), accum_neg)

    from sklearn.metrics import roc_auc_score
    p = np.concatenate(all_p)
    l = np.concatenate([x for x, _ in all_l])
    w = np.concatenate([x for _, x in all_l])
    ref = roc_auc_score(l[w > 0], p[w > 0])
    assert abs(float(binned_auc_value(hist)) - ref) < 2e-3
