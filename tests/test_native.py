"""Native C++ component tests: ANN top-k and the text-format parser."""

import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.native import (HostTopKSearcher, load_ann,
                                    parse_text_features_native)

pytestmark = pytest.mark.skipif(load_ann() is None, reason="no native toolchain")


def test_host_topk_matches_numpy():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((1000, 24)).astype(np.float32)
    queries = rng.standard_normal((64, 24)).astype(np.float32)
    s = HostTopKSearcher()
    s.update_embedding(corpus)
    idx, scores = s.search(queries, k=7)

    ref = queries @ corpus.T
    ref_idx = np.argsort(-ref, axis=1, kind="stable")[:, :7]
    ref_scores = np.take_along_axis(ref, ref_idx, axis=1)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5)
    for r in range(64):
        assert set(idx[r]) == set(ref_idx[r]), r
    # scores sorted descending
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_host_topk_normalized():
    rng = np.random.default_rng(1)
    corpus = rng.standard_normal((200, 8)).astype(np.float32)
    queries = corpus[:5] * 3.0  # same direction, scaled
    s = HostTopKSearcher(normalize=True)
    s.update_embedding(corpus)
    idx, scores = s.search(queries, k=1)
    np.testing.assert_array_equal(idx[:, 0], np.arange(5))
    np.testing.assert_allclose(scores[:, 0], 1.0, atol=1e-5)


def test_host_topk_k_exceeds_n():
    s = HostTopKSearcher()
    s.update_embedding(np.eye(3, dtype=np.float32))
    idx, scores = s.search(np.eye(3, dtype=np.float32)[:1], k=5)
    assert idx.shape == (1, 5)
    assert (idx[0, 3:] == -1).all()


def test_native_text_parser_matches_python(tmp_path):
    cfg = config_from_dict({
        "features": {
            "sparse_feature_names": ["a", "b"],
            "dense_feature_names": ["d"],
            "array_feature_names": ["h"],
            "array_max_length": {"h": 4},
        },
        "embeddings": {
            "embedding_size": {"a": 4, "b": 4, "h": 4},
            "embedding_table_size": {"a": 10, "b": 10, "h": 10},
        },
    })
    path = tmp_path / "feats.txt"
    path.write_text(
        "a:3 b:7 d:1.5 h:1,2,3\t1\n"
        "a:0 b:2 d:-0.25 h:\t0\n"
        "a:9 b:1 d:100 h:5,6,7,8,9\t1\n"   # array truncated to 4
    )
    native = parse_text_features_native(str(path), cfg)
    assert native is not None

    from news_recsys_tpu.data.text_format import read_text_features
    ref = read_text_features(str(path), cfg)
    assert set(native) == set(ref)
    for k in ref:
        np.testing.assert_allclose(native[k], ref[k], err_msg=k)
