"""End-to-end data pipeline tests on synthetic MIND-format data."""

import json
import os

import numpy as np
import pytest

from news_recsys_tpu.config import config_from_dict
from news_recsys_tpu.data.feature_extraction import FeatureExtractionPipeline, VocabManager
from news_recsys_tpu.data.packed_dataset import PackedDataset, iterate_batches
from news_recsys_tpu.data.preprocess import run_preprocess
from news_recsys_tpu.data.synthetic import generate_mind
from news_recsys_tpu.data.text_format import read_text_features


def make_cfg(tmp):
    return config_from_dict({
        "name": "deep",
        "paths": {"data_path": str(tmp / "raw"), "out_basedir": str(tmp / "out")},
        "features": {
            "feature_names": ["user_id", "item_id", "category", "subcategory", "user_click_category"],
            "sparse_feature_names": ["user_id", "item_id", "category", "subcategory", "user_click_category"],
            "item_feature_names": ["item_id", "category", "subcategory"],
            "user_feature_names": ["user_id", "user_click_category"],
        },
        "embeddings": {
            "embedding_size": {k: 8 for k in ["user_id", "item_id", "category", "subcategory", "user_click_category"]},
            "embedding_table_size": {"user_id": 200, "item_id": 400, "category": 20, "subcategory": 200, "user_click_category": 20},
        },
        "dataset": {"batch_size": 32},
    })


@pytest.fixture(scope="module")
def pipeline_out(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mind")
    generate_mind(str(tmp / "raw"), n_news=120, n_users=60,
                  n_impressions_train=150, n_impressions_dev=60, seed=3)
    cfg = make_cfg(tmp)
    run_preprocess(cfg.paths.data_path, cfg.paths.out_basedir)
    FeatureExtractionPipeline(cfg, write_text=True).run()
    return tmp, cfg


def test_preprocess_outputs(pipeline_out):
    tmp, cfg = pipeline_out
    pre = tmp / "out" / "preprocess"
    for f in ["news_id_map.json", "user_id_map.json", "train_user_ids.json",
              "all_news_preprocess.csv", "train_behaviors_processed.csv", "dev_behaviors_processed.csv"]:
        assert (pre / f).exists(), f

    news_map = json.load(open(pre / "news_id_map.json"))
    # ids contiguous from 1
    ids = sorted(news_map.values())
    assert ids[0] == 1 and ids[-1] == len(ids)

    train_users = json.load(open(pre / "train_user_ids.json"))
    assert len(train_users) > 0
    user_map = json.load(open(pre / "user_id_map.json"))
    assert set(train_users) <= set(user_map.values())

    # exploded behaviors: one row per impression item, 6 columns
    import pandas as pd
    beh = pd.read_csv(pre / "train_behaviors_processed.csv", sep="\t", header=None)
    assert beh.shape[1] == 6
    assert (beh[5].isin([0, 1])).all()          # label column
    assert beh[2].is_monotonic_increasing       # time-sorted


def test_extraction_outputs(pipeline_out):
    tmp, cfg = pipeline_out
    fe = tmp / "out" / "extractored_feature"
    for f in ["train_features.npz", "dev_features.npz", "item_features.npz",
              "original_val_2_embedding_idx_dict.json",
              "embedding_idx_2_original_val_dict.json", "dataset_extract_info.yaml",
              "train_features.txt"]:
        assert (fe / f).exists(), f

    ds = PackedDataset.load(str(fe / "train_features.npz"))
    assert set(ds.arrays) >= {"user_id", "item_id", "category", "subcategory", "user_click_category", "label"}
    assert ds.arrays["label"].shape == (len(ds), 1)
    # vocab ids start at 1, 0 reserved
    assert ds.arrays["category"].min() >= 1


def test_text_format_roundtrip(pipeline_out):
    tmp, cfg = pipeline_out
    fe = tmp / "out" / "extractored_feature"
    packed = PackedDataset.load(str(fe / "train_features.npz"))
    from_text = read_text_features(str(fe / "train_features.txt"), cfg)
    for k in ["user_id", "item_id", "category", "subcategory", "user_click_category"]:
        np.testing.assert_array_equal(packed.arrays[k], from_text[k])
    np.testing.assert_allclose(packed.arrays["label"], from_text["label"])


def test_vocab_roundtrip(pipeline_out):
    tmp, cfg = pipeline_out
    fe = tmp / "out" / "extractored_feature"
    vm = VocabManager.load(str(fe))
    assert vm.size("category") >= 1
    # bidirectional consistency
    for fea, vmap in vm.val2idx.items():
        for val, idx in list(vmap.items())[:5]:
            assert vm.idx2val[fea][idx] == val


def test_user_click_category_matches_streaming(pipeline_out):
    """Vectorized extractor vs a literal per-row transliteration of
    feature_extractor.py:35-55 (argmax count, insertion-order tie-break)."""
    tmp, cfg = pipeline_out
    from news_recsys_tpu.data.feature_extraction import (
        ExtractionContext, EXTRACTORS)

    pipe = FeatureExtractionPipeline(cfg)
    items = pipe._load_items()
    beh = pipe._load_behaviors("train")

    # streaming reference implementation
    vocab_ref = VocabManager(pipe.feature_names, {})
    out_ref = []
    item_cat = items["category"].to_dict()
    for _, row in beh.iterrows():
        counts = {}
        hist = [int(x) for x in str(row["history"]).split(" ")] if str(row["history"]) else []
        for nid in hist:
            cat = item_cat.get(nid, "unknown")
            idx = vocab_ref.get_idx("user_click_category", cat)
            counts[idx] = counts.get(idx, 0) + 1
        if counts:
            out_ref.append(max(counts, key=counts.get))
        else:
            out_ref.append(vocab_ref.get_idx("user_click_category", "unknown"))

    vocab_vec = VocabManager(pipe.feature_names, {})
    ctx = ExtractionContext(beh, items, vocab_vec)
    out_vec = EXTRACTORS["user_click_category"](ctx)

    np.testing.assert_array_equal(np.asarray(out_ref), out_vec)
    assert vocab_ref.val2idx["user_click_category"] == vocab_vec.val2idx["user_click_category"]


def test_batch_iterator():
    ds = PackedDataset({"x": np.arange(100, dtype=np.int32), "label": np.ones((100, 1), np.float32)})
    train_batches = list(iterate_batches(ds, 32, shuffle=True, seed=1))
    assert len(train_batches) == 3  # drop_last
    assert all(b["x"].shape == (32,) for b in train_batches)
    eval_batches = list(iterate_batches(ds, 32, shuffle=False))
    assert len(eval_batches) == 4
    assert eval_batches[-1]["_valid"].sum() == 4  # 100 - 96
    # shuffle determinism per (seed, epoch)
    again = list(iterate_batches(ds, 32, shuffle=True, seed=1))
    np.testing.assert_array_equal(train_batches[0]["x"], again[0]["x"])
    ep2 = list(iterate_batches(ds, 32, shuffle=True, seed=1, epoch=1))
    assert not np.array_equal(train_batches[0]["x"], ep2[0]["x"])


class TestAdversarialMind:
    """Real-MIND text quirks (VERDICT round-1 #10): the full
    preprocess -> fe cascade must survive embedded double quotes (including
    fields starting with a quote), empty abstracts, cross-split duplicate
    news with DIFFERING fields, and guaranteed empty histories."""

    @pytest.fixture(scope="class")
    def adv_out(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("mind_adv")
        generate_mind(str(tmp / "raw"), n_news=120, n_users=60,
                      n_impressions_train=150, n_impressions_dev=60, seed=3,
                      adversarial=True)
        cfg = make_cfg(tmp)
        run_preprocess(cfg.paths.data_path, cfg.paths.out_basedir)
        FeatureExtractionPipeline(cfg).run()
        return tmp, cfg

    def test_id_maps_not_corrupted_by_quotes(self, adv_out):
        # A field starting with '"' must not swallow tabs/newlines: the news
        # map must still contain exactly the generated N ids, contiguous.
        tmp, cfg = adv_out
        news_map = json.load(open(tmp / "out" / "preprocess" / "news_id_map.json"))
        assert len(news_map) == 120
        assert sorted(news_map.values()) == list(range(1, 121))
        assert all(k.startswith("N") for k in news_map)

    def test_dedup_keeps_first_appearance(self, adv_out):
        # duplicate ids across splits with differing titles: merged news must
        # keep the train (first-appearance) copy and stay one row per id.
        import pandas as pd
        tmp, cfg = adv_out
        from news_recsys_tpu.data.preprocess import NEWS_COLS
        merged = pd.read_csv(tmp / "out" / "preprocess" / "all_news_preprocess.csv",
                             sep="\t", names=NEWS_COLS, quoting=3)
        assert merged["news_id"].is_unique
        # item 0 exists in train (first 90%), so its dev-diverged title lost
        row0 = merged[merged["news_id"] == 1].iloc[0]
        assert "DEV-DIVERGED" not in str(row0["title"])
        # but dev-only items (>=90%) keep their (diverged) dev copy
        assert (merged["title"].str.contains("DEV-DIVERGED")).any()

    def test_quoted_titles_roundtrip(self, adv_out):
        import pandas as pd
        tmp, cfg = adv_out
        from news_recsys_tpu.data.preprocess import NEWS_COLS
        merged = pd.read_csv(tmp / "out" / "preprocess" / "all_news_preprocess.csv",
                             sep="\t", names=NEWS_COLS, quoting=3)
        assert merged["title"].str.startswith('"Quoted"').any()
        assert merged["title"].str.contains('said "word').any()

    def test_cascade_features_valid(self, adv_out):
        tmp, cfg = adv_out
        ds = PackedDataset.open_split(cfg, "train")
        n = len(ds.arrays["label"])
        assert n > 0
        for name in ["user_id", "item_id", "category"]:
            assert ds.arrays[name].min() >= 1
            assert ds.arrays[name].max() < cfg.embeddings.embedding_table_size[name]


def test_fe_limit_rows(tmp_path):
    generate_mind(str(tmp_path / "raw"), n_news=80, n_users=40,
                  n_impressions_train=100, n_impressions_dev=40, seed=5)
    cfg = make_cfg(tmp_path)
    run_preprocess(cfg.paths.data_path, cfg.paths.out_basedir)
    FeatureExtractionPipeline(cfg, limit_rows=64).run()
    ds = PackedDataset.open_split(cfg, "train")
    n = len(ds.arrays["label"])
    # the cut snaps DOWN to an impression boundary (never splits a
    # candidate list, which would bias grouped dev metrics)
    assert 0 < n <= 64
    # limited extraction is the head of the full one (time-sorted prefix)
    FeatureExtractionPipeline(cfg).run()
    full = PackedDataset.open_split(cfg, "train")
    np.testing.assert_array_equal(full.arrays["item_id"][:n], ds.arrays["item_id"])
    # boundary property: row n starts a different impression than row n-1
    ids = full.arrays["impression_id"] if "impression_id" in full.arrays else None
    if ids is not None and n < len(full.arrays["label"]):
        assert ids[n] != ids[n - 1]

    import pytest
    with pytest.raises(ValueError):
        FeatureExtractionPipeline(cfg, limit_rows=-1)
