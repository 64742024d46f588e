"""Config system: validation, schema invariants, YAML loading."""

import pytest
import yaml

from news_recsys_tpu.config import (build_schema, config_from_dict,
                                    load_config, table_specs)

BASE = {
    "name": "deep",
    "features": {
        "sparse_feature_names": ["a", "b"],
        "array_feature_names": ["h"],
        "item_feature_names": ["b"],
        "user_feature_names": ["a", "h"],
        "array_max_length": {"h": 4},
    },
    "embeddings": {
        "embedding_size": {"a": 8, "b": 8},
        "embedding_table_size": {"a": 100, "b": 100},
        "share_emb_table_features": {"h": "b"},
    },
}


def test_load_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(BASE))
    cfg = load_config(str(p))
    assert cfg.name == "deep"
    assert cfg.features.array_max_length == {"h": 4}
    assert cfg.embeddings.share_emb_table_features == {"h": "b"}


def test_missing_embedding_size_rejected():
    bad = {**BASE, "embeddings": {"embedding_size": {"a": 8},
                                  "embedding_table_size": {"a": 100, "b": 100}}}
    with pytest.raises(ValueError, match="Embedding size"):
        config_from_dict(bad)


def test_missing_array_max_length_rejected():
    bad = {**BASE, "features": {**BASE["features"], "array_max_length": {}}}
    with pytest.raises(ValueError, match="max_length"):
        config_from_dict(bad)


def test_bad_milestones_rejected():
    bad = {**BASE, "train_hparams": {"lr_milestones": [1, 2, 3]}}
    with pytest.raises(ValueError, match="milestones"):
        config_from_dict(bad)


def test_undeclared_feature_rejected_in_schema():
    cfg = config_from_dict(BASE)
    with pytest.raises(ValueError, match="not declared"):
        build_schema(cfg, ["a", "zzz"])


def test_shared_tables_created_once():
    cfg = config_from_dict(BASE)
    tables = table_specs(cfg)
    assert set(tables) == {"a", "b"}       # h aliases to b
    schema = build_schema(cfg)
    assert schema["h"].table == "b"
    assert schema["h"].dim == 8


def test_unknown_yaml_keys_tolerated():
    raw = {**BASE, "future_section": {"x": 1},
           "dataset": {"batch_size": 32, "some_new_key": True}}
    cfg = config_from_dict(raw)
    assert cfg.dataset.batch_size == 32
    assert cfg.extra("future_section") == {"x": 1}
