"""Canonical MIND-small model configs (reference ``train_cf_*.yaml`` sizes)
and synthetic batch builders shared by bench / entry / dryrun."""

from __future__ import annotations

from typing import Dict

import numpy as np

from .config import Config, config_from_dict

MIND_FEATURES = ["user_id", "item_id", "category", "subcategory", "user_click_category"]

# train_cf_deep.yaml:31-44
MIND_EMB_SIZE = {"user_id": 32, "item_id": 32, "category": 16,
                 "subcategory": 16, "user_click_category": 16}
MIND_TABLE_SIZE = {"user_id": 94058, "item_id": 65239, "category": 18,
                   "subcategory": 270, "user_click_category": 18}


def mind_config(name: str = "dcn", batch_size: int = 512, equal_dims: bool = False,
                mesh_data: int = -1, mesh_model: int = 1,
                param_dtype: str = "float32", compute_dtype: str = "float32",
                embedding_optimizer: str = "adamw",
                embedding_update_period: int = 1) -> Config:
    emb = {k: 16 for k in MIND_FEATURES} if equal_dims else dict(MIND_EMB_SIZE)
    return config_from_dict({
        "name": name,
        "features": {
            "feature_names": MIND_FEATURES,
            "sparse_feature_names": MIND_FEATURES,
            "item_feature_names": ["item_id", "category", "subcategory"],
            "user_feature_names": ["user_id", "user_click_category"],
        },
        "embeddings": {
            "embedding_size": emb,
            "embedding_table_size": dict(MIND_TABLE_SIZE),
        },
        "dataset": {"batch_size": batch_size},
        # train_cf_deep.yaml:47-61
        "train_hparams": {"val_freq": 1, "max_epoch": 30, "lr": 1e-3, "min_lr": 5e-6,
                          "lr_milestones": [40000, 200000], "max_step": 300000,
                          "embedding_optimizer": embedding_optimizer,
                          "embedding_update_period": embedding_update_period},
        "mesh": {"data": mesh_data, "model": mesh_model,
                 "param_dtype": param_dtype, "compute_dtype": compute_dtype},
        "wide_and_deep_cfg": {"wide_feature_names": ["category", "subcategory"]},
    })


def synthetic_batch(batch_size: int, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    batch = {
        name: rng.integers(1, MIND_TABLE_SIZE[name], batch_size).astype(np.int32)
        for name in MIND_FEATURES
    }
    batch["label"] = (rng.random(batch_size) < 0.1).astype(np.float32).reshape(-1, 1)
    batch["_valid"] = np.ones(batch_size, np.float32)
    return batch
