"""MIND preprocessing: global ID maps, merged news, exploded behaviors.

Capability parity with the reference preprocessor
(``src/dataset/FeaturesGenerator/preprocess.py``), fully vectorized:

- contiguous int IDs for news & users over train+dev, starting at 1
  (0 reserved for padding) in first-appearance order (``preprocess.py:37,57``);
- the set of users appearing in train is saved for the warm/cold metric
  split (``preprocess.py:52-76``);
- news merged+deduped across splits (``preprocess.py:90-122``);
- behaviors: impression time parsed to epoch seconds and sorted ascending
  (``preprocess.py:132-134``), strict fail-on-unknown ID mapping
  (``preprocess.py:80-88``), and each impression list exploded into one row
  per (impression, item, label) (``preprocess.py:154-166``);
- same output files: ``news_id_map.json``, ``user_id_map.json``,
  ``train_user_ids.json``, ``all_news_preprocess.csv``,
  ``{train,dev}_behaviors_processed.csv``.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Dict, List

import numpy as np
import pandas as pd

from ..utils.logging import get_logger

logger = get_logger("preprocess")

SUB_DATASETS = ("MINDsmall_train", "MINDsmall_dev")
NEWS_COLS = ["news_id", "category", "subcategory", "title", "abstract", "url",
             "title_entities", "abstract_entities"]
BEHAVIOR_COLS = ["impression_id", "user_id", "time", "history", "impressions"]


def strict_map_series(series: pd.Series, mapping: Dict[str, int], col_name: str) -> pd.Series:
    """Map values; raise on any unknown ID (``preprocess.py:80-88``)."""
    mapped = series.map(mapping)
    if mapped.isna().any():
        unknown = series[mapped.isna()].unique()
        raise KeyError(f"Unknown IDs in column '{col_name}' not in global map. Examples: {unknown[:5]}")
    return mapped.astype(np.int64)


def build_id_maps(data_root: str, subsets=SUB_DATASETS):
    """First-appearance-order contiguous IDs from 1 for news and users."""
    news_series: List[pd.Series] = []
    user_series: List[pd.Series] = []
    train_raw_users: set = set()
    for sub in subsets:
        news_path = os.path.join(data_root, sub, "news.tsv")
        if os.path.exists(news_path):
            # quoting=3 (QUOTE_NONE) is load-bearing on real MIND: titles
            # contain embedded double quotes, and a field *starting* with a
            # quote would otherwise swallow tabs/newlines and merge rows,
            # silently corrupting the ID maps.
            news_series.append(
                pd.read_csv(news_path, sep="\t", header=None, usecols=[0],
                            names=["news_id"], quoting=3)["news_id"]
            )
        beh_path = os.path.join(data_root, sub, "behaviors.tsv")
        if os.path.exists(beh_path):
            users = pd.read_csv(beh_path, sep="\t", header=None, usecols=[1],
                                names=["user_id"], quoting=3)["user_id"]
            user_series.append(users)
            if "train" in sub:
                train_raw_users.update(users.unique())
    if not news_series:
        raise FileNotFoundError(f"No news.tsv found under {data_root}")

    all_news = pd.concat(news_series).unique()
    all_users = pd.concat(user_series).unique()
    news_map = {nid: int(i + 1) for i, nid in enumerate(all_news)}
    user_map = {uid: int(i + 1) for i, uid in enumerate(all_users)}
    train_user_ids = [user_map[u] for u in train_raw_users if u in user_map]
    logger.info(f"Global news: {len(news_map)}, users: {len(user_map)}, train users: {len(train_user_ids)}")
    return news_map, user_map, train_user_ids


def process_all_news(data_root: str, subsets, output_path: str, news_map: Dict[str, int]) -> pd.DataFrame:
    """Merge, dedup, ID-map all news; write headerless TSV."""
    dfs = []
    for sub in subsets:
        path = os.path.join(data_root, sub, "news.tsv")
        if os.path.exists(path):
            dfs.append(pd.read_csv(path, sep="\t", names=NEWS_COLS, quoting=3))
    full = pd.concat(dfs, ignore_index=True)
    full = full.drop_duplicates(subset=["news_id"])
    full["news_id"] = strict_map_series(full["news_id"], news_map, "news_id")
    Path(os.path.dirname(output_path)).mkdir(parents=True, exist_ok=True)
    full.to_csv(output_path, index=False, sep="\t", header=False, quoting=3)
    return full


def process_behaviors(input_path: str, output_path: str,
                      user_map: Dict[str, int], news_map: Dict[str, int]) -> pd.DataFrame:
    """Time-sort, strict-map, explode impressions; write headerless TSV.

    Output columns: impression_id, user_id, time(epoch s), history
    (space-joined mapped ids), item_id, label — one row per impression item.
    """
    if not os.path.exists(input_path):
        return pd.DataFrame()
    df = pd.read_csv(input_path, sep="\t", names=BEHAVIOR_COLS, quoting=3)

    df["time"] = pd.to_datetime(df["time"], format="%m/%d/%Y %I:%M:%S %p")
    df = df.sort_values(by="time", ascending=True)
    df["time"] = df["time"].astype("int64") // 10**9

    df["user_id"] = strict_map_series(df["user_id"], user_map, "user_id")

    # History: strict vectorized map of space-separated IDs.
    df["history"] = df["history"].fillna("")
    hist_lists = df["history"].str.split(" ")
    exploded_hist = hist_lists.explode()
    nonempty = exploded_hist != ""
    mapped_hist = pd.Series(index=exploded_hist.index, dtype=object)
    mapped_hist[nonempty] = strict_map_series(
        exploded_hist[nonempty], news_map, "history"
    ).astype(str)
    mapped_hist[~nonempty] = ""
    df["history"] = mapped_hist.groupby(level=0).agg(" ".join).str.strip()
    # restore time-sorted row order (groupby sorts by index)
    df = df.loc[hist_lists.index]

    # Explode impressions "Nxxx-1 Nyyy-0" -> one row each.
    df["impressions"] = df["impressions"].str.split(" ")
    dfe = df.explode("impressions").reset_index(drop=True)
    split_cols = dfe["impressions"].str.rsplit("-", n=1, expand=True)
    dfe["item_id"] = strict_map_series(split_cols[0], news_map, "impression_item_id")
    dfe["label"] = pd.to_numeric(split_cols[1])
    dfe = dfe.drop(columns=["impressions"])

    Path(os.path.dirname(output_path)).mkdir(parents=True, exist_ok=True)
    dfe.to_csv(output_path, index=False, sep="\t", header=False, quoting=3)
    return dfe


def run_preprocess(data_root: str, out_basedir: str, subsets=SUB_DATASETS) -> None:
    """Full pipeline; wipes and rebuilds ``<out_basedir>/preprocess``."""
    pre_dir = os.path.join(out_basedir, "preprocess")
    if os.path.exists(pre_dir):
        shutil.rmtree(pre_dir)
    os.makedirs(pre_dir)

    news_map, user_map, train_user_ids = build_id_maps(data_root, subsets)
    with open(os.path.join(pre_dir, "news_id_map.json"), "w", encoding="utf-8") as f:
        json.dump(news_map, f)
    with open(os.path.join(pre_dir, "user_id_map.json"), "w", encoding="utf-8") as f:
        json.dump(user_map, f)
    with open(os.path.join(pre_dir, "train_user_ids.json"), "w", encoding="utf-8") as f:
        json.dump(train_user_ids, f)

    process_all_news(data_root, subsets, os.path.join(pre_dir, "all_news_preprocess.csv"), news_map)

    for sub in subsets:
        suffix = sub.split("_")[-1]  # train | dev
        process_behaviors(
            os.path.join(data_root, sub, "behaviors.tsv"),
            os.path.join(pre_dir, f"{suffix}_behaviors_processed.csv"),
            user_map,
            news_map,
        )
    logger.info(f"Preprocess complete -> {pre_dir}")


def main(argv=None):
    import argparse

    from ..config import load_config

    parser = argparse.ArgumentParser(description="MIND preprocessing")
    parser.add_argument("-c", "--config", required=True)
    args = parser.parse_args(argv)
    cfg = load_config(args.config)
    run_preprocess(cfg.paths.data_path, cfg.paths.out_basedir)


if __name__ == "__main__":
    main()
