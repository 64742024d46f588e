"""Item-based collaborative filtering baseline (non-neural).

Capability parity with ``src/model/recall/ItemCF/itemCF_base.py``
(MovieLens-era), re-targeted to MIND interactions and vectorized:

- cosine-style similarity ``co(i,j) / sqrt(n_i * n_j)`` from user->item
  co-occurrence (``itemCF_base.py:18-40``);
- candidate scoring by summed similarity to the user's history, history
  dedup, top-k (``:43-58``); HitRate@k eval (``:61-74``).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("itemcf")


class ItemCF:
    def __init__(self, max_history: int = 200):
        self.max_history = max_history
        self.sim: Dict[int, Dict[int, float]] = {}
        self.item_count: Dict[int, int] = {}

    def fit(self, user_items: Dict[int, Sequence[int]]) -> "ItemCF":
        """Build the similarity table from user -> interacted-item lists."""
        uniq_lists = [list(dict.fromkeys(items))[: self.max_history]
                      for items in user_items.values()]
        item_count: Dict[int, int] = defaultdict(int)
        for uniq in uniq_lists:
            for it in uniq:
                item_count[it] += 1
        self.item_count = dict(item_count)
        base = (max(item_count) if item_count else 0) + 1

        pair_ids: List[np.ndarray] = []
        for uniq in uniq_lists:
            if len(uniq) > 1:
                arr = np.asarray(uniq, dtype=np.int64)
                ii, jj = np.meshgrid(arr, arr, indexing="ij")
                m = ii != jj
                pair_ids.append(ii[m] * base + jj[m])
        self.sim = defaultdict(dict)
        if pair_ids:
            keys, counts = np.unique(np.concatenate(pair_ids), return_counts=True)
            for key, co in zip(keys, counts):
                i, j = int(key // base), int(key % base)
                self.sim[i][j] = co / np.sqrt(self.item_count[i] * self.item_count[j])
        logger.info(f"ItemCF: {len(self.item_count)} items, "
                    f"{sum(len(v) for v in self.sim.values())} similarity entries")
        return self

    def recall(self, history: Sequence[int], k: int = 10) -> List[int]:
        """Top-k items by summed similarity to history (history excluded)."""
        scores: Dict[int, float] = defaultdict(float)
        hist_set = set(history)
        for it in history:
            for j, s in self.sim.get(it, {}).items():
                if j not in hist_set:
                    scores[j] += s
        return [i for i, _ in sorted(scores.items(), key=lambda x: -x[1])[:k]]

    def hit_rate(self, test_cases: Iterable[Tuple[Sequence[int], int]], k: int = 10) -> float:
        """test_cases: (history, target_item) pairs."""
        hits, total = 0, 0
        for history, target in test_cases:
            total += 1
            if target in self.recall(history, k):
                hits += 1
        return hits / max(1, total)


def interactions_from_behaviors(behaviors) -> Dict[int, List[int]]:
    """user -> clicked items from an exploded behaviors dataframe
    (history clicks + positive impressions, in time order).

    ``history`` may be a space-joined id string (the preprocessed format) or
    an id list.
    """
    out: Dict[int, List[int]] = defaultdict(list)
    seen_hist: Dict[int, int] = {}
    for _, row in behaviors.iterrows():
        uid = int(row["user_id"])
        raw = row["history"]
        if isinstance(raw, str):
            hist = [int(x) for x in raw.split(" ")] if raw.strip() else []
        else:
            hist = [int(x) for x in (raw if raw is not None else [])]
        if len(hist) > seen_hist.get(uid, -1):
            out[uid] = hist + [x for x in out[uid] if x not in set(hist)]
            seen_hist[uid] = len(hist)
        if int(row["label"]) == 1:
            out[uid].append(int(row["item_id"]))
    return out
