"""Synthetic MIND-format data generator for tests and benchmarks.

The real MIND-small dataset must be downloaded by the user (reference
``README.md:25-37``); this module fabricates raw ``news.tsv`` /
``behaviors.tsv`` files with the same schema and statistics shape so the full
pipeline (preprocess -> feature extraction -> training -> validation) can be
exercised end-to-end without the download.
"""

from __future__ import annotations

import datetime
from pathlib import Path

import numpy as np

_EPOCH = datetime.datetime(2019, 11, 11, 0, 0, 0)

CATEGORIES = [
    "news", "sports", "finance", "travel", "lifestyle", "video", "foodanddrink",
    "weather", "autos", "health", "entertainment", "tv", "music", "movies",
    "kids", "middleeast", "northamerica",
]
SUBCATS_PER_CAT = 8


def generate_mind(
    root: str,
    n_news: int = 300,
    n_users: int = 120,
    n_impressions_train: int = 400,
    n_impressions_dev: int = 150,
    max_history: int = 20,
    max_candidates: int = 8,
    seed: int = 0,
    adversarial: bool = False,
) -> str:
    """Write MINDsmall_{train,dev}/{news.tsv,behaviors.tsv} under ``root``.

    ``adversarial=True`` injects the text quirks the *real* MIND download is
    known to contain, so the pipeline's TSV handling is exercised before the
    first real-data run: titles with embedded double quotes (including
    fields that *start* with a quote — fatal unless readers use
    ``quoting=3``), empty abstracts, apostrophes/commas/backslashes in text,
    news ids duplicated across splits with *differing* fields (dedup must
    keep first appearance), guaranteed empty-history rows, and entity JSON
    with quoted labels.
    """
    rng = np.random.default_rng(seed)
    news_ids = [f"N{i + 1}" for i in range(n_news)]
    cats = rng.integers(0, len(CATEGORIES), n_news)
    subcats = cats * SUBCATS_PER_CAT + rng.integers(0, SUBCATS_PER_CAT, n_news)

    # MIND-style entity annotations: a couple of Wikidata ids per item
    n_entities = max(20, n_news // 10)
    item_entities = [
        [f"Q{int(e)}" for e in rng.choice(n_entities, size=int(rng.integers(0, 4)), replace=False)]
        for _ in range(n_news)
    ]

    def ent_json(i: int) -> str:
        return "[" + ", ".join(
            f'{{"Label": "entity {w}", "Type": "P", "WikidataId": "{w}"}}'
            for w in item_entities[i]
        ) + "]"

    def news_text(i: int, sub: str):
        title, abstract = f"Title of item {i}", f"Abstract text {i}"
        if adversarial:
            m = i % 7
            if m == 0:
                title = f'"Quoted" start title {i}'     # field STARTS with a quote
            elif m == 5:
                # UNBALANCED leading quote: without QUOTE_NONE this swallows
                # tabs+newlines across rows (the fatal real-MIND case)
                title = f'"Unquoted start, never closed {i}'
            elif m == 1:
                title = f'He said "word {i}", then left'
            elif m == 2:
                title = f"It's item {i}, 50% off \\ more"
            elif m == 3:
                abstract = ""                            # real MIND: empty abstracts
            elif m == 4:
                abstract = f'"{i}"'                      # whole field quoted-looking
            # dev copies of shared news differ from the train copies for a
            # slice of items: first-appearance dedup must win
            if sub == "MINDsmall_dev" and i % 11 == 0:
                title = f"DEV-DIVERGED title {i}"
        return title, abstract

    def write_news(sub: str, lo: int, hi: int):
        d = Path(root) / sub
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "news.tsv", "w", encoding="utf-8") as f:
            for i in range(lo, hi):
                title, abstract = news_text(i, sub)
                f.write(
                    f"{news_ids[i]}\t{CATEGORIES[cats[i]]}\tsubcat{subcats[i]}\t"
                    f"{title}\t{abstract}\thttps://example.com/{i}\t{ent_json(i)}\t[]\n"
                )

    # train sees the first 90%, dev all (so dev has some train-unseen news)
    write_news("MINDsmall_train", 0, int(n_news * 0.9))
    write_news("MINDsmall_dev", 0, n_news)

    user_ids = [f"U{i + 1}" for i in range(n_users)]
    # popularity-skewed item distribution + per-user category affinity
    popularity = rng.dirichlet(np.ones(n_news) * 0.3)
    user_fav_cat = rng.integers(0, len(CATEGORIES), n_users)

    def click_prob(u: int, n: int) -> float:
        return 0.55 if cats[n] == user_fav_cat[u] else 0.02

    def write_behaviors(sub: str, n_impr: int, users_lo: int, users_hi: int, base_min: int):
        d = Path(root) / sub
        d.mkdir(parents=True, exist_ok=True)
        avail = int(n_news * 0.9) if "train" in sub else n_news
        # click history reflects user affinity: mostly favorite-category items
        cat_items = {c: np.flatnonzero(cats[:avail] == c) for c in range(len(CATEGORIES))}
        with open(d / "behaviors.tsv", "w", encoding="utf-8") as f:
            for imp in range(n_impr):
                u = int(rng.integers(users_lo, users_hi))
                hist_len = int(rng.integers(0, max_history))
                if adversarial and imp % 13 == 0:
                    hist_len = 0  # guaranteed empty-history rows (NaN field)
                fav_pool = cat_items[user_fav_cat[u]]
                hist = [
                    int(rng.choice(fav_pool)) if (len(fav_pool) and rng.random() < 0.7)
                    else int(rng.integers(0, avail))
                    for _ in range(hist_len)
                ]
                hist_str = " ".join(news_ids[h] for h in hist)
                n_cand = int(rng.integers(2, max_candidates + 1))
                cands = rng.choice(avail, size=n_cand, replace=False,
                                   p=popularity[:avail] / popularity[:avail].sum())
                labels = [1 if rng.random() < click_prob(u, c) else 0 for c in cands]
                if sum(labels) == 0 and rng.random() < 0.2:
                    labels[int(rng.integers(0, n_cand))] = 1  # ensure some positives
                impr_str = " ".join(f"{news_ids[c]}-{l}" for c, l in zip(cands, labels))
                dt = _EPOCH + datetime.timedelta(minutes=base_min + imp,
                                                 seconds=int(rng.integers(0, 60)))
                t = dt.strftime("%m/%d/%Y %I:%M:%S %p")
                f.write(f"{imp + 1}\t{user_ids[u]}\t{t}\t{hist_str}\t{impr_str}\n")

    # train: first 80% of users; dev: all users (tail 20% are cold-start)
    write_behaviors("MINDsmall_train", n_impressions_train, 0, int(n_users * 0.8), 0)
    write_behaviors("MINDsmall_dev", n_impressions_dev, 0, n_users, 10000)
    return root
