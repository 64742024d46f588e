"""Interactive HTML report of per-user impression history.

Capability parity with ``src/scripts/visiualize_user_history.py``: loads raw
MIND ``news.tsv`` / ``behaviors.tsv``, groups impressions per user sorted by
time, and emits a self-contained HTML page (user list -> impression timeline
-> history vs clicked/unclicked candidates).
"""

from __future__ import annotations

import argparse
import html
import json
from typing import Dict, List

import pandas as pd

from .logging import get_logger

logger = get_logger("visualize_history")

NEWS_COLS = ["news_id", "category", "subcategory", "title", "abstract", "url",
             "title_entities", "abstract_entities"]
BEH_COLS = ["impression_id", "user_id", "time", "history", "impressions"]

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>User History Visualizer</title>
<style>
 body {{ font-family: sans-serif; margin: 0; display: flex; height: 100vh; }}
 #users {{ width: 220px; overflow-y: auto; border-right: 1px solid #ccc; padding: 8px; }}
 #main {{ flex: 1; overflow-y: auto; padding: 16px; }}
 .user {{ cursor: pointer; padding: 4px 8px; border-radius: 4px; }}
 .user:hover, .user.active {{ background: #e0ecff; }}
 .impression {{ border: 1px solid #ddd; border-radius: 6px; margin: 12px 0; padding: 10px; }}
 .impression h4 {{ margin: 0 0 6px 0; }}
 .item {{ display: inline-block; margin: 2px; padding: 2px 8px; border-radius: 10px;
          background: #f0f0f0; font-size: 13px; }}
 .clicked {{ background: #c8f7c5; }}
 .unclicked {{ background: #fad7d7; }}
 .hist {{ background: #dde6ff; }}
 .cat {{ color: #666; font-size: 11px; }}
</style></head><body>
<div id="users"><h3>Users ({n_users})</h3>{user_list}</div>
<div id="main"><p>Select a user.</p></div>
<script>
const DATA = {data_json};
function show(uid, el) {{
  document.querySelectorAll('.user').forEach(e => e.classList.remove('active'));
  el.classList.add('active');
  const imps = DATA[uid];
  let out = `<h2>User ${{uid}} — ${{imps.length}} impressions</h2>`;
  for (const imp of imps) {{
    out += `<div class="impression"><h4>${{imp.time}}</h4>`;
    out += `<div><b>History:</b> ` + imp.history.map(h =>
      `<span class="item hist">${{h.title}}<span class="cat"> ${{h.category}}</span></span>`).join('') + `</div>`;
    out += `<div><b>Candidates:</b> ` + imp.candidates.map(c =>
      `<span class="item ${{c.clicked ? 'clicked' : 'unclicked'}}">${{c.title}}<span class="cat"> ${{c.category}}</span></span>`).join('') + `</div>`;
    out += `</div>`;
  }}
  document.getElementById('main').innerHTML = out;
}}
</script></body></html>
"""


def load_news_data(path: str) -> Dict[str, Dict[str, str]]:
    df = pd.read_csv(path, sep="\t", names=NEWS_COLS, quoting=3)
    return {
        str(r.news_id): {"title": str(r.title), "category": str(r.category)}
        for r in df.itertuples()
    }


def load_behaviors_data(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, sep="\t", names=BEH_COLS, quoting=3)
    df["parsed_time"] = pd.to_datetime(df["time"], format="%m/%d/%Y %I:%M:%S %p")
    return df.sort_values("parsed_time")


def generate_html_report(news_path: str, behaviors_path: str, output_path: str,
                         max_users: int = 200) -> str:
    news = load_news_data(news_path)
    beh = load_behaviors_data(behaviors_path)

    def info(nid: str) -> Dict[str, str]:
        d = news.get(nid, {"title": nid, "category": "?"})
        return {"title": html.escape(d["title"][:60]), "category": html.escape(d["category"])}

    data: Dict[str, List[dict]] = {}
    for row in beh.itertuples():
        uid = str(row.user_id)
        if uid not in data and len(data) >= max_users:
            continue
        hist = [info(h) for h in str(row.history).split(" ")[:30]] if isinstance(row.history, str) else []
        cands = []
        for tok in str(row.impressions).split(" "):
            if "-" not in tok:
                continue
            nid, label = tok.rsplit("-", 1)
            cands.append({**info(nid), "clicked": label == "1"})
        data.setdefault(uid, []).append({"time": str(row.time), "history": hist, "candidates": cands})

    user_list = "".join(
        f'<div class="user" onclick="show({json.dumps(u)}, this)">{html.escape(u)} '
        f'({len(v)})</div>' for u, v in data.items()
    )
    page = _PAGE.format(n_users=len(data), user_list=user_list,
                        data_json=json.dumps(data))
    with open(output_path, "w", encoding="utf-8") as f:
        f.write(page)
    logger.info(f"Wrote {output_path}: {len(data)} users")
    return output_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Visualize user impression history")
    parser.add_argument("--news", required=True)
    parser.add_argument("--behaviors", required=True)
    parser.add_argument("--output", default="user_history_report.html")
    parser.add_argument("--max-users", type=int, default=200)
    args = parser.parse_args(argv)
    generate_html_report(args.news, args.behaviors, args.output, args.max_users)


if __name__ == "__main__":
    main()
