"""Assemble the round-5 fullscale scoreboard: r04 rows for unchanged
models + r05 refreshed rows (shallow models with the init fix; DSSM with
history augmentation and logQ correction; new DeepFM).

All rows ran on the SAME data (the r04 fullscale synthetic campaign dir,
65.2k news / 94k users, seed 3), same recipe knobs per row as recorded.
"""

import json
import sys

CARRY_FROM_R04 = ["deep", "widedeep", "dcn", "attention", "dssm",
                  "dcn_b8192", "dssm_adamw", "attention_b2048"]


def main():
    with open("artifacts/rankers_fullscale_r04.json") as f:
        r04 = json.load(f)
    rows = []
    for r in r04["results"]:
        if r["model"] in CARRY_FROM_R04:
            r = dict(r, carried_from="r04 (config unchanged; fullscale runs "
                                     "keep arena off and per-feature gathers, "
                                     "so r05 code changes do not affect them)")
            rows.append(r)
    for path in ("artifacts/rankers_fullscale_r05_partial.json",
                 "artifacts/rankers_fullscale_r05_partial2.json",
                 "artifacts/rankers_fullscale_r05_partial3.json",
                 "artifacts/rankers_fullscale_r05_bf16.json",
                 "artifacts/rankers_fullscale_r05_sweep.json"):
        with open(path) as f:
            rows.extend(json.load(f)["results"])

    out = {
        "backend": "tpu",
        "data": r04["data"],
        "criterion": r04["criterion"],
        "notes": {
            "r05_changes": [
                "lr/fm rows: embeddings.init_scale=0.03 (saturation fix, "
                "artifacts/fm_diagnosis_r05.json) on ONE optimizer column + "
                "adamw parity column — both columns now agree",
                "deepfm: new model (FM + deep tower), same shallow recipe",
                "dssm_aug*: leave-one-out history pairs "
                "(dssm_cfg.hist_augment); dssm_aug+logq*: + sampling-bias "
                "corrected InfoNCE (dssm_cfg.logq_correction); +ns8: 8 "
                "in-batch negatives (the shipped configs/dssm.yaml recipe); "
                "+temp0.05: temperature ablation",
                "dcn_v2: DCN-v2 cross layers (dcn_cfg.version: 2); "
                "dcn_b8192+bf16: the 3.32M ex/s throughput-ceiling combo's "
                "quality row (bf16 tables+compute, sqrt-lr b8192 recipe)",
            ],
            "retrieval_baselines": {
                "random_HR@10": 0.000153,
                "itemcf_HR@10": 0.00578,
                "popularity_HR@10": 0.00828,
                "source": "artifacts/itemcf_quality_r04.json, "
                          "artifacts/popularity_baseline_r05.json",
            },
        },
        "results": rows,
    }
    with open("artifacts/rankers_fullscale_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    for r in rows:
        best = r["best"]
        row = best.get("Warm_Start") or best.get("Retrieval") or best.get("Overall")
        key = "AUC" if "AUC" in row else "HR@10"
        print(f"{r['model']:>22} {r['optimizer']:>16} {key} {row.get(key)}")
    print("wrote artifacts/rankers_fullscale_r05.json")


if __name__ == "__main__":
    main()
