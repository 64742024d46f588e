"""CLI end-to-end smoke tests: synth -> preprocess -> fe -> train -> log."""

import json
import os

import pytest
import yaml

from news_recsys_tpu.cli import main as cli_main

FEATS = ["user_id", "item_id", "category", "subcategory", "user_click_category"]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    cfg = {
        "name": "deep",
        "paths": {"data_path": str(tmp / "Data"), "out_basedir": str(tmp / "tmp")},
        "features": {
            "feature_names": FEATS,
            "sparse_feature_names": FEATS,
            "item_feature_names": ["item_id", "category", "subcategory"],
            "user_feature_names": ["user_id", "user_click_category"],
        },
        "embeddings": {
            "embedding_size": {k: 8 for k in FEATS},
            "embedding_table_size": {"user_id": 300, "item_id": 300, "category": 20,
                                     "subcategory": 200, "user_click_category": 20},
        },
        "dataset": {"batch_size": 64},
        "train_hparams": {"max_epoch": 1, "lr": 3e-3, "min_lr": 1e-4,
                          "lr_milestones": [100, 300], "max_step": 5000, "val_freq": 1},
    }
    cfg_path = tmp / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    dssm_cfg = dict(cfg, name="dssm")
    dssm_path = tmp / "dssm.yaml"
    dssm_path.write_text(yaml.safe_dump(dssm_cfg))
    return tmp, str(cfg_path), str(dssm_path)


def test_cli_full_flow(workspace, capsys):
    tmp, cfg_path, dssm_path = workspace
    cli_main(["synth", "--out", str(tmp / "Data"), "--news", "150", "--users", "60",
              "--train-impressions", "300", "--dev-impressions", "80"])
    cli_main(["preprocess", "-c", cfg_path])
    cli_main(["fe", "-c", cfg_path])

    workdir = str(tmp / "exp_deep")
    cli_main(["train", "-c", cfg_path, "--workdir", workdir, "--epochs", "1"])
    assert os.path.exists(os.path.join(workdir, "val_log.log"))

    cli_main(["log", workdir])
    out = capsys.readouterr().out
    assert "Best Epoch" in out
    assert "| Model | Metric |" in out


def test_cli_dssm(workspace, capsys):
    tmp, cfg_path, dssm_path = workspace
    workdir = str(tmp / "exp_dssm")
    cli_main(["train", "-c", dssm_path, "--workdir", workdir, "--epochs", "2"])
    assert os.path.exists(os.path.join(workdir, "retrieval_eval.json"))
    res = json.load(open(os.path.join(workdir, "retrieval_eval.json")))
    assert "HR@10" in res and res["num_queries"] > 0


def test_cli_visualize(workspace, tmp_path):
    tmp, cfg_path, _ = workspace
    out = str(tmp_path / "report.html")
    cli_main(["visualize-history",
              "--news", str(tmp / "Data" / "MINDsmall_dev" / "news.tsv"),
              "--behaviors", str(tmp / "Data" / "MINDsmall_dev" / "behaviors.tsv"),
              "--output", out])
    content = open(out).read()
    assert "<html>" in content and "User History Visualizer" in content
