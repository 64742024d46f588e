"""Benchmark: END-TO-END training throughput (examples/sec/chip).

Primary line (first): DCN ranker on the production rowwise-adagrad sparse
path — full Trainer epoch including the input pipeline (device-resident
chunked lax.scan), with a CPU-subprocess baseline for ``vs_baseline``
(BASELINE.json north star: >=3x examples/s/chip over CPU) and roofline
accounting (XLA-compiled FLOPs + HBM bytes per step vs the chip peaks,
``news_recsys_tpu.utils.roofline``) so the perf claim is absolute, not
CPU-relative.

Secondary lines (after the first): DSSM two-tower retrieval training,
attention sequence ranker, and bf16-table DCN — each e2e on the same
runtime; their ``vs_baseline`` is the ratio to the primary DCN fp32 TPU
number (stated via the ``baseline`` field).

Every line is one JSON object:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import os
import subprocess
import sys
import time

BATCH = 512          # reference training recipe batch size (train_cf_deep.yaml:48)
ROWS = 512 * 1024    # primary benchmark dataset rows
SEC_ROWS = 256 * 1024  # secondary-line dataset rows (bounds total bench time)
CPU_ROWS = 512 * 32   # small: the CPU subprocess only anchors vs_baseline
COST_STEPS = 16      # scan length for the roofline cost-analysis lowering


def _ranking_arrays(rows: int):
    import numpy as np
    from news_recsys_tpu.zoo import MIND_FEATURES, MIND_TABLE_SIZE

    rng = np.random.default_rng(0)
    arrays = {
        name: rng.integers(1, MIND_TABLE_SIZE[name], rows).astype(np.int32)
        for name in MIND_FEATURES
    }
    arrays["label"] = (rng.random(rows) < 0.1).astype(np.float32).reshape(-1, 1)
    return arrays


TIMED_EPOCHS = 3  # report the best epoch: the tunneled chip is shared, and
                  # run-to-run drift (observed ±30%) only ever biases DOWN


def _timed_epoch(trainer, ds, batch: int = BATCH):
    """Epoch 0 compiles + warms up; best of TIMED_EPOCHS is the measurement."""
    state = trainer.fit(ds, max_epochs=1)
    best = 0.0
    for epoch in range(1, 1 + TIMED_EPOCHS):
        t0 = time.perf_counter()
        state, metrics = trainer.train_epoch(state, ds, epoch=epoch)
        dt = time.perf_counter() - t0
        best = max(best, metrics["steps"] * batch / dt)
    return state, best


def measure(rows: int, with_cost: bool = False, param_dtype: str = "float32",
            compute_dtype: str = "float32", batch: int = BATCH):
    import numpy as np

    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import AucHist, Trainer
    from news_recsys_tpu.zoo import mind_config

    import tempfile

    ds = PackedDataset(_ranking_arrays(rows))

    # production fast path: rowwise-adagrad embedding updates (the standard
    # TPU-embedding optimizer: (V,) scalar accumulator per table, so each
    # step pays one table scatter instead of three; convergence-parity
    # tested vs sparse AdamW and exact dense AdamW)
    cfg = mind_config("dcn", batch_size=batch,
                      embedding_optimizer="rowwise_adagrad",
                      param_dtype=param_dtype, compute_dtype=compute_dtype)
    model = build_ranker(cfg, "dcn")
    cost = None
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        state, exs = _timed_epoch(trainer, ds, batch)
        if with_cost:
            # XLA's own cost analysis of the production chunk fn, amortised
            # over a COST_STEPS-long scan (lowering never executes, so the
            # donated state is not consumed)
            from news_recsys_tpu.utils.roofline import compiled_cost
            packer = trainer._packer(ds)
            run = trainer._chunked_step(packer.layout_key(), batch)
            idx = np.zeros((COST_STEPS, batch), np.int32)
            total = compiled_cost(run, state, AucHist.zeros(),
                                  packer.int_mat, packer.float_mat, idx)
            if total is not None:
                cost = {k: v / COST_STEPS for k, v in total.items()}
    return exs, cost


def measure_dssm(rows: int) -> float:
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.dssm import build_dssm
    from news_recsys_tpu.training.retrieval import DSSMTrainer
    from news_recsys_tpu.zoo import mind_config

    import tempfile

    ds = PackedDataset(_ranking_arrays(rows))
    cfg = mind_config("dssm", batch_size=BATCH,
                      embedding_optimizer="rowwise_adagrad")
    model = build_dssm(cfg)
    with tempfile.TemporaryDirectory() as tmp:
        trainer = DSSMTrainer(cfg, model, workdir=tmp, use_mesh=False)
        _, exs = _timed_epoch(trainer, ds)
    return exs


def measure_attention(rows: int) -> float:
    import numpy as np

    from news_recsys_tpu.config import config_from_dict
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer
    from news_recsys_tpu.zoo import MIND_TABLE_SIZE

    import tempfile

    HIST_LEN = 30  # configs/attention.yaml array_max_length
    cfg = config_from_dict({
        "name": "attention",
        "features": {
            "feature_names": ["user_id", "item_id", "category", "hist"],
            "sparse_feature_names": ["user_id", "item_id", "category"],
            "array_feature_names": ["hist"],
            "item_feature_names": ["item_id", "category"],
            "user_feature_names": ["user_id", "hist"],
            "array_max_length": {"hist": HIST_LEN},
        },
        "embeddings": {
            "embedding_size": {"user_id": 32, "item_id": 32, "category": 16},
            "embedding_table_size": {k: MIND_TABLE_SIZE[k]
                                     for k in ("user_id", "item_id", "category")},
            "share_emb_table_features": {"hist": "item_id"},
        },
        "dataset": {"batch_size": BATCH},
        "train_hparams": {"lr": 1e-3, "min_lr": 5e-6,
                          "lr_milestones": [40000, 200000], "max_step": 300000,
                          "embedding_optimizer": "rowwise_adagrad"},
        "attention_cfg": {"hist_feature": "hist", "num_layers": 1,
                          "num_heads": 2, "ff_dim": 64},
    })
    model = build_ranker(cfg, "attention")
    rng = np.random.default_rng(0)
    hist = rng.integers(0, MIND_TABLE_SIZE["item_id"],
                        (rows, HIST_LEN)).astype(np.int32)
    ds = PackedDataset({
        "user_id": rng.integers(1, MIND_TABLE_SIZE["user_id"], rows).astype(np.int32),
        "item_id": rng.integers(1, MIND_TABLE_SIZE["item_id"], rows).astype(np.int32),
        "category": rng.integers(1, MIND_TABLE_SIZE["category"], rows).astype(np.int32),
        "hist": hist,
        "hist_mask": (hist != 0).astype(np.float32),
        "label": (rng.random(rows) < 0.1).astype(np.float32).reshape(-1, 1),
    })
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        _, exs = _timed_epoch(trainer, ds)
    return exs


def cpu_baseline() -> float:
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import bench; print('CPU_RESULT', bench.measure({CPU_ROWS})[0])"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=900, env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPU_RESULT"):
                return float(line.split()[1])
    except Exception:
        pass
    return 0.0


def main():
    quick = "--quick" in sys.argv  # primary line only (driver default is full)

    value, cost = measure(ROWS, with_cost=True)
    baseline = cpu_baseline()
    vs = value / baseline if baseline > 0 else 0.0
    primary = {
        "metric": "dcn_e2e_train_examples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 2),
    }
    if cost is not None:
        from news_recsys_tpu.utils.roofline import step_utilisation
        util = step_utilisation(cost["flops"], cost["bytes"], BATCH / value)
        primary.update({
            "batch": BATCH,
            "flops_per_step": round(util["flops_per_step"]),
            "hbm_bytes_per_step": round(util["hbm_bytes_per_step"]),
            "step_time_us": round(util["step_time_us"], 1),
        })
        for k in ("device", "mfu_pct", "hbm_bw_util_pct"):
            if k in util:
                primary[k] = util[k]
    print(json.dumps(primary))
    if quick:
        return

    for metric, fn in [
        ("dssm_e2e_train_examples_per_sec_per_chip",
         lambda: measure_dssm(SEC_ROWS)),
        ("attention_e2e_train_examples_per_sec_per_chip",
         lambda: measure_attention(SEC_ROWS)),
        ("dcn_bf16_e2e_train_examples_per_sec_per_chip",
         lambda: measure(SEC_ROWS, param_dtype="bfloat16",
                         compute_dtype="bfloat16")[0]),
        # large-batch ceiling: batch 8192 amortizes the per-step op latency
        # and the slot-proportional table scatters (batch 512 is the
        # reference recipe and stays the primary line)
        ("dcn_b8192_e2e_train_examples_per_sec_per_chip",
         lambda: measure(SEC_ROWS * 4, batch=8192)[0]),
    ]:
        try:
            v = fn()
            print(json.dumps({
                "metric": metric, "value": round(v, 1), "unit": "examples/s",
                "vs_baseline": round(v / value, 2),
                "baseline": "dcn_fp32_tpu_examples_per_sec",
            }))
        except Exception as e:  # a secondary line must never sink the primary
            print(json.dumps({"metric": metric, "error": repr(e)[:200]}),
                  file=sys.stderr)


if __name__ == "__main__":
    main()
