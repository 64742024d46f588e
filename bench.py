"""Benchmark: END-TO-END training throughput (examples/sec/chip).

Primary line (printed LAST — the driver parses the final line): DCN ranker on the production rowwise-adagrad sparse
path — full Trainer epoch including the input pipeline (device-resident
chunked lax.scan), with a CPU-subprocess baseline for ``vs_baseline``
(BASELINE.json north star: >=3x examples/s/chip over CPU) and roofline
accounting (XLA-compiled FLOPs + HBM bytes per step vs the chip peaks,
``news_recsys_tpu.utils.roofline``) so the perf claim is absolute, not
CPU-relative.

Secondary lines (printed before it): DSSM two-tower retrieval training,
attention sequence ranker, bf16-table DCN, and the b8192 large-batch
ceiling — each e2e on the same runtime; their ``vs_flagship`` is the ratio
to the primary DCN fp32 TPU number (named via the ``flagship`` field).
Every line carries both the best and the median of TIMED_EPOCHS measured
epochs with the methodology stated inline.

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


TIMED_EPOCHS = 3  # the tunneled chip is shared and run-to-run drift
                  # (observed ±30%) only ever biases DOWN; both the best and
                  # the median of TIMED_EPOCHS are recorded, headline = best
                  # (methodology stated inline per ADVICE r03)


def _timed_epoch(trainer, ds, batch: int = BATCH):
    """Epoch 0 compiles + warms up; returns (state, best, median) ex/s over
    TIMED_EPOCHS measured epochs."""
    state = trainer.fit(ds, max_epochs=1)
    rates = []
    for epoch in range(1, 1 + TIMED_EPOCHS):
        t0 = time.perf_counter()
        state, metrics = trainer.train_epoch(state, ds, epoch=epoch)
        dt = time.perf_counter() - t0
        rates.append(metrics["steps"] * batch / dt)
    rates.sort()
    return state, rates[-1], rates[len(rates) // 2]


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
        state, exs, exs_median = _timed_epoch(trainer, ds, batch)
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
    return exs, cost, exs_median


def measure_dssm(rows: int):
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
        _, exs, med = _timed_epoch(trainer, ds)
    return exs, med


def measure_attention(rows: int, batch: int = BATCH):
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer
    from news_recsys_tpu.zoo import attention_arrays, attention_config

    import tempfile

    cfg = attention_config(batch_size=batch)
    model = build_ranker(cfg, "attention")
    ds = PackedDataset(attention_arrays(rows))
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        _, exs, med = _timed_epoch(trainer, ds, batch)
    return exs, med


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

    value, cost, value_median = measure(ROWS, with_cost=True)
    baseline = cpu_baseline()
    vs = value / baseline if baseline > 0 else 0.0
    primary = {
        "metric": "dcn_e2e_train_examples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 2),           # ratio to the CPU anchor
        "vs_cpu": round(vs, 2),
        "value_median": round(value_median, 1),
        "methodology": f"best_of_{TIMED_EPOCHS}_epochs",
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

    # the driver parses the LAST printed line as the headline, so the
    # primary DCN line prints at the END — but ALSO right now, so that a
    # timeout mid-secondaries (remote compiles have taken ~10 min each on
    # bad days) still leaves the flagship number on record
    print(json.dumps(primary), flush=True)

    if not quick:
        # secondary lines, then the primary line again (last = parsed)
        # every secondary line runs epochs of >=512k examples: at the old
        # 256k-row size a whole epoch was ONE chunk dispatch, so the fixed
        # ~25 ms dispatch round trip skewed lines by 8-18% (production
        # epochs are far longer); ROWS-sized datasets amortize it
        for metric, fn in [
            ("dssm_e2e_train_examples_per_sec_per_chip",
             lambda: measure_dssm(ROWS)),
            ("attention_e2e_train_examples_per_sec_per_chip",
             lambda: measure_attention(ROWS)),
            ("dcn_bf16_e2e_train_examples_per_sec_per_chip",
             lambda: measure(ROWS, param_dtype="bfloat16",
                             compute_dtype="bfloat16")[:3:2]),
            # large-batch ceiling: batch 8192 amortizes the per-step op
            # latency and the fixed scatter/gather costs (batch 512 is the
            # reference recipe and stays the primary line); quality at
            # b8192 evidenced in artifacts/rankers_fullscale_r04.json
            # (sqrt-lr-scaled recipe lands within noise of b512)
            ("dcn_b8192_e2e_train_examples_per_sec_per_chip",
             lambda: measure(ROWS * 8, batch=8192)[:3:2]),
            # throughput ceiling: bf16 tables+compute pay off once the
            # per-step table traffic is large enough (+8% at b8192,
            # artifacts/bf16_b8192_r05.json; negative at b512)
            ("dcn_b8192_bf16_e2e_train_examples_per_sec_per_chip",
             lambda: measure(ROWS * 8, batch=8192, param_dtype="bfloat16",
                             compute_dtype="bfloat16")[:3:2]),
        ]:
            try:
                v, med = fn()
                print(json.dumps({
                    "metric": metric, "value": round(v, 1),
                    "unit": "examples/s",
                    "value_median": round(med, 1),
                    "methodology": f"best_of_{TIMED_EPOCHS}_epochs",
                    "vs_flagship": round(v / value, 2),
                    "flagship": "dcn_fp32_tpu_examples_per_sec",
                }), flush=True)
            except Exception as e:  # a secondary line must never sink the primary
                print(json.dumps({"metric": metric, "error": repr(e)[:200]}),
                      file=sys.stderr)

        print(json.dumps(primary), flush=True)


if __name__ == "__main__":
    main()
