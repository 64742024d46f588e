"""Benchmark: END-TO-END DCN training throughput (examples/sec/chip) — full
Trainer epoch including input pipeline (device-resident chunked lax.scan
path), on the default backend (TPU under the driver), with a CPU-subprocess
baseline for ``vs_baseline`` (BASELINE.json north star: >=3x examples/s/chip
over CPU).

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

BATCH = 512          # reference training recipe batch size (train_cf_deep.yaml:48)
ROWS = 512 * 1024    # benchmark dataset rows
CPU_ROWS = 512 * 32   # small: the CPU subprocess only anchors vs_baseline


def measure(rows: int) -> float:
    import numpy as np

    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer
    from news_recsys_tpu.zoo import MIND_FEATURES, MIND_TABLE_SIZE, mind_config

    import tempfile

    rng = np.random.default_rng(0)
    arrays = {
        name: rng.integers(1, MIND_TABLE_SIZE[name], rows).astype(np.int32)
        for name in MIND_FEATURES
    }
    arrays["label"] = (rng.random(rows) < 0.1).astype(np.float32).reshape(-1, 1)
    ds = PackedDataset(arrays)

    # production fast path: rowwise-adagrad embedding updates (the standard
    # TPU-embedding optimizer: (V,) scalar accumulator per table, so each
    # step pays one table scatter instead of three; convergence-parity
    # tested vs sparse AdamW and exact dense AdamW)
    cfg = mind_config("dcn", batch_size=BATCH,
                      embedding_optimizer="rowwise_adagrad")
    model = build_ranker(cfg, "dcn")
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        state = trainer.fit(ds, max_epochs=1)          # epoch 0: compile + warmup
        t0 = time.perf_counter()
        state, metrics = trainer.train_epoch(state, ds, epoch=1)
        dt = time.perf_counter() - t0
    return metrics["steps"] * BATCH / dt


def cpu_baseline() -> float:
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import bench; print('CPU_RESULT', bench.measure({CPU_ROWS}))"
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
    value = measure(ROWS)
    baseline = cpu_baseline()
    vs = value / baseline if baseline > 0 else 0.0
    print(json.dumps({
        "metric": "dcn_e2e_train_examples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
