"""Benchmark: DCN train-step throughput (examples/sec/chip) on the default
backend (TPU under the driver), with a CPU-subprocess baseline for
``vs_baseline`` (BASELINE.json north star: >=3x examples/s/chip over CPU).

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import subprocess
import sys
import time

BATCH = 512          # reference training recipe batch size (train_cf_deep.yaml:48)
WARMUP = 5
STEPS = 100
CPU_STEPS = 20


def measure(steps: int) -> float:
    import jax

    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import AucHist, Trainer
    from news_recsys_tpu.zoo import mind_config, synthetic_batch

    import tempfile

    cfg = mind_config("dcn", batch_size=BATCH)
    model = build_ranker(cfg, "dcn")
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        batches = [jax.device_put(synthetic_batch(BATCH, seed=s)) for s in range(8)]
        state = trainer.init_state(batches[0])
        hist = AucHist.zeros()
        for i in range(WARMUP):
            state, hist, loss = trainer.train_step(state, hist, batches[i % 8])
        loss.block_until_ready()
        t0 = time.perf_counter()
        for i in range(steps):
            state, hist, loss = trainer.train_step(state, hist, batches[i % 8])
        loss.block_until_ready()
        dt = time.perf_counter() - t0
    return steps * BATCH / dt


def cpu_baseline() -> float:
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import bench; print('CPU_RESULT', bench.measure({CPU_STEPS}))"
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
    value = measure(STEPS)
    baseline = cpu_baseline()
    vs = value / baseline if baseline > 0 else 0.0
    print(json.dumps({
        "metric": "dcn_train_examples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
