"""Slab-streaming vs device-resident input-path throughput (VERDICT r03
weak-point #5).

Full MIND packed data (~60 MB) is far below the 2 GiB
``device_resident_bytes`` default, so the production slab path
(``trainer.py``: host gathers a contiguous multi-step slab per dispatch,
same chunked scan fn with identity indices) normally never runs on real
data. This bench forces the budget below the dataset size and records the
throughput cost of streaming — proving the >HBM-dataset path sustains
rate, not just passes its CPU equivalence test.

Usage: python scripts/slab_bench.py [--json artifacts/slab_bench_r04.json]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root benchmark helpers (dataset builder, timed epochs)

ROWS = 512 * 1024
SLAB_BUDGET = 4 << 20   # 4 MiB — forces ~300-step slabs at batch 512


def measure(budget_bytes=None):
    from news_recsys_tpu.data.packed_dataset import PackedDataset
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.training.trainer import Trainer
    from news_recsys_tpu.zoo import mind_config

    ds = PackedDataset(bench._ranking_arrays(ROWS))
    cfg = mind_config("dcn", batch_size=bench.BATCH,
                      embedding_optimizer="rowwise_adagrad")
    model = build_ranker(cfg, "dcn")
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(cfg, model, workdir=tmp, use_mesh=False)
        if budget_bytes is not None:
            trainer.device_resident_bytes = budget_bytes
        packer = trainer._packer(ds)
        resident = trainer._use_device_resident(packer)
        _, best, med = bench._timed_epoch(trainer, ds)
        return {"examples_per_sec_best": round(best, 1),
                "examples_per_sec_median": round(med, 1),
                "device_resident": bool(resident),
                "dataset_bytes": int(packer.int_mat.nbytes + packer.float_mat.nbytes),
                **({"budget_bytes": int(budget_bytes)} if budget_bytes else {})}


def main():
    import jax

    print(f"backend: {jax.devices()[0].platform}")
    res = {}
    res["device_resident"] = measure()
    print("device_resident:", res["device_resident"])
    assert res["device_resident"]["device_resident"]
    res["slab_streamed"] = measure(SLAB_BUDGET)
    print("slab_streamed:", res["slab_streamed"])
    assert not res["slab_streamed"]["device_resident"]
    ratio = (res["slab_streamed"]["examples_per_sec_best"]
             / res["device_resident"]["examples_per_sec_best"])
    res["slab_vs_resident"] = round(ratio, 3)
    print(f"slab/resident throughput ratio: {ratio:.3f}")

    path = None
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
    if path:
        with open(path, "w") as f:
            json.dump({
                "what": ("DCN e2e train throughput with the input slab-"
                         "streaming path forced (device_resident_bytes "
                         "budget below dataset size) vs the default "
                         "device-resident path; see scripts/slab_bench.py"),
                "backend": jax.devices()[0].platform,
                "rows": ROWS, "batch": bench.BATCH,
                "results": res,
            }, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
