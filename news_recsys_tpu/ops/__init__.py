"""Pallas kernels for the hot ops, with pure-XLA fallbacks.

Kernel selection defaults to the XLA paths everywhere, from MEASURED
on-chip data (``scripts/kernel_bench.py``, committed:
``artifacts/kernel_bench_r03.json``, v5e, device_get-synced scan loops):

- ``lookup_pool`` B=512 L=50 D=128: pallas 1007 us vs XLA 150 us — the
  per-row HBM->VMEM DMAs are latency-bound; XLA's fused gather wins.
- ``fm_2nd_order`` B=4096: pallas 137 us vs XLA 124 us.
- ``dcn_cross`` B=4096 D=112x3: pallas 151 us vs XLA 128 us.
- ``scatter_rows`` V=94k D=32 S=512: pallas 143 us vs XLA 156 us — the
  touched-slab kernel WINS in isolation, but end-to-end DCN training with
  it is ~7.5% slower (1.23M -> 1.14M ex/s): the opaque pallas_call stops
  XLA overlapping the scatter with the rest of the step, which outweighs
  the saved full-table pass. Default stays XLA.

All kernels are wired into the production paths behind this gate
(``EmbeddingCollection.embed_fields`` pooling, ``sparse_step`` rowwise
scatters, FM/DCN forwards) and parity-tested in interpreter mode on CPU:
set ``NRT_PALLAS=on`` to enable them on TPU, ``NRT_PALLAS=interpret`` to
run them interpreted (CPU test suite).
"""

from __future__ import annotations

import os

import jax


def pallas_mode() -> str:
    """'compiled' | 'interpret' | 'off'."""
    env = os.environ.get("NRT_PALLAS", "").lower()
    if env == "interpret":
        return env
    if env == "on":
        try:
            platform = jax.devices()[0].platform
        except Exception:
            return "off"
        return "compiled" if platform == "tpu" else "off"
    return "off"
