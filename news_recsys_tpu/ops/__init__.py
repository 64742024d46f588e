"""Pallas kernels for the hot ops, with pure-XLA fallbacks.

Kernel selection defaults to the XLA paths everywhere: honest
(device_get-synced) microbenchmarks show XLA's fused code matching or
beating these kernels at the model sizes this framework runs
(``scripts/kernel_bench.py``) — XLA's gather and elementwise fusion are
already near roofline for small-dim recsys ops. The kernels remain
first-class components (tested in interpreter mode on CPU, compiled-mode
capable on TPU) for the regimes where manual control wins (wider dims,
deeper fusion) — set ``NRT_PALLAS=on`` to enable them on TPU,
``NRT_PALLAS=interpret`` to run them interpreted (CPU test suite).
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
