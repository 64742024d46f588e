"""Pallas kernels for the hot ops, with pure-XLA fallbacks.

Kernel selection: on TPU the compiled Pallas path runs; elsewhere the
identical-math XLA fallback. Set ``NRT_PALLAS=interpret`` to force the
Pallas kernels through the interpreter (used by the CPU test suite to
exercise kernel code paths), or ``NRT_PALLAS=off`` to force the XLA
fallback everywhere.
"""

from __future__ import annotations

import os

import jax


def pallas_mode() -> str:
    """'compiled' | 'interpret' | 'off'."""
    env = os.environ.get("NRT_PALLAS", "").lower()
    if env in ("interpret", "off"):
        return env
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return "off"
    return "compiled" if platform == "tpu" else "off"
