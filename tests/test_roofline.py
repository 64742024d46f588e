"""Roofline accounting (utils/roofline.py): XLA cost extraction and the
utilisation arithmetic — runs on the forced-CPU test backend, where
``device_peaks`` must return None and ``step_utilisation`` must degrade to
the raw per-step numbers."""

import jax
import jax.numpy as jnp

from news_recsys_tpu.utils.roofline import (compiled_cost, device_peaks,
                                            step_utilisation)


def test_compiled_cost_matmul():
    def f(a, b):
        return (a @ b).sum()

    a = jnp.ones((64, 64), jnp.float32)
    cost = compiled_cost(jax.jit(f), a, a)
    assert cost is not None
    # 2*64^3 matmul FLOPs (+64^2 for the sum); XLA may fold some, so just
    # require the right order of magnitude and nonzero traffic
    assert cost["flops"] >= 2 * 64**3
    assert cost["bytes"] > 0


def test_device_peaks_unknown_on_cpu():
    assert device_peaks(jax.devices("cpu")[0]) is None


def test_step_utilisation_known_chip():
    class FakeDev:
        device_kind = "TPU v5 lite"

    # 1 GFLOP + 1 MB in 1 ms on a v5e: mfu = 1e9/1e-3/197e12, bw = 1e6/1e-3/819e9
    out = step_utilisation(1e9, 1e6, 1e-3, device=FakeDev())
    assert out["device"] == "TPU v5 lite"
    assert abs(out["mfu_pct"] - 100 * 1e12 / 197e12) < 0.01
    assert abs(out["hbm_bw_util_pct"] - 100 * 1e9 / 819e9) < 0.05
    assert out["step_time_us"] == 1000.0


def test_step_utilisation_unknown_chip():
    out = step_utilisation(1e9, 1e6, 1e-3, device=jax.devices("cpu")[0])
    assert "mfu_pct" not in out and "device" not in out
    assert out["flops_per_step"] == 1e9
