"""Micro-benchmark: Pallas kernels vs XLA fallbacks on the current backend.

Usage: python scripts/kernel_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    from news_recsys_tpu.ops import dcn_kernel, fm_kernel, fused_lookup_pool as flp

    rng = np.random.default_rng(0)
    print(f"backend: {jax.devices()[0].platform}")

    # --- fused lookup+pool: history pooling, wide table (B=512, L=50, 65k x 128)
    table = jnp.asarray(rng.standard_normal((65280, 128)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 65280, (512, 50)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (512, 50)), jnp.float32)
    t_pallas = timeit(jax.jit(lambda t, i, m: flp._pool_pallas(t, i, m, False)), table, ids, mask)
    t_xla = timeit(jax.jit(flp._pool_xla), table, ids, mask)
    print(f"lookup_pool  B=512 L=50 D=128: pallas {t_pallas:8.1f} us | xla {t_xla:8.1f} us")

    # --- FM second order (B=4096, F=5, D=15)
    v = jnp.asarray(rng.standard_normal((4096, 5, 15)), jnp.float32)
    t_pallas = timeit(jax.jit(lambda v: fm_kernel._fm_pallas(v, False)), v)
    t_xla = timeit(jax.jit(fm_kernel._fm_xla), v)
    print(f"fm_2nd_order B=4096 F=5 D=15: pallas {t_pallas:8.1f} us | xla {t_xla:8.1f} us")

    # --- DCN cross stack (B=4096, D=112, NL=3)
    x0 = jnp.asarray(rng.standard_normal((4096, 112)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((3, 112)) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.standard_normal((3, 112)) * 0.1, jnp.float32)
    t_pallas = timeit(jax.jit(lambda a, b, c: dcn_kernel._cross_pallas(a, b, c, False)[0]), x0, ws, bs)
    t_xla = timeit(jax.jit(lambda a, b, c: dcn_kernel._cross_xla(a, b, c)[0]), x0, ws, bs)
    print(f"dcn_cross    B=4096 D=112x3 : pallas {t_pallas:8.1f} us | xla {t_xla:8.1f} us")


if __name__ == "__main__":
    main()
