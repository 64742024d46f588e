"""Micro-benchmark: Pallas kernels vs XLA fallbacks on the current backend.

Each op runs ITERS times inside one jitted lax.scan with a loop-carried
perturbation of a float input (prevents loop-invariant hoisting / CSE);
completion is forced with a scalar device_get — `block_until_ready` does not
reliably block through remote-tunnel backends, and per-call dispatch latency
would otherwise mask microsecond kernels.

Usage: python scripts/kernel_bench.py [--json artifacts/kernel_bench_rNN.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 200

RESULTS = []


def record(name, shape, t_pallas, t_xla):
    RESULTS.append({"op": name, "shape": shape,
                    "pallas_us": round(t_pallas, 2), "xla_us": round(t_xla, 2),
                    "winner": "pallas" if t_pallas < t_xla else "xla"})
    print(f"{name:13s} {shape}: pallas {t_pallas:8.1f} us | xla {t_xla:8.1f} us")


def bench(body_fn, *args):
    """body_fn(carry, *args) -> scalar; returns us/iter."""

    @jax.jit
    def run(*a):
        def body(carry, _):
            return body_fn(carry, *a), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    float(jax.device_get(run(*args)))  # compile + warmup
    t0 = time.perf_counter()
    float(jax.device_get(run(*args)))
    return (time.perf_counter() - t0) / ITERS * 1e6


def main():
    from news_recsys_tpu.ops import dcn_kernel, fm_kernel, fused_lookup_pool as flp

    rng = np.random.default_rng(0)
    print(f"backend: {jax.devices()[0].platform}")
    eps = jnp.float32(1e-38)

    # --- fused lookup+pool: history pooling, wide table (B=512, L=50, 65k x 128)
    table = jnp.asarray(rng.standard_normal((65280, 128)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 65280, (512, 50)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (512, 50)), jnp.float32)

    def pool_body(impl):
        def body(carry, table, ids, mask):
            out = impl(table, ids, mask + carry * eps)
            return carry + jnp.sum(out) * eps
        return body

    t_pallas = bench(pool_body(lambda t, i, m: flp._pool_pallas(t, i, m, False)), table, ids, mask)
    t_xla = bench(pool_body(flp._pool_xla), table, ids, mask)
    record("lookup_pool", "B=512 L=50 D=128", t_pallas, t_xla)

    # --- FM second order (B=4096, F=5, D=15)
    v = jnp.asarray(rng.standard_normal((4096, 5, 15)), jnp.float32)

    def fm_body(impl):
        def body(carry, v):
            out = impl(v + carry * eps)
            return carry + jnp.sum(out) * eps
        return body

    t_pallas = bench(fm_body(lambda v: fm_kernel._fm_pallas(v, False)), v)
    t_xla = bench(fm_body(fm_kernel._fm_xla), v)
    record("fm_2nd_order", "B=4096 F=5 D=15", t_pallas, t_xla)

    # --- DCN cross stack (B=4096, D=112, NL=3)
    x0 = jnp.asarray(rng.standard_normal((4096, 112)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((3, 112)) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.standard_normal((3, 112)) * 0.1, jnp.float32)

    def dcn_body(impl):
        def body(carry, x0, ws, bs):
            out = impl(x0 + carry * eps, ws, bs)[0]
            return carry + jnp.sum(out) * eps
        return body

    t_pallas = bench(dcn_body(lambda a, b, c: dcn_kernel._cross_pallas(a, b, c, False)), x0, ws, bs)
    t_xla = bench(dcn_body(dcn_kernel._cross_xla), x0, ws, bs)
    record("dcn_cross", "B=4096 D=112x3", t_pallas, t_xla)

    # --- sparse row scatter (rowwise-optimizer write-back): table is
    # loop-CARRIED, exactly like the training scan — the aliased Pallas
    # buffer is then dead and no defensive copy is inserted.
    from news_recsys_tpu.ops import scatter_rows as sr

    for v_real, d, s in ((94058, 32, 512), (65239, 32, 512), (94058, 32, 2048)):
        v = ((v_real + 1 + 127) // 128) * 128   # padded_vocab
        tbl0 = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
        rows = jnp.asarray(np.sort(rng.integers(0, v_real, s)), jnp.int32)
        vals = jnp.asarray(rng.standard_normal((s, d)), jnp.float32)

        def scatter_time(impl):
            @jax.jit
            def run(tbl, rows, vals):
                def body(carry, _):
                    tbl, c = carry
                    tbl = impl(tbl, rows, vals + c * eps)
                    return (tbl, c + tbl[0, 0] * eps), None
                (tbl, c), _ = jax.lax.scan(body, (tbl, jnp.float32(0.0)),
                                           None, length=ITERS)
                return c

            float(jax.device_get(run(tbl0, rows, vals)))  # compile + warmup
            t0 = time.perf_counter()
            float(jax.device_get(run(tbl0, rows, vals)))
            return (time.perf_counter() - t0) / ITERS * 1e6

        t_pallas = scatter_time(lambda t, r, w: sr._scatter_pallas(t, r, w))
        t_xla = scatter_time(sr._scatter_xla)
        record("scatter_rows", f"V={v_real} D={d} S={s}", t_pallas, t_xla)

    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"backend": jax.devices()[0].platform,
                       "iters": ITERS, "results": RESULTS}, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
