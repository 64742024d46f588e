"""Micro-benchmark: strategies for applying N (row, val) updates to a (V, D)
embedding table on TPU.

Round-3 established (artifacts/step_breakdown_r03.json) that XLA's TPU
(V, D) set-scatter serializes per update row (~50 ns/row), making the
attention ranker's 15.9k-slot update the dominant wall (~0.8 ms of a
~1.06 ms step). This script measures every replacement strategy end to end
so the production choice (training/sparse_step.py) is data, not theory:

- scatter2d      : table.at[rows].set(vals)          (the r03 baseline)
- scatter1d_set  : (V,) set-scatter of N scalars     (per-element reference)
- scatter1d_add  : (V,) add-scatter of N scalars
- flat_scatter   : (V*D,) set-scatter of N*D scalars (row-major expansion)
- dense_inv      : SORT-FREE dense rewrite — build the inverse map
                   inv[v] = slot index of v via ONE (V,) set-scatter, then
                   table_new = where(hit, vals[inv], table): V-bandwidth-
                   bound + one cheap 1-D scatter, no sort needed
- dense_sorted   : dense rewrite from SORTED rows via searchsorted
                   (no scatter at all)
- sort_packed    : the packed uint32 sort alone at this N (context: the
                   other half of the attention dedup wall)
- colwise_1d     : D separate (V,) add-scatters (tests whether 1-D scatter
                   throughput beats the 2-D row loop even at D x the calls)

Timing: jitted lax.scan of ITERS iterations with a loop-carried float
perturbation (prevents hoisting/CSE), scalar device_get to force completion
through the tunnelled backend, EMPTY-scan overhead measured and subtracted,
min over ROUNDS interleaved rounds (shared chip drifts +-30%).

Usage: python scripts/scatter_strategies.py [--json artifacts/scatter_strategies_r04.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 512
ROUNDS = 5
D = 32

RESULTS = []


def bench_factory():
    """Returns (bench, finalize): bench measures us/iter minus empty-scan
    overhead, min over ROUNDS interleaved rounds."""
    cases = []

    def register(name, meta, body_fn, *args):
        @jax.jit
        def run(*a):
            def body(carry, _):
                return body_fn(carry, *a), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        float(jax.device_get(run(*args)))  # compile + warm
        cases.append((name, meta, run, args, []))

    def finalize():
        @jax.jit
        def empty():
            def body(carry, _):
                return carry, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        float(jax.device_get(empty()))
        overheads = []
        for _ in range(ROUNDS):
            for name, meta, run, args, times in cases:
                t0 = time.perf_counter()
                float(jax.device_get(run(*args)))
                times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jax.device_get(empty()))
            overheads.append(time.perf_counter() - t0)
        oh = min(overheads)
        out = []
        for name, meta, run, args, times in cases:
            us = max(0.0, (min(times) - oh)) / ITERS * 1e6
            out.append({**meta, "strategy": name, "us": round(us, 2)})
            print(f"  {name:14s} {meta}: {us:9.2f} us")
        return out, oh / ITERS * 1e6

    return register, finalize


EPS = jnp.float32(1e-38)


def main():
    print(f"backend: {jax.devices()[0].platform}")
    rng = np.random.default_rng(0)

    configs = [(65248, 512), (65248, 2048), (65248, 15872), (94080, 512)]
    if "--configs" in sys.argv:  # e.g. --configs 65248:15872,65248:512
        arg = sys.argv[sys.argv.index("--configs") + 1]
        configs = [tuple(int(x) for x in c.split(":")) for c in arg.split(",")]
    for V, N in configs:
        register, finalize = bench_factory()
        meta = {"V": V, "N": N, "D": D}
        table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
        # unique rows (worst case for dedup value, standard for scatter cost):
        # random distinct ids, plus a SORTED copy for the sorted strategies
        rows_np = rng.choice(V - 2, size=min(N, V - 2), replace=False).astype(np.int32) + 1
        if len(rows_np) < N:  # N > V: pad by repeating (set semantics still fine)
            rows_np = np.concatenate([rows_np, rows_np[: N - len(rows_np)]])
        rows = jnp.asarray(rows_np)
        rows_sorted = jnp.sort(rows)
        vals = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
        acc = jnp.asarray(rng.standard_normal((V,)), jnp.float32)
        svals = jnp.asarray(rng.standard_normal((N,)), jnp.float32)

        def consume(carry, t):
            # touch a fixed cheap slice so the full result must materialize
            return carry + jnp.sum(t[:8]) * EPS

        def scatter2d(carry, table, rows, vals):
            t = table.at[rows].set(vals + carry * EPS)
            return consume(carry, t)

        def scatter1d_set(carry, acc, rows, svals):
            a = acc.at[rows].set(svals + carry * EPS)
            return carry + jnp.sum(a[:8]) * EPS

        def scatter1d_add(carry, acc, rows, svals):
            a = acc.at[rows].add(svals + carry * EPS)
            return carry + jnp.sum(a[:8]) * EPS

        def flat_scatter(carry, table, rows, vals):
            idx = (rows[:, None] * D + jnp.arange(D)[None, :]).reshape(-1)
            t = table.reshape(-1).at[idx].set((vals + carry * EPS).reshape(-1))
            return consume(carry, t.reshape(V, D))

        def dense_inv(carry, table, rows, vals):
            inv = jnp.full((V,), N, jnp.int32).at[rows].set(
                jnp.arange(N, dtype=jnp.int32))
            hit = inv < N
            safe = jnp.minimum(inv, N - 1)
            t = jnp.where(hit[:, None], (vals + carry * EPS)[safe], table)
            return consume(carry, t)

        def dense_sorted(carry, table, rows_sorted, vals):
            idx = jnp.searchsorted(rows_sorted, jnp.arange(V, dtype=jnp.int32))
            safe = jnp.minimum(idx, N - 1)
            hit = rows_sorted[safe] == jnp.arange(V, dtype=jnp.int32)
            t = jnp.where(hit[:, None], (vals + carry * EPS)[safe], table)
            return consume(carry, t)

        def sort_packed(carry, rows):
            idx_bits = max(1, (N - 1).bit_length())
            packed = ((rows.astype(jnp.uint32) + carry.astype(jnp.uint32))
                      << idx_bits) | jnp.arange(N, dtype=jnp.uint32)
            s = jax.lax.sort(packed)
            return carry + (s[0] % 7).astype(jnp.float32) * EPS

        def scatter2d_add(carry, table, rows, vals):
            t = table.at[rows].add(vals + carry * EPS)
            return consume(carry, t)

        # production-like id stream: uniform draws with duplicates + padding
        ids_dup = jnp.asarray(
            np.where(rng.random(N) < 0.03, 0,
                     rng.integers(1, V - 1, N)).astype(np.int32))

        def scatter2d_add_dup(carry, table, ids_dup, vals):
            safe = jnp.where(ids_dup > 0, ids_dup, V)
            t = table.at[safe].add(vals + carry * EPS)
            return consume(carry, t)

        def dense_adagrad_route(carry, table, acc, ids_dup, vals):
            from news_recsys_tpu.training.sparse_step import (
                dense_rowwise_adagrad_update)
            t, a = dense_rowwise_adagrad_update(
                table, acc, ids_dup, vals + carry * EPS, 0.01, max_id=V - 2)
            return consume(carry, t) + jnp.sum(a[:8]) * EPS

        def sorted_adagrad_route(carry, table, acc, ids_dup, vals):
            from news_recsys_tpu.training.sparse_step import (
                _dedup_rows, rowwise_adagrad_update)
            rows2, g2, _ = _dedup_rows(ids_dup, vals + carry * EPS,
                                       spare_row=V - 1, max_id=V - 2)
            t, a = rowwise_adagrad_update(table, acc, rows2, g2, 0.01)
            return consume(carry, t) + jnp.sum(a[:8]) * EPS

        def colwise_1d(carry, table, rows, vals):
            cols = []
            v = vals + carry * EPS
            for d in range(D):
                cols.append(table[:, d].at[rows].add(v[:, d]))
            t = jnp.stack(cols, axis=1)
            return consume(carry, t)

        only = None
        if "--variants" in sys.argv:
            only = set(sys.argv[sys.argv.index("--variants") + 1].split(","))

        def reg(name, *a):
            if only is None or name in only:
                register(name, *a)

        print(f"V={V} N={N} D={D}")
        reg("scatter2d", meta, scatter2d, table, rows, vals)
        reg("scatter1d_set", meta, scatter1d_set, acc, rows, svals)
        reg("scatter1d_add", meta, scatter1d_add, acc, rows, svals)
        reg("flat_scatter", meta, flat_scatter, table, rows, vals)
        reg("dense_inv", meta, dense_inv, table, rows, vals)
        reg("dense_sorted", meta, dense_sorted, table, rows_sorted, vals)
        reg("sort_packed", meta, sort_packed, rows)
        reg("scatter2d_add", meta, scatter2d_add, table, rows, vals)
        reg("scatter2d_add_dup", meta, scatter2d_add_dup, table, ids_dup, vals)
        reg("dense_adagrad_route", meta, dense_adagrad_route,
                 table, acc, ids_dup, vals)
        reg("sorted_adagrad_route", meta, sorted_adagrad_route,
                 table, acc, ids_dup, vals)
        if N <= 2048:
            reg("colwise_1d", meta, colwise_1d, table, rows, vals)
        out, oh = finalize()
        print(f"  (empty-scan overhead {oh:.2f} us/iter)")
        RESULTS.extend(out)

    path = None
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
    if path:
        with open(path, "w") as f:
            json.dump({
                "what": ("strategies for N-row updates to a (V, D) embedding "
                         "table; see module docstring for definitions"),
                "backend": jax.devices()[0].platform,
                "method": (f"jit scan x{ITERS}, empty-scan overhead "
                           f"subtracted, min of {ROUNDS} interleaved rounds"),
                "results": RESULTS,
            }, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
