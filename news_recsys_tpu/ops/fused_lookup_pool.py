"""Fused embedding lookup + masked mean-pool Pallas kernel.

The reference materializes the (B, L, D) gathered history embeddings and
then mean-pools them (``base_model.py:273-282``); on TPU that costs an HBM
round-trip of B*L*D floats. This kernel streams table rows HBM->VMEM with
double-buffered async DMA and accumulates the masked sum in VMEM, writing
only the (B, D) pooled result.

Forward is a Pallas kernel (grid over the batch, ids scalar-prefetched so
row DMAs can be issued before the kernel body); backward is a plain XLA
scatter-add into the table (embedding gradients are scatter-shaped no
matter what — XLA already emits the optimal scatter) via ``custom_vjp``.

Falls back to pure-XLA gather+pool (identical math) off-TPU or for shapes
where the kernel is not profitable; ``interpret=True`` is used automatically
on CPU so tests exercise the same kernel code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _pool_xla(table, ids, mask):
    emb = jnp.take(table, ids, axis=0)                      # (B, L, D)
    emb = emb * (ids != 0).astype(emb.dtype)[..., None]     # padding row 0
    m = mask.astype(emb.dtype)[..., None]
    return (emb * m).sum(axis=1) / (m.sum(axis=1) + EPS)


TILE_B = 8  # sublane-aligned batch tile (TPU blocks need 8-row alignment)


def _kernel(ids_ref, mask_ref, table_ref, out_ref, scratch, sems):
    """One 8-row batch tile per program.

    Per batch row: issue all L row-gather DMAs (HBM table -> (L, D) VMEM
    scratch, all in flight at once), wait, then reduce with ONE (1,L)x(L,D)
    matmul against the mask row — fully vectorized, no dynamic scalar VMEM
    reads (which Mosaic cannot lower). ``mask`` arrives pre-multiplied by
    ``(ids != 0)`` so padding rows carry zero weight.
    """
    i = pl.program_id(0)
    L = mask_ref.shape[1]
    b0 = i * TILE_B

    def dma(r, l):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[b0 + r, l]],
            scratch.at[l],
            sems.at[l],
        )

    rows = []
    for r in range(TILE_B):
        jax.lax.fori_loop(0, L, lambda l, _: (dma(r, l).start(), 0)[1], 0)
        jax.lax.fori_loop(0, L, lambda l, _: (dma(r, l).wait(), 0)[1], 0)
        w = mask_ref[r : r + 1, :]                                   # (1, L)
        pooled = jnp.dot(w, scratch[...], preferred_element_type=jnp.float32)
        rows.append(pooled / (jnp.sum(w) + EPS))
    out_ref[...] = jnp.concatenate(rows, axis=0)


def _pool_pallas(table, ids, mask, interpret: bool):
    B, L = ids.shape
    D = table.shape[1]
    # Dynamic-row DMA needs full 128-lane rows on current Mosaic (sub-lane
    # transfers from dynamically indexed HBM rows fail to lower); narrow
    # tables take the XLA gather path, which is near-optimal for them.
    if B % TILE_B != 0 or (not interpret and D % 128 != 0):
        return _pool_xla(table, ids, mask)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # ids available before kernel body
        grid=(B // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, L), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),      # table stays in HBM
        ],
        out_specs=pl.BlockSpec((TILE_B, D), lambda i, ids: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, D), jnp.float32),
            pltpu.SemaphoreType.DMA((L,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids, mask.astype(jnp.float32), table)


from . import pallas_mode


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_lookup_pool(table, ids, mask):
    """(V, D) table, (B, L) int ids, (B, L) mask -> (B, D) masked mean.

    Exact math parity with the reference pooling: padding id 0 contributes
    zero (value and grad); denominator is ``sum(mask) + 1e-8`` over
    non-padding entries.
    """
    return _fwd_impl(table, ids, mask)


def _fwd_impl(table, ids, mask):
    mask = mask.astype(jnp.float32) * (ids != 0).astype(jnp.float32)
    mode = pallas_mode()
    if mode == "off":
        return _pool_xla(table, ids, mask)
    return _pool_pallas(table, ids, mask, interpret=(mode == "interpret"))


def _fwd(table, ids, mask):
    out = _fwd_impl(table, ids, mask)
    return out, (table.shape, ids, mask)


def _bwd(res, g):
    (V, D), ids, mask = res
    m = mask.astype(jnp.float32) * (ids != 0).astype(jnp.float32)   # (B, L)
    denom = m.sum(axis=1, keepdims=True) + EPS                       # (B, 1)
    contrib = (g / denom)[:, None, :] * m[..., None]                 # (B, L, D)
    grad_table = jnp.zeros((V, D), g.dtype).at[ids.reshape(-1)].add(
        contrib.reshape(-1, D)
    )
    return grad_table, None, None


fused_lookup_pool.defvjp(_fwd, _bwd)


def reference_lookup_pool(table, ids, mask):
    """Pure-XLA reference used for kernel correctness tests."""
    mask = mask.astype(jnp.float32) * (ids != 0).astype(jnp.float32)
    return _pool_xla(table, ids, mask)
