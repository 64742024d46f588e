"""Fused DCN-v1 cross-stack kernel.

The reference applies 3 cross layers as separate ops with BxDxD outer
products (``dcn_arch.py:14-30``). Here the whole stack
``x_{l+1} = x0 * (x_l @ w_l) + b_l + x_l`` runs in ONE Pallas kernel over a
batch tile: weights/biases for all layers sit in VMEM and the chain never
leaves the chip (no per-layer HBM round trips), using the rank-1 identity
``(x0 x_l^T) w == x0 * (x_l . w)``.

Backward is analytic (custom VJP) from saved per-layer scalars ``s_l``:

    ds_l = g . x0 ;  dw_l = x_l^T ds_l ;  db_l = sum_b g
    dx_l = g + w_l * ds_l ;  dx0 += g * s_l

Pure-XLA fallback off-TPU; CPU tests run the kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cross_xla(x0, ws, bs):
    """ws: (NL, D), bs: (NL, D)."""
    x = x0
    xs, ss = [], []
    for l in range(ws.shape[0]):
        xs.append(x)
        s = x @ ws[l]                     # (B,)
        ss.append(s)
        x = x0 * s[:, None] + bs[l] + x
    return x, (jnp.stack(xs), jnp.stack(ss))


def _kernel(x0_ref, w_ref, b_ref, out_ref, xs_ref, ss_ref, *, num_layers: int):
    x0 = x0_ref[...]                      # (TB, D)
    x = x0
    for l in range(num_layers):
        xs_ref[l] = x
        s = jnp.sum(x * w_ref[l][None, :], axis=1)   # (TB,)
        ss_ref[l] = s[:, None]
        x = x0 * s[:, None] + b_ref[l][None, :] + x
    out_ref[...] = x


def _cross_pallas(x0, ws, bs, interpret: bool, tile_b: int = 512):
    B, D = x0.shape
    NL = ws.shape[0]
    tb = min(tile_b, B)
    if B % tb != 0:
        return _cross_xla(x0, ws, bs)
    out, xs, ss = pl.pallas_call(
        functools.partial(_kernel, num_layers=NL),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, tb, D), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NL, tb, 1), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, D), x0.dtype),
            jax.ShapeDtypeStruct((NL, B, D), x0.dtype),
            jax.ShapeDtypeStruct((NL, B, 1), x0.dtype),
        ),
        interpret=interpret,
    )(x0, ws, bs)
    return out, (xs, ss[..., 0])


from . import pallas_mode


def _dispatch_cross(x0, ws, bs):
    mode = pallas_mode()
    if mode == "off":
        return _cross_xla(x0, ws, bs)
    return _cross_pallas(x0, ws, bs, interpret=(mode == "interpret"))


@jax.custom_vjp
def dcn_cross_stack(x0, ws, bs):
    """x0 (B, D), ws (NL, D), bs (NL, D) -> (B, D) after NL cross layers."""
    out, _ = _dispatch_cross(x0, ws, bs)
    return out


def _fwd(x0, ws, bs):
    out, (xs, ss) = _dispatch_cross(x0, ws, bs)
    return out, (x0, ws, xs, ss)


def _bwd(res, g):
    x0, ws, xs, ss = res
    NL = ws.shape[0]
    dx0_extra = jnp.zeros_like(x0)
    dws = []
    dbs = []
    for l in range(NL - 1, -1, -1):
        ds = jnp.sum(g * x0, axis=1)                 # (B,)
        dws.append(xs[l].T @ ds)                      # (D,)
        dbs.append(jnp.sum(g, axis=0))                # (D,)
        dx0_extra = dx0_extra + g * ss[l][:, None]
        g = g + ws[l][None, :] * ds[:, None]          # dL/dx_l
    dws = jnp.stack(dws[::-1])
    dbs = jnp.stack(dbs[::-1])
    return g + dx0_extra, dws, dbs


dcn_cross_stack.defvjp(_fwd, _bwd)


def reference_cross_stack(x0, ws, bs):
    """Direct transliteration of the reference per-layer math for tests
    (``dcn_arch.py:14-30``): cross = (x0 x_l^T) w."""
    x = x0
    for l in range(ws.shape[0]):
        outer = jnp.einsum("bi,bj->bij", x0, x)      # (B, D, D)
        cross = jnp.einsum("bij,j->bi", outer, ws[l])
        x = cross + bs[l] + x
    return x
