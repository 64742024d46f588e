"""FM second-order interaction kernel.

Computes ``0.5 * sum_d [ (sum_f v_fd)^2 - sum_f v_fd^2 ]`` per example — the
½[(Σv)² − Σv²] identity the reference uses (``fm/model.py:18-26``) — as a
single Pallas kernel over batch tiles (one VMEM pass over v instead of
separate square/sum kernels), with an analytic custom VJP:
``d/dv_f = (Σv − v_f) * g``.

Pure-XLA fallback (identical math) off-TPU; CPU tests run the kernel in
interpreter mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fm_xla(v):
    sum_v = jnp.sum(v, axis=1)
    return 0.5 * jnp.sum(sum_v * sum_v - jnp.sum(v * v, axis=1), axis=1)


def _kernel(v_ref, out_ref):
    v = v_ref[...]                                  # (TB, F, D)
    sum_v = jnp.sum(v, axis=1)                      # (TB, D)
    sq_sum = jnp.sum(v * v, axis=1)                 # (TB, D)
    out_ref[...] = 0.5 * jnp.sum(sum_v * sum_v - sq_sum, axis=1, keepdims=True)


def _fm_pallas(v, interpret: bool, tile_b: int = 256):
    B, F, D = v.shape
    tb = min(tile_b, B)
    if B % tb != 0:
        return _fm_xla(v)
    out = pl.pallas_call(
        _kernel,
        grid=(B // tb,),
        in_specs=[pl.BlockSpec((tb, F, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), v.dtype),
        interpret=interpret,
    )(v)
    return out[:, 0]


from . import pallas_mode


def _dispatch_fm(v):
    mode = pallas_mode()
    if mode == "off":
        return _fm_xla(v)
    return _fm_pallas(v, interpret=(mode == "interpret"))


@jax.custom_vjp
def fm_second_order(v):
    """(B, F, D) field latent vectors -> (B,) second-order interaction."""
    return _dispatch_fm(v)


def _fwd(v):
    return _dispatch_fm(v), v


def _bwd(v, g):
    sum_v = jnp.sum(v, axis=1, keepdims=True)        # (B, 1, D)
    return ((sum_v - v) * g[:, None, None],)


fm_second_order.defvjp(_fwd, _bwd)
