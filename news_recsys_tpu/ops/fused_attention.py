"""Fused Transformer-block kernel (fwd + hand-derived bwd) for the
attention sequence ranker.

Why: the attention ranker's history tower runs ~25-30 tiny XLA ops per
block on (B, L=30, D=32) tensors — every matmul/transpose/reduction is a
separate kernel with a fixed few-us launch cost, so the block is
DISPATCH-bound, not FLOP-bound (~250 MFLOP/step measured at ~0.1% MFU;
``scripts/step_bisect.py --model attention``: fwd 147 us, bwd 162 us of a
~640 us step). This kernel collapses qkv -> masked MHSA -> proj -> LN ->
FF -> LN into ONE ``pallas_call`` (and one more for the backward), mapping
the awkward (L=30, D=32) shapes onto the MXU by:

- padding L to LP in {32, 64, 128} and flattening examples into row tiles
  of TR=512 rows (= TR/LP examples per tile);
- computing attention scores as 128x128 block-diagonal matmuls: each
  128-row block holds 128/LP whole examples, cross-example (and padded /
  invalid-key) scores are masked to -1e9 exactly like the XLA path, so
  softmax results are bit-comparable (masked lanes underflow to 0);
- accumulating parameter gradients across grid steps in the output refs
  (grid iterations run sequentially on-core).

The backward recomputes the forward from (x, mask, params) — at these
sizes recompute is cheaper than writing residuals to HBM.

Numerical parity with ``models.layers.TransformerBlock`` (flax) is
test-enforced in interpreter mode; layer norm mirrors flax's
fast-variance formula (var = E[x^2] - E[x]^2, eps 1e-6).

Reference capability this accelerates: the reference ships these attention
utils UNUSED (``/root/reference/src/model/model_utils/utils.py:20-61``);
here they are a live model family, so the kernel is the SURVEY §2.2
"CUDA-kernel equivalent" slot for sequence models.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 512          # rows (example x position) per grid step
NEG = -1e9        # masked-score value (matches layers.MultiHeadSelfAttention)
LN_EPS = 1e-6     # flax nn.LayerNorm default


def fused_attention_mode() -> str:
    """'compiled' | 'interpret' | 'off'.

    DEFAULT OFF — measured negative result (TPU v5 lite, batch 512, L=30,
    D=32, H=2, F=64; artifacts/fused_attention_r04.json): the kernel is
    dispatch-competitive in isolation (fwd 109 us vs XLA 97 us, fwd+bwd
    243 vs 224) but LOSES end-to-end (475k vs 608k ex/s) because the
    opaque pallas_call stops XLA overlapping the block with the
    surrounding step — the same failure mode as the r03 scatter-slab
    kernel (ops/__init__.py). Internally the kernel already hits
    ~0.1 us/matmul across its 768 small block-diagonal matmuls, so the
    remaining gap is structural (overlap), not schedule tuning. Kept as a
    parity-tested capability; enable with ``NRT_FUSED_ATTN=on`` (TPU) or
    ``interpret`` (tests).
    """
    env = os.environ.get("NRT_FUSED_ATTN", "auto").lower()
    if env == "interpret":
        return env
    if env == "on":
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover
            return "off"
        return "compiled" if platform == "tpu" else "off"
    return "off"


def _supported(L: int, D: int, F: int, H: int) -> bool:
    return (L <= 128 and D <= 128 and F <= 512 and D % H == 0
            and TR % 128 == 0)


def _pad_len(L: int) -> int:
    for lp in (32, 64, 128):
        if L <= lp:
            return lp
    raise ValueError(L)


def _ln(z, scale, bias):
    """flax LayerNorm with use_fast_variance=True."""
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + LN_EPS)
    return (z - mean) * inv * scale + bias


def _ln_bwd(dy, z, scale):
    """Gradient of y = LN(z)*scale + bias w.r.t. z (and the normalized x_hat
    needed for dscale)."""
    d = z.shape[-1]
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (z - mean) * inv
    dxhat = dy * scale
    dz = inv * (dxhat
                - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dz, xhat


def _attn_blocks(q, k, v, maskc_ref, lp: int, H: int, scale: float,
                 dao=None):
    """Shared fwd/bwd attention loop over 128-row blocks and heads.

    Forward (``dao is None``): returns attn_out (TR, D).
    Backward: returns (dq, dk, dv), each (TR, D).
    """
    n_blocks = q.shape[0] // 128
    D = q.shape[1]
    hd = D // H
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    blockdiag = (rows // lp) == (cols // lp)

    tile = pl.program_id(0)
    outs = []
    for b in range(n_blocks):
        sl = slice(b * 128, (b + 1) * 128)
        # maskc is passed UNBLOCKED (Mosaic requires sublane-divisible
        # block shapes; a (4, 128) block is not) — index the tile's rows
        mc = maskc_ref[tile * n_blocks + b, :][None, :] > 0  # (1,128) valid keys
        valid = blockdiag & mc
        head_outs = []
        for h in range(H):
            hs = slice(h * hd, (h + 1) * hd)
            qh = q[sl, hs]
            kh = k[sl, hs]
            vh = v[sl, hs]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(valid, s, NEG)
            p = jax.nn.softmax(s, axis=-1)
            if dao is None:
                head_outs.append(jnp.dot(p, vh,
                                         preferred_element_type=jnp.float32))
            else:
                daoh = dao[sl, hs]
                dp = jax.lax.dot_general(
                    daoh, vh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                ds = ds * scale
                dqh = jnp.dot(ds, kh, preferred_element_type=jnp.float32)
                dkh = jax.lax.dot_general(
                    ds, qh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dvh = jax.lax.dot_general(
                    p, daoh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                head_outs.append((dqh, dkh, dvh))
        if dao is None:
            outs.append(jnp.concatenate(head_outs, axis=1))
        else:
            outs.append(tuple(jnp.concatenate([ho[i] for ho in head_outs],
                                              axis=1) for i in range(3)))
    if dao is None:
        return jnp.concatenate(outs, axis=0)
    return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                 for i in range(3))


def _fwd_core(x, maskc_ref, params, lp: int, H: int):
    """The whole block on a (TR, D) row tile; returns intermediates needed
    by the backward."""
    (Wqkv, bqkv, Wo, bo, g1, b1, W1, c1, W2, c2, g2, b2) = params
    D = x.shape[1]
    hd = D // H
    scale = 1.0 / (hd ** 0.5)
    qkv = jnp.dot(x, Wqkv, preferred_element_type=jnp.float32) + bqkv
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    ao = _attn_blocks(q, k, v, maskc_ref, lp, H, scale)
    attn = jnp.dot(ao, Wo, preferred_element_type=jnp.float32) + bo
    z1 = x + attn
    y1 = _ln(z1, g1, b1)
    pre = jnp.dot(y1, W1, preferred_element_type=jnp.float32) + c1
    rel = jnp.maximum(pre, 0.0)
    ff = jnp.dot(rel, W2, preferred_element_type=jnp.float32) + c2
    z2 = y1 + ff
    y2 = _ln(z2, g2, b2)
    return y2, (q, k, v, ao, z1, y1, pre, rel, z2)


def _fwd_kernel(x_ref, maskc_ref, *param_refs, out_ref, lp: int, H: int):
    params = tuple(r[:] for r in param_refs)
    y2, _ = _fwd_core(x_ref[:], maskc_ref, params, lp, H)
    out_ref[:] = y2


def _bwd_kernel(x_ref, maskc_ref, dy_ref, *param_refs,
                dx_ref, dparam_refs, lp: int, H: int):
    params = tuple(r[:] for r in param_refs)
    (Wqkv, bqkv, Wo, bo, g1, b1, W1, c1, W2, c2, g2, b2) = params
    D = x_ref.shape[1]
    hd = D // H
    scale = 1.0 / (hd ** 0.5)
    x = x_ref[:]
    _, (q, k, v, ao, z1, y1, pre, rel, z2) = _fwd_core(
        x, maskc_ref, params, lp, H)
    dy2 = dy_ref[:]

    dz2, xhat2 = _ln_bwd(dy2, z2, g2)
    dg2 = jnp.sum(dy2 * xhat2, axis=0, keepdims=True)
    db2 = jnp.sum(dy2, axis=0, keepdims=True)

    dff = dz2
    dW2 = jax.lax.dot_general(rel, dff, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dc2 = jnp.sum(dff, axis=0, keepdims=True)
    drel = jax.lax.dot_general(dff, W2, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dpre = drel * (pre > 0).astype(jnp.float32)
    dW1 = jax.lax.dot_general(y1, dpre, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dc1 = jnp.sum(dpre, axis=0, keepdims=True)
    dy1 = dz2 + jax.lax.dot_general(dpre, W1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    dz1, xhat1 = _ln_bwd(dy1, z1, g1)
    dg1 = jnp.sum(dy1 * xhat1, axis=0, keepdims=True)
    db1 = jnp.sum(dy1, axis=0, keepdims=True)

    dattn = dz1
    dWo = jax.lax.dot_general(ao, dattn, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbo = jnp.sum(dattn, axis=0, keepdims=True)
    dao = jax.lax.dot_general(dattn, Wo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    dq, dk, dv = _attn_blocks(q, k, v, maskc_ref, lp, H, scale, dao=dao)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)
    dWqkv = jax.lax.dot_general(x, dqkv, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dx_ref[:] = dz1 + jax.lax.dot_general(
        dqkv, Wqkv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    grads = (dWqkv, dbqkv, dWo, dbo, dg1, db1, dW1, dc1, dW2, dc2, dg2, db2)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for ref, g in zip(dparam_refs, grads):
            ref[:] = g

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, g in zip(dparam_refs, grads):
            ref[:] = ref[:] + g


def _prep(x, mask, L: int):
    """(B, L, D) -> padded (rows, D) + column-mask (rows/128, 128); returns
    (x_rows, maskc, B_pad, LP)."""
    B, _, D = x.shape
    LP = _pad_len(L)
    ex_per_tile = TR // LP
    B_pad = -(-B // ex_per_tile) * ex_per_tile
    x = jnp.pad(x, ((0, B_pad - B), (0, LP - L), (0, 0)))
    mask = jnp.pad(mask, ((0, B_pad - B), (0, LP - L)))
    rows = B_pad * LP
    return (x.reshape(rows, D), mask.reshape(rows // 128, 128).astype(jnp.float32),
            B_pad, LP)


def _param_tuple(params: Dict[str, Any]):
    """Flatten the flax TransformerBlock param tree into the kernel's
    operand order, biases reshaped to (1, N)."""
    mh = params["MultiHeadSelfAttention_0"]
    ff1 = params["Linear_0"]["Dense_0"]
    ff2 = params["Linear_1"]["Dense_0"]
    ln1 = params["LayerNorm_0"]
    ln2 = params["LayerNorm_1"]
    r = lambda a: a.reshape(1, -1).astype(jnp.float32)
    return (mh["Linear_0"]["Dense_0"]["kernel"], r(mh["Linear_0"]["Dense_0"]["bias"]),
            mh["Linear_1"]["Dense_0"]["kernel"], r(mh["Linear_1"]["Dense_0"]["bias"]),
            r(ln1["scale"]), r(ln1["bias"]),
            ff1["kernel"], r(ff1["bias"]),
            ff2["kernel"], r(ff2["bias"]),
            r(ln2["scale"]), r(ln2["bias"]))


def _full_spec(shape):
    # same full block every grid step
    return pl.BlockSpec(shape, lambda t: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_block(x_rows, maskc, flat_params, lp, H, interpret):
    return _fused_fwd_call(x_rows, maskc, flat_params, lp, H, interpret)


def _fused_fwd_call(x_rows, maskc, flat_params, lp, H, interpret):
    rows, D = x_rows.shape
    grid = rows // TR
    kernel = functools.partial(_fwd_kernel, lp=lp, H=H)

    def body(x_ref, maskc_ref, *param_refs):
        kernel(x_ref, maskc_ref, *param_refs[:-1], out_ref=param_refs[-1])

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((rows, D), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((TR, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [_full_spec(p.shape) for p in flat_params],
        out_specs=pl.BlockSpec((TR, D), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_rows, maskc, *flat_params)


def _fused_block_fwd(x_rows, maskc, flat_params, lp, H, interpret):
    y = _fused_fwd_call(x_rows, maskc, flat_params, lp, H, interpret)
    return y, (x_rows, maskc, flat_params)


def _fused_block_bwd(lp, H, interpret, res, dy):
    x_rows, maskc, flat_params = res
    rows, D = x_rows.shape
    grid = rows // TR
    n_params = len(flat_params)

    def body(x_ref, maskc_ref, dy_ref, *refs):
        _bwd_kernel(x_ref, maskc_ref, dy_ref, *refs[:n_params],
                    dx_ref=refs[n_params], dparam_refs=refs[n_params + 1:],
                    lp=lp, H=H)

    out = pl.pallas_call(
        body,
        out_shape=[jax.ShapeDtypeStruct((rows, D), jnp.float32)]
        + [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat_params],
        grid=(grid,),
        in_specs=[pl.BlockSpec((TR, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((TR, D), lambda t: (t, 0), memory_space=pltpu.VMEM)]
        + [_full_spec(p.shape) for p in flat_params],
        out_specs=[pl.BlockSpec((TR, D), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)]
        + [_full_spec(p.shape) for p in flat_params],
        interpret=interpret,
    )(x_rows, maskc, dy, *flat_params)
    dx, dparams = out[0], tuple(out[1:])
    return dx, None, dparams


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_transformer_block(params: Dict[str, Any], x, mask, num_heads: int,
                            interpret: bool = False):
    """Apply one TransformerBlock via the fused kernel.

    ``params``: the flax param subtree of ``models.layers.TransformerBlock``;
    ``x``: (B, L, D) float32; ``mask``: (B, L) validity. Returns (B, L, D).
    Gradients flow to ``x`` and all params via the hand-written backward.

    Contract: examples whose mask is ALL-zero get garbage rows (they
    attend uniformly across their 128-row block instead of within the
    example) — callers must mask such examples downstream, which the
    attention ranker's target-aware pooling does (``alpha *= mask.sum>0``,
    ``seq_ranker.py``); their upstream gradient is zero so training math
    is unaffected. All other rows match the flax block to float32
    round-off (test-enforced).
    """
    B, L, D = x.shape
    flat = _param_tuple(params)
    F = flat[6].shape[1]
    if not _supported(L, D, F, num_heads):
        raise ValueError(f"unsupported fused-attention shape L={L} D={D} "
                         f"F={F} H={num_heads}")
    x_rows, maskc, B_pad, LP = _prep(x.astype(jnp.float32), mask, L)
    y = _fused_block(x_rows, maskc, flat, LP, num_heads, interpret)
    return y.reshape(B_pad, LP, D)[:B, :L, :]


def fused_block_supported(L: int, D: int, F: int, H: int) -> bool:
    return _supported(L, D, F, H)
