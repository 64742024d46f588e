"""Core neural layers (flax.linen), with torch-compatible default inits.

Capability parity with the reference's ``src/model/model_utils/utils.py:6-61``
(MLP, MultiHeadSelfAttention, TransformerBlock). Initializers deliberately
match torch defaults (``U(±1/sqrt(fan_in))`` for Linear weight+bias) so that
training dynamics are comparable to the reference recipe at the same
hyperparameters.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    flax kernels are (fan_in, fan_out); torch stores (fan_out, fan_in) but the
    bound depends only on fan_in, so the distribution is identical.
    """
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """nn.Dense with torch-default initialization.

    ``dtype`` is the flax compute dtype: params stay float32, inputs/kernel
    are cast for the matmul (bf16 runs it at the MXU's doubled bf16 rate).
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
        )(x)


class MLP(nn.Module):
    """Linear+ReLU stack; no activation after the last layer.

    Mirrors the reference MLP (``utils.py:6-17``): ``dims`` are the hidden+out
    sizes (input size inferred from the input). With a bf16 ``dtype`` the
    matmuls run in bf16 (params stored float32); the final layer's output is
    cast back to float32 so logits/losses keep full precision.
    """

    dims: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n = len(self.dims)
        for i, d in enumerate(self.dims):
            x = Linear(d, dtype=self.dtype)(x)
            if i < n - 1:
                x = nn.relu(x)
        return x.astype(jnp.float32)


class MultiHeadSelfAttention(nn.Module):
    """Fused-QKV multi-head self attention (``utils.py:20-40``).

    One (B, N, C) -> (B, N, C) transform; the QKV projection is a single
    matmul so XLA maps it onto one large MXU op.
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        """mask: optional (B, N) validity mask over keys (1 = attend)."""
        assert self.embed_dim % self.num_heads == 0
        head_dim = self.embed_dim // self.num_heads
        B, N, C = x.shape
        qkv = Linear(3 * self.embed_dim)(x)                        # (B,N,3C)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)                          # (B,N,H,hd)
        q = jnp.transpose(q, (0, 2, 1, 3))                         # (B,H,N,hd)
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(head_dim, dtype=x.dtype))
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :] > 0, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v, preferred_element_type=jnp.float32)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C).astype(x.dtype)
        return Linear(self.embed_dim)(out)


class TransformerBlock(nn.Module):
    """Post-norm MHSA + FFN block with dropout (``utils.py:43-61``)."""

    embed_dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = MultiHeadSelfAttention(self.embed_dim, self.num_heads)(x, mask)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm()(x + attn)
        ffn = Linear(self.ff_dim)(x)
        ffn = nn.relu(ffn)
        ffn = Linear(self.embed_dim)(ffn)
        ffn = nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm()(x + ffn)
