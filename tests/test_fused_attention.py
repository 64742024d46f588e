"""Parity tests for the fused Transformer-block Pallas kernel
(interpreter mode on the CPU test mesh) against the flax reference block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recsys_tpu.models.layers import TransformerBlock
from news_recsys_tpu.ops.fused_attention import (fused_block_supported,
                                                 fused_transformer_block)


def _setup(B=24, L=30, D=32, H=2, F=64, seed=0, empty_rows=()):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) > 0.25), jnp.float32)
    for r in empty_rows:
        mask = mask.at[r].set(0.0)
    blk = TransformerBlock(embed_dim=D, num_heads=H, ff_dim=F)
    params = blk.init(jax.random.PRNGKey(1), x, mask)["params"]
    return blk, params, x, mask


@pytest.mark.parametrize("B,L,H", [(24, 30, 2), (7, 12, 1), (130, 50, 4)])
def test_fused_block_forward_parity(B, L, H):
    blk, params, x, mask = _setup(B=B, L=L, H=H)
    y_ref = blk.apply({"params": params}, x, mask)
    y_new = fused_transformer_block(params, x, mask, num_heads=H,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_new),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_gradient_parity():
    """dx and every param grad match the flax block's autodiff. Upstream
    gradient is masked to valid positions, mirroring how the ranker's
    pooling consumes the block output (the kernel's documented contract
    for fully-empty examples)."""
    blk, params, x, mask = _setup(empty_rows=(3,))
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal(x.shape), jnp.float32) * mask[..., None]

    def loss_ref(p, xx):
        return jnp.sum(blk.apply({"params": p}, xx, mask) * w)

    def loss_new(p, xx):
        return jnp.sum(fused_transformer_block(p, xx, mask, num_heads=2,
                                               interpret=True) * w)

    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_n, gx_n = jax.grad(loss_new, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_n),
                               rtol=2e-4, atol=2e-5)
    flat_r = jax.tree_util.tree_flatten_with_path(gp_r)[0]
    flat_n = dict(jax.tree_util.tree_flatten_with_path(gp_n)[0])
    for path, val in flat_r:
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(flat_n[path]),
            rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_fused_ranker_model_parity(monkeypatch):
    """Whole AttentionSeqRanker forward: fused path == flax path, including
    examples with completely empty histories (zeroed by the pooling)."""
    from news_recsys_tpu.models.rankers import build_ranker
    from news_recsys_tpu.zoo import attention_arrays, attention_config

    cfg = attention_config(batch_size=16)
    model = build_ranker(cfg, "attention")
    arrays = attention_arrays(16)
    arrays["hist"][2] = 0
    arrays["hist_mask"][2] = 0.0
    batch = {k: jnp.asarray(v) for k, v in arrays.items()}
    params = model.init(jax.random.PRNGKey(0), batch)

    monkeypatch.setenv("NRT_FUSED_ATTN", "off")
    y_ref = model.apply(params, batch)
    monkeypatch.setenv("NRT_FUSED_ATTN", "interpret")
    y_new = model.apply(params, batch)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_new),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_supported_gates():
    assert fused_block_supported(30, 32, 64, 2)
    assert not fused_block_supported(200, 32, 64, 2)   # L > 128
    assert not fused_block_supported(30, 32, 64, 3)    # H does not divide D
