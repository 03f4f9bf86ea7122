"""Pallas fused attention == XLA additive attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_seq2seq_gscan_tpu.models import ModelConfig, init_model_params
from multimodal_seq2seq_gscan_tpu.models.nn import (
    additive_attention, sequence_mask)
from multimodal_seq2seq_gscan_tpu.models.params import _attention_init


def test_fused_attention_matches_xla():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    batch, m, h, q = 9, 17, 16, 16
    params = _attention_init(k1, key_size=h, query_size=q, hidden_size=h)
    queries = jax.random.normal(k2, (batch, q))
    keys = jax.random.normal(k3, (batch, m, h))
    projected_keys = keys @ params.key_w
    lengths = jnp.array([m, 3, 5, m, 1, 8, 17, 2, 9])
    mask = sequence_mask(lengths, m)

    ctx_xla, w_xla = additive_attention(params, queries, projected_keys,
                                        projected_keys, mask, impl="xla")
    ctx_pl, w_pl = additive_attention(params, queries, projected_keys,
                                      projected_keys, mask, impl="pallas")
    np.testing.assert_allclose(np.asarray(ctx_pl), np.asarray(ctx_xla),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_pl), np.asarray(w_xla), atol=1e-6)
    # Masked positions get exactly zero weight.
    assert float(np.abs(np.asarray(w_pl)[1, 3:]).max()) == 0.0


def test_model_forward_with_pallas_attention():
    """Full forward with attention_impl='pallas' equals the XLA forward."""
    from multimodal_seq2seq_gscan_tpu.models.model import forward
    base = ModelConfig(input_vocabulary_size=10, target_vocabulary_size=7,
                       num_cnn_channels=6, embedding_dimension=8,
                       encoder_hidden_size=12, decoder_hidden_size=12,
                       cnn_kernel_size=3, cnn_hidden_num_channels=5)
    pallas_config = base._replace(attention_impl="pallas")
    params = init_model_params(jax.random.PRNGKey(1), base)
    rng = np.random.RandomState(0)
    batch = 4
    input_ids = np.array([[1, 3, 4, 2, 0, 0], [1, 5, 2, 0, 0, 0],
                          [1, 6, 7, 8, 9, 2], [1, 4, 4, 2, 0, 0]], np.int32)
    input_lengths = np.array([4, 3, 6, 4], np.int32)
    target_ids = np.array([[1, 3, 4, 2, 0], [1, 5, 2, 0, 0],
                           [1, 6, 5, 4, 2], [1, 4, 2, 0, 0]], np.int32)
    situations = rng.rand(batch, 5, 5, 6).astype(np.float32)

    out_xla, _ = forward(params, base, jnp.asarray(input_ids),
                         jnp.asarray(input_lengths), jnp.asarray(situations),
                         jnp.asarray(target_ids), deterministic=True)
    out_pl, _ = forward(params, pallas_config, jnp.asarray(input_ids),
                        jnp.asarray(input_lengths), jnp.asarray(situations),
                        jnp.asarray(target_ids), deterministic=True)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=1e-5)


def test_fused_attention_gradients_match_xla():
    """Custom-VJP backward equals the XLA autodiff gradients."""
    rng = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    batch, m, h = 6, 11, 8
    params = _attention_init(k1, key_size=h, query_size=h, hidden_size=h)
    queries = jax.random.normal(k2, (batch, h))
    keys = jax.random.normal(k3, (batch, m, h))
    projected_keys = keys @ params.key_w
    lengths = jnp.array([m, 4, 7, 2, m, 5])
    mask = sequence_mask(lengths, m)
    cot_ctx = jax.random.normal(k4, (batch, h))

    def scalar(impl):
        def fn(q, k, e):
            p = params._replace(energy_w=e)
            ctx, w = additive_attention(p, q, k, k, mask, impl=impl)
            return jnp.sum(ctx * cot_ctx) + jnp.sum(w * w)
        return fn

    gx = jax.grad(scalar("xla"), argnums=(0, 1, 2))(
        queries, projected_keys, params.energy_w)
    gp = jax.grad(scalar("pallas"), argnums=(0, 1, 2))(
        queries, projected_keys, params.energy_w)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
