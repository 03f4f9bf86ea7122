"""Pallas TPU kernel: fused additive (Bahdanau) attention.

Fuses the energy computation (tanh(W_q q + W_k k) . v), masked softmax and the
weighted value reduction into one VMEM-resident kernel, so the [B, M, H]
intermediate never round-trips through HBM. The query/key projections stay
outside the kernel: they are plain matmuls the MXU already handles optimally.

Opt-in via ``ModelConfig(attention_impl="pallas")``; the default XLA path
(models/nn.py additive_attention) is numerically identical — tested in
tests/test_pallas_attention.py (interpret mode on CPU, compiled on TPU).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(query_ref, keys_ref, mask_ref, energy_ref,
                      context_ref, weights_ref):
    """One batch-block: energies -> masked softmax -> weighted sum of keys.

    query_ref:  [Bb, H]   projected queries (W_q q)
    keys_ref:   [Bb, M, H] projected keys (double as values)
    mask_ref:   [Bb, M]
    energy_ref: [H, 1]    energy vector
    context_ref: [Bb, H], weights_ref: [Bb, M]
    """
    queries = query_ref[:]                      # [Bb, H]
    keys = keys_ref[:]                          # [Bb, M, H]
    blk, m, h = keys.shape
    hidden = jnp.tanh(queries[:, None, :] + keys)  # [Bb, M, H] (VPU)
    scores = jax.lax.dot_general(
        hidden.reshape(blk * m, h), energy_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(blk, m)
    scores = jnp.where(mask_ref[:] > 0, scores, -1e9)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    unnormalized = jnp.exp(scores)
    denom = jnp.sum(unnormalized, axis=-1, keepdims=True)
    weights = unnormalized / denom              # [Bb, M]
    weights_ref[:] = weights
    # context[b, h] = sum_m weights[b, m] * keys[b, m, h]
    context_ref[:] = jax.lax.dot_general(
        weights[:, None, :], keys,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_additive_attention(projected_queries: jax.Array,
                             projected_keys: jax.Array, mask: jax.Array,
                             energy_w: jax.Array, block_b: int = 128,
                             interpret: bool = False
                             ) -> Tuple[jax.Array, jax.Array]:
    """Fused masked additive attention.

    projected_queries: [B, H] = q @ W_q; projected_keys: [B, M, H] (values too);
    mask: [B, M]; energy_w: [H, 1]. Returns (context [B, H], weights [B, M]).

    Differentiable: the forward runs the Pallas kernel; the backward is the
    analytic VJP in plain XLA (defined below) — the usual production pattern
    for Pallas ops (pallas_guide.md, "Patterns: Custom VJP").
    """
    batch, m, h = projected_keys.shape
    block = min(block_b, batch)
    grid = (pl.cdiv(batch, block),)
    context, weights = pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block, m, h), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block, m), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block, m), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, h), jnp.float32),
            jax.ShapeDtypeStruct((batch, m), jnp.float32),
        ],
        interpret=interpret,
    )(projected_queries, projected_keys, mask, energy_w)
    return context, weights


def _attention_fwd(projected_queries, projected_keys, mask, energy_w,
                   block_b=128, interpret=False):
    context, weights = fused_additive_attention(
        projected_queries, projected_keys, mask, energy_w,
        block_b=block_b, interpret=interpret)
    residuals = (projected_queries, projected_keys, mask, energy_w, weights)
    return (context, weights), residuals


def _attention_bwd(block_b, interpret, residuals, cotangents):
    """Analytic VJP of the fused attention (plain XLA; recomputes tanh)."""
    projected_queries, projected_keys, mask, energy_w, weights = residuals
    d_context, d_weights_in = cotangents

    # context = sum_m weights[b,m] * keys[b,m,h]
    d_weights = jnp.einsum("bh,bmh->bm", d_context, projected_keys)
    d_keys = weights[:, :, None] * d_context[:, None, :]
    d_weights = d_weights + d_weights_in

    # softmax backward (masked positions have weight exactly 0).
    inner = jnp.sum(weights * d_weights, axis=-1, keepdims=True)
    d_scores = weights * (d_weights - inner)

    # scores = tanh(pq[:,None,:] + keys) @ ew  (masked fill has zero gradient)
    hidden = jnp.tanh(projected_queries[:, None, :] + projected_keys)
    d_hidden = d_scores[:, :, None] * energy_w[None, None, :, 0]
    d_pre = d_hidden * (1.0 - hidden * hidden)
    d_energy = jnp.einsum("bmh,bm->h", hidden, d_scores)[:, None]
    d_pq = jnp.sum(d_pre, axis=1)
    d_keys = d_keys + d_pre
    return d_pq, d_keys, None, d_energy


fused_additive_attention.defvjp(_attention_fwd, _attention_bwd)
