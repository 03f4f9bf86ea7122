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


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_additive_attention(projected_queries: jax.Array,
                             projected_keys: jax.Array, mask: jax.Array,
                             energy_w: jax.Array, block_b: int = 128,
                             interpret: bool = False
                             ) -> Tuple[jax.Array, jax.Array]:
    """Fused masked additive attention.

    projected_queries: [B, H] = q @ W_q; projected_keys: [B, M, H] (values too);
    mask: [B, M]; energy_w: [H, 1]. Returns (context [B, H], weights [B, M]).
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
