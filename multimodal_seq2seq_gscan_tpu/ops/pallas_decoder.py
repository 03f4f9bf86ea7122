"""Pallas TPU kernel: fused K-step greedy-decoder block.

The per-token decode step (embed -> textual attention -> conditional visual
attention -> LSTM cell -> output head -> argmax -> EOS bookkeeping; the
reference's BahdanauAttentionDecoderRNN.forward_step, seq2seq/model.py:24-160)
is latency-bound on TPU: every op is tiny (H=100, V~10), so XLA's per-step
op-dispatch overhead on the sequential chain dominates device time
(documentation/PERFORMANCE.md, "~6.8 ms/step is genuine device time").

This kernel runs K decoder steps for one batch block entirely in VMEM — the
hidden state, attention keys, and every decoder weight stay on-chip across
steps, and the K-step loop is unrolled at trace time so Mosaic schedules the
whole block as one program.  It slots into the hierarchical early-exit loop
of decode/greedy.py as a drop-in replacement for the inner ``lax.scan`` block
(same carry, same per-step outputs, same EOS semantics), so the while_loop
early exit and the Pallas fusion compose.

Scope: inference (greedy decode) with num_decoder_layers == 1 — the flagship
configuration.  The general XLA path remains the default; opt in via
``make_greedy_decoder(..., decode_impl="pallas")``.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attend(pq, keys, mask, energy_w):
    """Masked additive attention given pre-projected queries/keys.

    pq: [Bb, H]; keys: [Bb, M, H] (double as values); mask: [Bb, M] or None;
    energy_w: [H, 1].  Returns (context [Bb, H], weights [Bb, M]).
    """
    blk, m, h = keys.shape
    hidden = jnp.tanh(pq[:, None, :] + keys)                      # [Bb, M, H]
    scores = jax.lax.dot_general(
        hidden.reshape(blk * m, h), energy_w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(blk, m)
    if mask is not None:
        scores = jnp.where(mask > 0, scores, -1e9)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    unnormalized = jnp.exp(scores)
    weights = unnormalized / jnp.sum(unnormalized, axis=-1, keepdims=True)
    context = jax.lax.dot_general(
        weights[:, None, :], keys,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]
    return context, weights


def _make_kernel(num_steps: int, sos_idx: int, eos_idx: int):
    del sos_idx  # start tokens are part of the carry, not the kernel

    def kernel(proj_txt_ref, cmd_mask_ref, proj_vis_ref, h_ref, c_ref,
               tokens_ref, done_ref,
               txt_qw_ref, txt_ew_ref, q2k_w_ref, q2k_b_ref,
               vis_qw_ref, vis_ew_ref, emb_ref, w_ih_ref, w_hh_ref, bias_ref,
               out_w_ref, out_proj_ref,
               h_out_ref, c_out_ref, tokens_out_ref, done_out_ref,
               step_tokens_ref, step_emitted_ref, step_attn_cmd_ref,
               step_attn_sit_ref):
        proj_txt = proj_txt_ref[:]          # [Bb, M_t, H]
        cmd_mask = cmd_mask_ref[:]          # [Bb, M_t]
        proj_vis = proj_vis_ref[:]          # [Bb, M_v, H]
        h = h_ref[:]                        # [Bb, H]
        c = c_ref[:]
        tokens = tokens_ref[:]              # [Bb, 1] int32
        done = done_ref[:]                  # [Bb, 1] f32 (1.0 = finished)
        embedding = emb_ref[:]              # [V, E]
        vocab = embedding.shape[0]
        blk = h.shape[0]

        vocab_iota = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)

        # fori_loop, not a trace-time unroll: unrolled steps blow up the
        # Mosaic program and AOT compile time (see pallas_teacher_forced.py).
        def step(t, carry):
            tokens, done, h, c = carry
            # Embedding lookup as a one-hot matmul (vocab is ~10 tokens; a
            # gather would be a strided DMA, the matmul stays on the MXU).
            onehot = (tokens == vocab_iota).astype(jnp.float32)   # [Bb, V]
            embedded = jnp.dot(onehot, embedding,
                               preferred_element_type=jnp.float32)  # [Bb, E]

            pq_txt = jnp.dot(h, txt_qw_ref[:],
                             preferred_element_type=jnp.float32)
            ctx_cmd, attn_cmd = _attend(pq_txt, proj_txt, cmd_mask,
                                        txt_ew_ref[:])

            joint = jnp.concatenate([h, ctx_cmd], axis=-1)        # [Bb, 2H]
            vq = jnp.tanh(jnp.dot(joint, q2k_w_ref[:],
                                  preferred_element_type=jnp.float32)
                          + q2k_b_ref[:])
            pq_vis = jnp.dot(vq, vis_qw_ref[:],
                             preferred_element_type=jnp.float32)
            ctx_sit, attn_sit = _attend(pq_vis, proj_vis, None, vis_ew_ref[:])

            lstm_in = jnp.concatenate([embedded, ctx_cmd, ctx_sit], axis=-1)
            gates = (jnp.dot(lstm_in, w_ih_ref[:],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(h, w_hh_ref[:],
                               preferred_element_type=jnp.float32)
                     + bias_ref[:])
            gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(gf) * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
            h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)

            pre = jnp.concatenate([embedded, h_new, ctx_cmd, ctx_sit], axis=-1)
            logits = jnp.dot(jnp.dot(pre, out_w_ref[:],
                                     preferred_element_type=jnp.float32),
                             out_proj_ref[:],
                             preferred_element_type=jnp.float32)  # [Bb, V]
            next_tokens = jnp.argmax(logits, axis=-1
                                     ).astype(jnp.int32)[:, None]  # [Bb, 1]

            emitting = 1.0 - done                                  # [Bb, 1]
            keep = emitting > 0
            h = jnp.where(keep, h_new, h)
            c = jnp.where(keep, c_new, c)
            tokens_out = jnp.where(keep, next_tokens, 0)
            tokens = jnp.where(keep, next_tokens, tokens)
            done = jnp.maximum(
                done, (next_tokens == eos_idx).astype(jnp.float32))

            step_tokens_ref[pl.ds(t, 1), :] = tokens_out.reshape(1, blk)
            step_emitted_ref[pl.ds(t, 1), :] = emitting.reshape(1, blk)
            step_attn_cmd_ref[pl.ds(t, 1)] = attn_cmd[None]
            step_attn_sit_ref[pl.ds(t, 1)] = attn_sit[None]
            return tokens, done, h, c

        tokens, done, h, c = jax.lax.fori_loop(
            0, num_steps, step, (tokens, done, h, c))
        h_out_ref[:] = h
        c_out_ref[:] = c
        tokens_out_ref[:] = tokens
        done_out_ref[:] = done

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "sos_idx", "eos_idx", "block_b", "interpret"))
def fused_decode_block(proj_textual: jax.Array, cmd_mask: jax.Array,
                       proj_visual: jax.Array, h: jax.Array, c: jax.Array,
                       tokens: jax.Array, done: jax.Array,
                       weights: Tuple[jax.Array, ...], *, num_steps: int,
                       sos_idx: int, eos_idx: int, block_b: int = 128,
                       interpret: bool = False):
    """Run ``num_steps`` fused greedy-decoder steps.

    proj_textual: [B, M_t, H]; cmd_mask: [B, M_t]; proj_visual: [B, M_v, H];
    h/c: [B, H]; tokens: [B] int32 (last emitted / SOS); done: [B] bool.
    ``weights`` is the tuple built by :func:`pack_decoder_weights`.

    Returns (h, c, tokens, done, step_tokens [S, B], step_emitted [S, B],
    step_attn_cmd [S, B, M_t], step_attn_sit [S, B, M_v]) with per-step
    semantics identical to decode/greedy.py's ``step_compute``.
    """
    batch, m_t, hidden = proj_textual.shape
    m_v = proj_visual.shape[1]
    # Default 128: at the flagship shapes a 256-row block needs 18.04 MiB of
    # scoped VMEM vs the 16 MiB limit (measured via AOT compile @ batch 4096);
    # 128 rows fit with headroom.
    block = min(block_b, batch)
    grid = (pl.cdiv(batch, block),)
    tokens2 = tokens.astype(jnp.int32)[:, None]
    done2 = done.astype(jnp.float32)[:, None]

    space = pl.ANY if interpret else pltpu.VMEM

    def batch_spec(shape):
        return pl.BlockSpec((block,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=space)

    def step_spec(shape):
        return pl.BlockSpec((num_steps, block) + shape,
                            lambda i: (0, i) + (0,) * len(shape),
                            memory_space=space)

    def weight_spec(w):
        return pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                            memory_space=space)

    outs = pl.pallas_call(
        _make_kernel(num_steps, sos_idx, eos_idx),
        grid=grid,
        in_specs=([batch_spec((m_t, hidden)), batch_spec((m_t,)),
                   batch_spec((m_v, hidden)), batch_spec((hidden,)),
                   batch_spec((hidden,)), batch_spec((1,)), batch_spec((1,))]
                  + [weight_spec(w) for w in weights]),
        out_specs=[batch_spec((hidden,)), batch_spec((hidden,)),
                   batch_spec((1,)), batch_spec((1,)),
                   step_spec(()), step_spec(()), step_spec((m_t,)),
                   step_spec((m_v,))],
        out_shape=[
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_steps, batch), jnp.int32),
            jax.ShapeDtypeStruct((num_steps, batch), jnp.float32),
            jax.ShapeDtypeStruct((num_steps, batch, m_t), jnp.float32),
            jax.ShapeDtypeStruct((num_steps, batch, m_v), jnp.float32),
        ],
        interpret=interpret,
    )(proj_textual, cmd_mask, proj_visual, h, c, tokens2, done2, *weights)
    (h_out, c_out, tokens_out, done_out, step_tokens, step_emitted,
     step_attn_cmd, step_attn_sit) = outs
    return (h_out, c_out, tokens_out[:, 0], done_out[:, 0] > 0,
            step_tokens, step_emitted, step_attn_cmd, step_attn_sit)


def pack_decoder_weights(params, pad_idx: int) -> Tuple[jax.Array, ...]:
    """Flatten ModelParams' decoder weights into the kernel's input tuple.

    Requires num_decoder_layers == 1 and conditional attention (the flagship
    configuration; reference seq2seq/model.py:124-160).  The embedding's pad
    row is zeroed here because models/nn.py ``embed`` zeroes pad lookups at
    call time rather than trusting the stored row.
    """
    assert len(params.decoder.lstm_layers) == 1, "pallas decode: 1 layer only"
    layer = params.decoder.lstm_layers[0]
    return (
        params.textual_attention.query_w,
        params.textual_attention.energy_w,
        params.decoder.queries_to_keys_w,
        params.decoder.queries_to_keys_b[None, :],
        params.visual_attention.query_w,
        params.visual_attention.energy_w,
        params.decoder.embedding.at[pad_idx].set(0.0),
        layer.w_ih.T,
        layer.w_hh.T,
        (layer.b_ih + layer.b_hh)[None, :],
        params.decoder.output_to_hidden_w,
        params.decoder.hidden_to_output_w,
    )
