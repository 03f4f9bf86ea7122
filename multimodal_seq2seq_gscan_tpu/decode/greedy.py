"""Fully-batched greedy decoding under ``lax.scan``.

Replaces the reference's batch-1 Python while-loop (seq2seq/predict.py:57-128,
~21 ex/s on a GPU) with a single compiled program: encode the whole batch,
pre-project attention keys once, then scan the decoder cell for
``max_decoding_steps + 1`` steps with per-example done flags.

EOS semantics mirror the reference exactly:
- the loop emits up to ``max_decoding_steps + 1`` tokens (the reference's
  ``<=`` bound, predict.py:101);
- a trailing EOS is stripped from the output (predict.py:114-117);
- attention-weight stacks align 1:1 with the emitted (pre-strip) tokens.
"""

from functools import lru_cache
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.models.model import (
    auxiliary_task_forward, decoder_step, encode_input, get_auxiliary_accuracy,
    initialize_decoder_hidden, project_keys)
from multimodal_seq2seq_gscan_tpu.models.params import ModelParams


class GreedyDecodeOutput(NamedTuple):
    """Raw device output of the batched greedy decode.

    tokens:           [B, S] emitted token ids (garbage after done).
    emitted_mask:     [B, S] 1.0 while the example was still emitting.
    lengths:          [B] number of emitted tokens incl. a final EOS if any.
    attention_commands:   [B, S, M_t] textual attention per emitted step.
    attention_situations: [B, S, M_v] visual attention per emitted step.
    position_accuracy: [B] aux target-position accuracy (0 if aux task off).
    """

    tokens: jax.Array
    emitted_mask: jax.Array
    lengths: jax.Array
    attention_commands: jax.Array
    attention_situations: jax.Array
    position_accuracy: jax.Array


# The shipped default decoder-step implementation ("xla" or "pallas"): what
# evaluation (decode/predict.py) and the bench headline actually run. Chosen
# from measured TPU numbers: the pallas fused decode block compiles and runs
# on the real chip under the raised scoped-VMEM limit but sustains only
# 89.6k ex/s vs the XLA path's 137.9k at batch 4096 (decode_ab.py, round 4)
# — XLA's own fusion of the small-matmul decoder step wins, same verdict as
# the fused teacher-forced attention kernel. "pallas" stays available as an
# experimental opt-in (--decode_impl).
DEFAULT_DECODE_IMPL = "xla"

# The shipped default decode compute dtype (None/"float32", "bfloat16",
# "bfloat16_mixed", or "bfloat16_keys"): what CLI evaluation runs when
# --decode_dtype is not given. SETTLED round 5 (VERDICT round 4 item 2):
# bfloat16_keys measured on TPU over all 9 splits x 2000 examples is
# EM-neutral (identical EM on 7/9 splits, max -0.10 pp on the rest, fixture
# dev EM 99.29 vs f32's 99.27) but NOT bit-identical (56/18000 token-level
# prediction mismatches, documentation/perf_round5.txt) — so the bench
# headline runs bfloat16_keys (~1.4x faster) while the CLI default stays
# bit-reproducible float32, one --decode_dtype flag away.
DEFAULT_DECODE_DTYPE = "float32"


@lru_cache(maxsize=8)
def make_greedy_decoder(config: ModelConfig, max_decoding_steps: int,
                        early_exit: bool = True, mesh=None,
                        exit_check_every: int = 32,
                        decode_impl: Optional[str] = None,
                        compute_dtype: Optional[str] = None):
    """Build a jitted batched greedy decoder.

    Memoized on (config, max_decoding_steps, early_exit, mesh,
    exit_check_every, decode_impl, compute_dtype) — all hashable — so
    repeated evaluations during training (predict() is called every
    ``evaluate_every`` iterations) reuse one jitted program instead of
    retracing/recompiling each time.

    With ``early_exit`` (default) the time loop is a ``lax.scan`` over
    blocks of ``exit_check_every`` decoder steps in which each block is
    wrapped in ``lax.cond(all_done, skip, run)``: once every example in the
    batch has emitted EOS the remaining blocks fall through the skip branch
    (a memset of that block's output rows) — on real data (targets ~15
    tokens, cap 120) this skips most of the decoder compute. Outputs are
    stacked by the scan itself; an earlier ``lax.while_loop`` design instead
    carried the full [S, B, M] output buffers through the loop and lost to
    the fixed-length scan at large batches on buffer traffic alone (493k vs
    539k ex/s at batch 4096) even when it executed half the steps.

    The ``exit_check_every=32`` default and ``early_exit=True`` are both
    measured on the real chip with dispatch-amortized, device-resident,
    interleaved A/B timing (scripts/decode_ab.py, batch 4096, trained
    fixture): early-exit 133.7k/137.6k/137.9k ex/s sustained at block
    8/16/32 vs fixed-120's 112.3k — the cond-skip wins by ~23% and the
    block-size curve is flat past 16 (documentation/perf_round4.txt).

    With ``mesh``, parameters are replicated and every batch-leading array
    (inputs and outputs) is sharded over the mesh's 'data' axis — the decode
    counterpart of ``make_train_step(..., mesh=)``; the early-exit
    all-examples-done test becomes a cross-device reduction XLA lowers onto
    the ICI.

    With ``compute_dtype="bfloat16"`` the decode *loop* runs in bf16: the
    encoder still runs once per batch in f32, but the projected attention
    keys, masks, decoder weights, and LSTM state are cast before the time
    loop. The per-step cost is dominated by re-reading the projected key
    tensors from HBM ([B, 36, 100] + [B, 16, 100] every one of up to 121
    steps), so halving their bytes attacks the measured bandwidth bound
    directly. Emitted tokens stay int32; attention weights are cast back to
    f32 on output. Opt-in: default f32 keeps bit-parity with the reference.
    Measured (decode_ab.py, batch 4096, block 32): 190.7k ex/s sustained vs
    137.9k f32 (+38%), with fixture dev EM 99.22% vs f32's 99.27% — a real
    (tiny) quality delta, which is why it stays opt-in.

    ``compute_dtype="bfloat16_mixed"`` is the same bf16 loop except the two
    output-projection matrices (``output_to_hidden_w`` [4H, H] and
    ``hidden_to_output_w`` [H, V]) stay f32, so the pre-argmax logits are
    computed in f32 (bf16 @ f32 promotes). The hypothesis: the pure-bf16
    EM delta comes from argmax near-ties in 8-mantissa-bit logits, not from
    LSTM-state drift, and the head matrices are tiny (H=100, V~9) so keeping
    them f32 costs almost none of the bandwidth win (the per-step bound is
    the [B, 36+16, 100] projected-key reads, still bf16 here).
    """
    num_steps = max_decoding_steps + 1  # reference loops while iter <= max.

    if decode_impl is None:
        decode_impl = DEFAULT_DECODE_IMPL
    if compute_dtype is None:
        # None = "the shipped default"; an explicit "float32" always means
        # f32 even if the shipped default is a bf16 variant.
        compute_dtype = DEFAULT_DECODE_DTYPE
    if compute_dtype == "float32":
        compute_dtype = None
    use_pallas = decode_impl == "pallas"
    if use_pallas and (mesh is not None or config.num_decoder_layers != 1
                       or not config.conditional_attention
                       or compute_dtype is not None):
        # The fused kernel covers the flagship single-layer conditional f32
        # configuration; everything else uses the general XLA path. Say so —
        # a silent fallback would let perf comparisons attribute XLA numbers
        # to the pallas impl.
        import logging
        logging.getLogger(__name__).warning(
            "decode_impl='pallas' requested but unsupported for this "
            "configuration (mesh=%s, num_decoder_layers=%d, "
            "conditional_attention=%s, compute_dtype=%s); falling back to "
            "the XLA decoder step.", mesh is not None,
            config.num_decoder_layers, config.conditional_attention,
            compute_dtype)
        use_pallas = False
    mixed_head = compute_dtype == "bfloat16_mixed"
    keys_only = compute_dtype == "bfloat16_keys"
    if mixed_head or keys_only:
        cast_dtype = jnp.bfloat16
    else:
        cast_dtype = jnp.dtype(compute_dtype) if compute_dtype else None

    def greedy_decode(params: ModelParams, input_ids, input_lengths, situations,
                      target_positions) -> GreedyDecodeOutput:
        encoded = encode_input(params, config, input_ids, input_lengths,
                               situations, deterministic=True)
        projected_textual, projected_visual = project_keys(params, encoded)
        hidden = initialize_decoder_hidden(params, config, encoded.hidden)
        command_mask = encoded.command_mask
        loop_params = params
        if keys_only:
            # bf16 STORAGE of the per-step HBM-traffic bound (the two
            # projected key tensors, [B, 36+16, H] re-read all ~121 steps);
            # every other operand and all arithmetic stay f32. On TPU the
            # dots truncate their operands to bf16 at default precision
            # anyway, so the only numerics this changes vs pure f32 is the
            # elementwise key add inside the additive-attention energy.
            projected_textual = projected_textual.astype(cast_dtype)
            projected_visual = projected_visual.astype(cast_dtype)
        elif cast_dtype is not None:
            def _cast(tree):
                return jax.tree.map(
                    lambda x: x.astype(cast_dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
            loop_params, projected_textual, projected_visual, command_mask, \
                hidden = _cast((params, projected_textual, projected_visual,
                                encoded.command_mask, hidden))
            if mixed_head:
                # f32 output head: bf16 activations @ f32 weights promote,
                # so the logits (and the argmax) are f32 while every
                # bandwidth-heavy per-step read stays bf16.
                loop_params = loop_params._replace(
                    decoder=loop_params.decoder._replace(
                        output_to_hidden_w=params.decoder.output_to_hidden_w,
                        hidden_to_output_w=params.decoder.hidden_to_output_w))
        batch = input_ids.shape[0]
        start_tokens = jnp.full((batch,), config.target_sos_idx, jnp.int32)
        done0 = jnp.zeros((batch,), jnp.bool_)

        def step_compute(tokens, hidden, done):
            logits, new_hidden, attn_cmd, attn_sit = decoder_step(
                loop_params, config, tokens, hidden, projected_textual,
                command_mask, projected_visual, deterministic=True)
            next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emitting = jnp.logical_not(done)
            # Freeze state for finished examples.
            new_hidden = jax.tree.map(
                lambda new, old: jnp.where(
                    emitting.reshape((1, -1) + (1,) * (new.ndim - 2)), new, old),
                new_hidden, hidden)
            tokens_out = jnp.where(emitting, next_tokens, 0)
            new_done = jnp.logical_or(done,
                                      next_tokens == config.target_eos_idx)
            carry_tokens = jnp.where(emitting, next_tokens, tokens)
            return (carry_tokens, new_hidden, new_done, tokens_out,
                    emitting.astype(jnp.float32), attn_cmd, attn_sit)

        if use_pallas:
            from multimodal_seq2seq_gscan_tpu.ops.pallas_decoder import (
                fused_decode_block, pack_decoder_weights)
            # loop_params/command_mask (not params/encoded.command_mask) so
            # the pallas branch tracks the cast logic if the compute_dtype
            # guard above is ever relaxed.
            weights = pack_decoder_weights(loop_params, config.target_pad_idx)
            interpret = jax.default_backend() != "tpu"
            block = max(1, min(exit_check_every, num_steps))
            num_blocks = -(-num_steps // block)
            padded_steps = num_blocks * block
            m_t = projected_textual.shape[1]
            m_v = projected_visual.shape[1]
            h0, c0 = hidden[0][0], hidden[1][0]

            def run_block(h, c, tokens, done):
                return fused_decode_block(
                    projected_textual, command_mask, projected_visual,
                    h, c, tokens, done, weights, num_steps=block,
                    sos_idx=config.target_sos_idx,
                    eos_idx=config.target_eos_idx, interpret=interpret)

            def pallas_step(carry, _):
                h, c, tokens, done = carry
                h, c, tokens, done, t_blk, e_blk, ac_blk, as_blk = \
                    run_block(h, c, tokens, done)
                return ((h, c, tokens, done),
                        (t_blk, e_blk, ac_blk, as_blk))

            if early_exit:
                def pallas_skip(carry, _):
                    return carry, (jnp.zeros((block, batch), jnp.int32),
                                   jnp.zeros((block, batch), jnp.float32),
                                   jnp.zeros((block, batch, m_t), jnp.float32),
                                   jnp.zeros((block, batch, m_v), jnp.float32))

                def pallas_block(carry, xs):
                    done = carry[3]
                    return lax.cond(jnp.all(done), pallas_skip, pallas_step,
                                    carry, xs)
            else:
                pallas_block = pallas_step

            _, (tokens, emitted, attn_cmd, attn_sit) = lax.scan(
                pallas_block, (h0, c0, start_tokens, done0), None,
                length=num_blocks)
            tokens = tokens.reshape(padded_steps, batch)
            emitted = emitted.reshape(padded_steps, batch)
            attn_cmd = attn_cmd.reshape(padded_steps, batch, m_t)
            attn_sit = attn_sit.reshape(padded_steps, batch, m_v)
            tokens = tokens[:num_steps]
            emitted = emitted[:num_steps]
            attn_cmd = attn_cmd[:num_steps]
            attn_sit = attn_sit[:num_steps]
        elif early_exit:
            block = max(1, min(exit_check_every, num_steps))
            num_blocks = -(-num_steps // block)
            padded_steps = num_blocks * block
            m_t = projected_textual.shape[1]
            m_v = projected_visual.shape[1]
            # keys_only stores keys in bf16 but every attention output is
            # promoted back to f32, so the skip branch must match f32.
            attn_dtype = (jnp.float32 if keys_only
                          else projected_textual.dtype)

            def run_blk(carry, start):
                tokens, hidden, done = carry

                def inner(carry, offset):
                    tokens, hidden, done = carry
                    (carry_tokens, new_hidden, new_done, tokens_out, emitting,
                     attn_cmd, attn_sit) = step_compute(tokens, hidden, done)
                    # Steps past the reference's iteration cap (padding in the
                    # final block) must not count as emitted.
                    in_range = (start + offset) < num_steps
                    emitting = emitting * in_range.astype(jnp.float32)
                    tokens_out = jnp.where(in_range, tokens_out, 0)
                    return ((carry_tokens, new_hidden, new_done),
                            (tokens_out, emitting, attn_cmd, attn_sit))

                return lax.scan(inner, (tokens, hidden, done),
                                jnp.arange(block))

            def skip_blk(carry, start):
                return carry, (jnp.zeros((block, batch), jnp.int32),
                               jnp.zeros((block, batch), jnp.float32),
                               jnp.zeros((block, batch, m_t), attn_dtype),
                               jnp.zeros((block, batch, m_v), attn_dtype))

            def block_step(carry, start):
                done = carry[2]
                return lax.cond(jnp.all(done), skip_blk, run_blk, carry,
                                start)

            _, (tokens, emitted, attn_cmd, attn_sit) = lax.scan(
                block_step, (start_tokens, hidden, done0),
                jnp.arange(num_blocks) * block)
            tokens = tokens.reshape(padded_steps, batch)[:num_steps]
            emitted = emitted.reshape(padded_steps, batch)[:num_steps]
            attn_cmd = attn_cmd.reshape(padded_steps, batch, m_t)[:num_steps]
            attn_sit = attn_sit.reshape(padded_steps, batch, m_v)[:num_steps]
        else:
            def step(carry, _):
                tokens, hidden, done = carry
                (carry_tokens, new_hidden, new_done, tokens_out, emitting,
                 attn_cmd, attn_sit) = step_compute(tokens, hidden, done)
                return ((carry_tokens, new_hidden, new_done),
                        (tokens_out, emitting, attn_cmd, attn_sit))

            (_, _, _), (tokens, emitted, attn_cmd, attn_sit) = lax.scan(
                step, (start_tokens, hidden, done0), None, length=num_steps)

        tokens = jnp.swapaxes(tokens, 0, 1)          # [B, S]
        emitted = jnp.swapaxes(emitted, 0, 1)        # [B, S]
        attn_cmd = jnp.swapaxes(attn_cmd, 0, 1)      # [B, S, M_t]
        attn_sit = jnp.swapaxes(attn_sit, 0, 1)      # [B, S, M_v]
        if cast_dtype is not None:
            attn_cmd = attn_cmd.astype(jnp.float32)
            attn_sit = attn_sit.astype(jnp.float32)
        lengths = jnp.sum(emitted, axis=1).astype(jnp.int32)

        if config.auxiliary_task:
            # Aux accuracy from visual attention summed over emitted steps
            # (reference predict.py:118-120 sums the contexts over time).
            summed = jnp.sum(attn_sit * emitted[..., None], axis=1)
            aux_scores = auxiliary_task_forward(summed)
            predictions = jnp.argmax(aux_scores, axis=-1)
            position_accuracy = 100.0 * (
                predictions == target_positions).astype(jnp.float32)
        else:
            position_accuracy = jnp.zeros((batch,), jnp.float32)

        return GreedyDecodeOutput(
            tokens=tokens, emitted_mask=emitted, lengths=lengths,
            attention_commands=attn_cmd, attention_situations=attn_sit,
            position_accuracy=position_accuracy)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        replicated = NamedSharding(mesh, P())
        data_sharded = NamedSharding(mesh, P("data"))
        return jax.jit(
            greedy_decode,
            in_shardings=(replicated,) + (data_sharded,) * 4,
            out_shardings=GreedyDecodeOutput(
                *([data_sharded] * len(GreedyDecodeOutput._fields))))
    compiler_options = None
    if use_pallas and jax.default_backend() == "tpu":
        # At batch 4096 the fused kernel plus the while-body's loop-carried
        # state and K-step output buffers need ~20 MiB of scoped VMEM
        # (measured via AOT compile) vs the 16 MiB default limit; v5e has
        # 128 MiB of VMEM, so raise the per-program limit instead of
        # shrinking the kernel's batch block below its sweet spot.
        compiler_options = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
    return jax.jit(greedy_decode, compiler_options=compiler_options)


def strip_output_sequences(output: GreedyDecodeOutput, eos_idx: int
                           ) -> Tuple[List[List[int]], List[int]]:
    """Host-side: per-example token lists with any trailing EOS stripped.

    Returns (sequences, kept_lengths) where kept_lengths[i] is the number of
    steps whose attention weights the reference would keep (pop'd along with
    the EOS token, predict.py:114-117).
    """
    tokens = np.asarray(output.tokens)
    lengths = np.asarray(output.lengths)
    sequences = []
    kept_lengths = []
    for i in range(tokens.shape[0]):
        n = int(lengths[i])
        seq = tokens[i, :n].tolist()
        if n > 0 and seq[-1] == eos_idx:
            seq = seq[:-1]
            n -= 1
        sequences.append(seq)
        kept_lengths.append(n)
    return sequences, kept_lengths
