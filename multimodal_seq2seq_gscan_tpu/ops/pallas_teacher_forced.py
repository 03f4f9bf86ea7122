"""Pallas TPU kernels: fused teacher-forced decoder unroll, forward AND backward.

Training throughput is floored by the sequential per-token decoder chain
(documentation/PERFORMANCE.md: ~6.8 ms/step at batch 200, flat in
steps_per_execution — every op in the chain is tiny, so XLA's per-op latency
on the sequential critical path dominates, not FLOPs).  These kernels run the
whole teacher-forced unroll (reference seq2seq/model.py:372-495's per-step
loop) on-chip: grid = (batch blocks, time blocks); the LSTM state is carried
across time blocks in VMEM scratch, each block runs K steps in an in-kernel
fori_loop (a trace-time unroll made Mosaic AOT compilation take minutes), and
the backward kernel walks the time blocks in reverse, accumulating weight
gradients directly into revisited VMEM output buffers (keeping them out of
the loop carry — large carries also explode Mosaic compile time).

The pair is wired into ``jax.custom_vjp``: the forward stashes the pre-step
(h, c) per timestep as residuals; the backward recomputes each step's
internals from them (standard rematerialization — residual traffic is
2 x [T, B, H] instead of every intermediate).

Scope mirrors ops/pallas_decoder.py: single decoder layer + conditional
attention (the flagship configuration).  Dropout on the embedded token (the
only dropout inside the decoder step at one layer, reference
seq2seq/model.py:238-246) is supplied as a precomputed multiplicative mask so
forward and backward see identical noise.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_seq2seq_gscan_tpu.ops.pallas_decoder import _attend

K_STEPS = 8  # time-block size; stepped by an in-kernel fori_loop

# Scoped-VMEM limit (KiB) the embedding program must be compiled with for the
# full-batch-200 single-block configuration (`models.model._fused_batch_block`)
# to fit: the forward kernel alone needs 21.75 MiB vs the 16 MiB default.
# v5e has 128 MiB of VMEM; `train/step.py` passes this as a per-program
# compiler option (xla_tpu_scoped_vmem_limit_kib) when the pallas
# teacher-forced impl is selected on TPU.
SCOPED_VMEM_LIMIT_KIB = 65536


def _sigmoid(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _step_forward(tokens, drop, h, c, proj_txt, cmd_mask, proj_vis, w):
    """One teacher-forced decoder step from VMEM-resident values.

    tokens: [Bb, 1] i32; drop: [Bb, E]; h/c: [Bb, H].  Math identical to
    models/model.py decoder_step (single layer, conditional attention).
    """
    (txt_qw, txt_ew, q2k_w, q2k_b, vis_qw, vis_ew, emb, w_ih_t, w_hh_t,
     bias, out_w, out_proj) = w
    vocab = emb.shape[0]
    vocab_iota = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
    onehot = (tokens == vocab_iota).astype(jnp.float32)          # [Bb, V]
    embedded = jnp.dot(onehot, emb,
                       preferred_element_type=jnp.float32) * drop  # [Bb, E]

    pq_txt = jnp.dot(h, txt_qw, preferred_element_type=jnp.float32)
    ctx_cmd, _ = _attend(pq_txt, proj_txt, cmd_mask, txt_ew)

    joint = jnp.concatenate([h, ctx_cmd], axis=-1)
    vq = jnp.tanh(jnp.dot(joint, q2k_w,
                          preferred_element_type=jnp.float32) + q2k_b)
    pq_vis = jnp.dot(vq, vis_qw, preferred_element_type=jnp.float32)
    ctx_sit, attn_sit = _attend(pq_vis, proj_vis, None, vis_ew)

    lstm_in = jnp.concatenate([embedded, ctx_cmd, ctx_sit], axis=-1)
    gates = (jnp.dot(lstm_in, w_ih_t, preferred_element_type=jnp.float32)
             + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32) + bias)
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    c_new = _sigmoid(gf) * c + _sigmoid(gi) * jnp.tanh(gg)
    h_new = _sigmoid(go) * jnp.tanh(c_new)

    pre = jnp.concatenate([embedded, h_new, ctx_cmd, ctx_sit], axis=-1)
    logits = jnp.dot(jnp.dot(pre, out_w, preferred_element_type=jnp.float32),
                     out_proj, preferred_element_type=jnp.float32)
    return logits, h_new, c_new, attn_sit


def _make_fwd_kernel(k_steps: int, num_steps: int):
    def kernel(tokens_ref, drop_ref, proj_txt_ref, cmd_mask_ref, proj_vis_ref,
               h0_ref, c0_ref, *rest):
        w = tuple(r[:] for r in rest[:12])
        (logits_ref, h_res_ref, c_res_ref, asum_ref,
         h_scr, c_scr, asum_scr) = rest[12:]
        t_blk = pl.program_id(1)
        n_t = pl.num_programs(1)

        @pl.when(t_blk == 0)
        def _():
            h_scr[:] = h0_ref[:]
            c_scr[:] = c0_ref[:]
            asum_scr[:] = jnp.zeros_like(asum_scr)

        proj_txt = proj_txt_ref[:]
        cmd_mask = cmd_mask_ref[:]
        proj_vis = proj_vis_ref[:]
        base = t_blk * k_steps

        # fori_loop, not a trace-time unroll: K unrolled steps make the
        # Mosaic program large enough that AOT compilation takes minutes
        # (and can OOM the compile helper); one step's code with dynamic
        # K-axis indexing compiles in seconds at identical runtime.
        def step(k, carry):
            h, c, asum = carry
            h_res_ref[pl.ds(k, 1)] = h[None]
            c_res_ref[pl.ds(k, 1)] = c[None]
            logits, h, c, attn_sit = _step_forward(
                tokens_ref[pl.ds(k, 1)][0], drop_ref[pl.ds(k, 1)][0], h, c,
                proj_txt, cmd_mask, proj_vis, w)
            logits_ref[pl.ds(k, 1)] = logits[None]
            # Time-padded steps run (their tokens are pad) but must not
            # pollute the auxiliary attention sum.
            valid = (base + k < num_steps).astype(jnp.float32)
            return h, c, asum + attn_sit * valid

        h, c, asum = jax.lax.fori_loop(
            0, k_steps, step, (h_scr[:], c_scr[:], asum_scr[:]))
        h_scr[:] = h
        c_scr[:] = c
        asum_scr[:] = asum

        @pl.when(t_blk == n_t - 1)
        def _():
            asum_ref[:] = asum_scr[:]

    return kernel


def _specs(block_b, k_steps, space, n_t=None):
    def b_spec(shape):  # batch-blocked, time-invariant
        return pl.BlockSpec((block_b,) + shape,
                            lambda b, t: (b,) + (0,) * len(shape),
                            memory_space=space)

    def t_spec(shape, reverse=False):  # time- and batch-blocked [T, B, ...]
        if reverse:
            def index(b, t):
                return (n_t - 1 - t, b) + (0,) * len(shape)
        else:
            def index(b, t):
                return (t, b) + (0,) * len(shape)
        return pl.BlockSpec((k_steps, block_b) + shape, index,
                            memory_space=space)

    def w_spec(w):
        return pl.BlockSpec(w.shape, lambda b, t: (0,) * w.ndim,
                            memory_space=space)

    return b_spec, t_spec, w_spec


def _forward_impl(proj_textual, cmd_mask, proj_visual, h0, c0, tokens,
                  drop_mask, weights, num_steps, block_b, interpret):
    batch, m_t, hidden = proj_textual.shape
    m_v = proj_visual.shape[1]
    t_pad = tokens.shape[0]
    assert t_pad % K_STEPS == 0, (t_pad, K_STEPS)
    vocab = weights[11].shape[1]
    block = min(block_b, batch)
    assert batch % block == 0, (
        "pad the batch to a multiple of the block outside "
        "(see models/model.py fused integration)")
    grid = (batch // block, t_pad // K_STEPS)
    space = pl.ANY if interpret else pltpu.VMEM
    b_spec, t_spec, w_spec = _specs(block, K_STEPS, space)

    # Tokens ride as [T, B, 1]: a 2-D [T, B] block would put the batch in the
    # lane dimension, where Mosaic requires 128-divisibility; as the
    # second-to-last dim it only needs divisibility by 8 (or a full block).
    tokens = tokens[..., None]
    return pl.pallas_call(
        _make_fwd_kernel(K_STEPS, num_steps),
        grid=grid,
        in_specs=([t_spec((1,)), t_spec((drop_mask.shape[-1],)),
                   b_spec((m_t, hidden)), b_spec((m_t,)),
                   b_spec((m_v, hidden)), b_spec((hidden,)),
                   b_spec((hidden,))] + [w_spec(w) for w in weights]),
        out_specs=[t_spec((vocab,)), t_spec((hidden,)), t_spec((hidden,)),
                   b_spec((m_v,))],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, batch, vocab), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, m_v), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, hidden), jnp.float32),
            pltpu.VMEM((block, hidden), jnp.float32),
            pltpu.VMEM((block, m_v), jnp.float32),
        ],
        interpret=interpret,
    )(tokens, drop_mask, proj_textual, cmd_mask, proj_visual, h0, c0,
      *weights)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _make_bwd_kernel(k_steps: int, num_steps: int, emb_dim: int, hidden: int):
    def kernel(tokens_ref, drop_ref, proj_txt_ref, cmd_mask_ref, proj_vis_ref,
               dlog_ref, h_res_ref, c_res_ref, g_asum_ref, *rest):
        w = tuple(r[:] for r in rest[:12])
        (txt_qw_t, q2k_w_t, vis_qw_t, w_ih, w_hh, out_w_t,
         out_proj_t) = tuple(r[:] for r in rest[12:19])
        (d_proj_txt_ref, d_proj_vis_ref, dh0_ref, dc0_ref) = rest[19:23]
        dw_refs = rest[23:35]
        dh_scr, dc_scr = rest[35:]
        (txt_qw, txt_ew, q2k_w, q2k_b, vis_qw, vis_ew, emb, w_ih_t, w_hh_t,
         bias, out_w, out_proj) = w

        t_phys = pl.program_id(1)
        n_t = pl.num_programs(1)
        t_logical = n_t - 1 - t_phys

        first_t = t_phys == 0
        first_all = jnp.logical_and(pl.program_id(0) == 0, first_t)

        @pl.when(first_t)
        def _():
            dh_scr[:] = jnp.zeros_like(dh_scr)
            dc_scr[:] = jnp.zeros_like(dc_scr)
            # d_proj accumulators restart with every batch block.
            d_proj_txt_ref[:] = jnp.zeros_like(d_proj_txt_ref)
            d_proj_vis_ref[:] = jnp.zeros_like(d_proj_vis_ref)

        @pl.when(first_all)
        def _():
            for ref in dw_refs:
                ref[:] = jnp.zeros_like(ref)

        proj_txt = proj_txt_ref[:]
        cmd_mask = cmd_mask_ref[:]
        proj_vis = proj_vis_ref[:]
        g_asum = g_asum_ref[:]
        vocab = emb.shape[0]
        vocab_iota = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
        base = t_logical * k_steps

        # Reverse fori_loop for the same compile-size reason as the forward
        # kernel: one step's code, dynamic K-axis indexing. Weight and
        # attention-key gradients accumulate straight into the (revisited)
        # output refs — keeping them out of the loop carry keeps the carry
        # small, which Mosaic compiles far faster.
        def step(i, carry):
            dh, dc = carry
            k = k_steps - 1 - i
            tokens = tokens_ref[pl.ds(k, 1)][0]
            drop = drop_ref[pl.ds(k, 1)][0]
            h = h_res_ref[pl.ds(k, 1)][0]
            c = c_res_ref[pl.ds(k, 1)][0]
            dlog = dlog_ref[pl.ds(k, 1)][0]
            valid = (base + k < num_steps).astype(jnp.float32)

            # ---- recompute the forward internals of step (base + k) ----
            onehot = (tokens == vocab_iota).astype(jnp.float32)
            embedded_raw = jnp.dot(onehot, emb,
                                   preferred_element_type=jnp.float32)
            embedded = embedded_raw * drop

            pq_txt = jnp.dot(h, txt_qw, preferred_element_type=jnp.float32)
            blk, m_t, _ = proj_txt.shape
            hidden_t = jnp.tanh(pq_txt[:, None, :] + proj_txt)
            scores_t = jax.lax.dot_general(
                hidden_t.reshape(blk * m_t, hidden), txt_ew,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(blk, m_t)
            scores_t = jnp.where(cmd_mask > 0, scores_t, -1e9)
            scores_t = scores_t - jnp.max(scores_t, axis=-1, keepdims=True)
            e_t = jnp.exp(scores_t)
            w_t = e_t / jnp.sum(e_t, axis=-1, keepdims=True)
            ctx_cmd = jax.lax.dot_general(
                w_t[:, None, :], proj_txt,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]

            joint = jnp.concatenate([h, ctx_cmd], axis=-1)
            vq = jnp.tanh(jnp.dot(joint, q2k_w,
                                  preferred_element_type=jnp.float32) + q2k_b)
            pq_vis = jnp.dot(vq, vis_qw, preferred_element_type=jnp.float32)
            m_v = proj_vis.shape[1]
            hidden_v = jnp.tanh(pq_vis[:, None, :] + proj_vis)
            scores_v = jax.lax.dot_general(
                hidden_v.reshape(blk * m_v, hidden), vis_ew,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(blk, m_v)
            scores_v = scores_v - jnp.max(scores_v, axis=-1, keepdims=True)
            e_v = jnp.exp(scores_v)
            w_v = e_v / jnp.sum(e_v, axis=-1, keepdims=True)
            ctx_sit = jax.lax.dot_general(
                w_v[:, None, :], proj_vis,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]

            lstm_in = jnp.concatenate([embedded, ctx_cmd, ctx_sit], axis=-1)
            gates = (jnp.dot(lstm_in, w_ih_t,
                             preferred_element_type=jnp.float32)
                     + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
                     + bias)
            gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
            si, sf, so = _sigmoid(gi), _sigmoid(gf), _sigmoid(go)
            tg = jnp.tanh(gg)
            c_new = sf * c + si * tg
            tc = jnp.tanh(c_new)
            h_new = so * tc
            pre = jnp.concatenate([embedded, h_new, ctx_cmd, ctx_sit],
                                  axis=-1)
            ph = jnp.dot(pre, out_w, preferred_element_type=jnp.float32)

            # ---- backward through the step ----
            # X^T @ Y contractions are expressed as dot_general over the
            # batch dim to avoid explicit in-kernel transposes.
            def t_dot(a, b):
                return jax.lax.dot_general(
                    a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            d_ph = jnp.dot(dlog, out_proj_t,
                           preferred_element_type=jnp.float32)
            d_out_proj = t_dot(ph, dlog)
            d_pre = jnp.dot(d_ph, out_w_t, preferred_element_type=jnp.float32)
            d_out_w = t_dot(pre, d_ph)
            dE2 = d_pre[:, :emb_dim]
            dHn2 = d_pre[:, emb_dim:emb_dim + hidden]
            dCc2 = d_pre[:, emb_dim + hidden:emb_dim + 2 * hidden]
            dCs2 = d_pre[:, emb_dim + 2 * hidden:]

            dh_new = dh + dHn2
            do_pre = dh_new * tc * so * (1.0 - so)
            dct = dc + dh_new * so * (1.0 - tc * tc)
            df_pre = dct * c * sf * (1.0 - sf)
            di_pre = dct * tg * si * (1.0 - si)
            dg_pre = dct * si * (1.0 - tg * tg)
            dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre],
                                     axis=-1)
            d_lstm_in = jnp.dot(dgates, w_ih,
                                preferred_element_type=jnp.float32)
            dh_lstm = jnp.dot(dgates, w_hh,
                              preferred_element_type=jnp.float32)
            dc_prev = dct * sf
            d_w_ih_t = t_dot(lstm_in, dgates)
            d_w_hh_t = t_dot(h, dgates)
            d_bias = jnp.sum(dgates, axis=0, keepdims=True)

            dE1 = d_lstm_in[:, :emb_dim]
            dCc1 = d_lstm_in[:, emb_dim:emb_dim + hidden]
            dCs1 = d_lstm_in[:, emb_dim + hidden:]

            # visual attention backward (+ the auxiliary summed-attention
            # cotangent, masked for time padding)
            def bm_dot(vec, keys):  # [B,H],[B,M,H] -> [B,M]
                # As a batched 1xH @ HxM matmul (MXU), NOT keys-major matvec:
                # that form lowers to vector.multi_reduction, and Mosaic
                # rejects the fused non-constant accumulator when the result
                # is immediately added to (g_asum).
                return jax.lax.dot_general(
                    vec[:, None, :], keys,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :]

            def outer_bmh(a_bm, b_bh):  # [B,M],[B,H] -> [B,M,H]
                # Batched Mx1 @ 1xH outer product on the MXU. The elementwise
                # form a[:, :, None] * b[:, None, :] (BOTH operands broadcast)
                # sends Mosaic's layout inference into a multi-minute stall —
                # isolated by compiling kernel variants with/without it.
                return jax.lax.dot_general(
                    a_bm[:, :, None], b_bh[:, None, :],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            def scale_rows(a_bm, vec_h):  # [B,M],[H] -> [B,M,H]
                # Same outer-product stall applies to a[:, :, None] * v[1,1,H];
                # broadcast the vector to [B,H] (cheap, single-broadcast) and
                # reuse the batched outer. A flat (B*M,1)@(1,H) matmul is NOT
                # an option: reshaping [B,M] to [B*M,1] moves the lane dim,
                # which Mosaic rejects ("unsupported shape cast").
                b_bh = jnp.broadcast_to(vec_h[None, :],
                                        (a_bm.shape[0], vec_h.shape[0]))
                return outer_bmh(a_bm, b_bh)

            d_ctx_sit = dCs1 + dCs2
            d_wv = bm_dot(d_ctx_sit, proj_vis) + g_asum * valid
            d_pv = outer_bmh(w_v, d_ctx_sit)
            inner_v = jnp.sum(w_v * d_wv, axis=-1, keepdims=True)
            d_scores_v = w_v * (d_wv - inner_v)
            d_hidden_v = scale_rows(d_scores_v, vis_ew[:, 0])
            d_pre_v = d_hidden_v * (1.0 - hidden_v * hidden_v)
            d_vis_ew = jnp.sum(hidden_v * d_scores_v[:, :, None],
                               axis=(0, 1))[:, None]
            d_pq_vis = jnp.sum(d_pre_v, axis=1)
            d_proj_vis_ref[:] = d_proj_vis_ref[:] + d_pv + d_pre_v
            d_vq = jnp.dot(d_pq_vis, vis_qw_t,
                           preferred_element_type=jnp.float32)
            d_vis_qw = t_dot(vq, d_pq_vis)
            d_joint_pre = d_vq * (1.0 - vq * vq)
            d_q2k_w = t_dot(joint, d_joint_pre)
            d_q2k_b = jnp.sum(d_joint_pre, axis=0, keepdims=True)
            d_joint = jnp.dot(d_joint_pre, q2k_w_t,
                              preferred_element_type=jnp.float32)
            dh_joint = d_joint[:, :hidden]
            dCc3 = d_joint[:, hidden:]

            # textual attention backward (masked rows have w_t exactly 0)
            d_ctx_cmd = dCc1 + dCc2 + dCc3
            d_wt = bm_dot(d_ctx_cmd, proj_txt)
            d_pt = outer_bmh(w_t, d_ctx_cmd)
            inner_t = jnp.sum(w_t * d_wt, axis=-1, keepdims=True)
            d_scores_t = w_t * (d_wt - inner_t)
            d_hidden_t = scale_rows(d_scores_t, txt_ew[:, 0])
            d_pre_t = d_hidden_t * (1.0 - hidden_t * hidden_t)
            d_txt_ew = jnp.sum(hidden_t * d_scores_t[:, :, None],
                               axis=(0, 1))[:, None]
            d_pq_txt = jnp.sum(d_pre_t, axis=1)
            d_proj_txt_ref[:] = d_proj_txt_ref[:] + d_pt + d_pre_t
            dh_txt = jnp.dot(d_pq_txt, txt_qw_t,
                             preferred_element_type=jnp.float32)
            d_txt_qw = t_dot(h, d_pq_txt)

            # embedding backward
            d_embedded = (dE1 + dE2) * drop
            d_emb = t_dot(onehot, d_embedded)

            dh = dh_lstm + dh_joint + dh_txt
            dc = dc_prev
            for ref, dwk in zip(dw_refs,
                                (d_txt_qw, d_txt_ew, d_q2k_w, d_q2k_b,
                                 d_vis_qw, d_vis_ew, d_emb, d_w_ih_t,
                                 d_w_hh_t, d_bias, d_out_w, d_out_proj)):
                ref[:] = ref[:] + dwk
            return dh, dc

        dh, dc = jax.lax.fori_loop(0, k_steps, step,
                                   (dh_scr[:], dc_scr[:]))
        dh_scr[:] = dh
        dc_scr[:] = dc

        @pl.when(t_phys == n_t - 1)
        def _():
            dh0_ref[:] = dh_scr[:]
            dc0_ref[:] = dc_scr[:]

    return kernel


def _backward_impl(proj_textual, cmd_mask, proj_visual, tokens, drop_mask,
                   weights, h_res, c_res, dlogits, g_asum, num_steps,
                   block_b, interpret):
    batch, m_t, hidden = proj_textual.shape
    m_v = proj_visual.shape[1]
    t_pad = tokens.shape[0]
    emb_dim = drop_mask.shape[-1]
    block = min(block_b, batch)
    assert batch % block == 0
    grid = (batch // block, t_pad // K_STEPS)
    space = pl.ANY if interpret else pltpu.VMEM
    b_spec, t_spec, w_spec = _specs(block, K_STEPS, space,
                                    n_t=t_pad // K_STEPS)
    rt = functools.partial(t_spec, reverse=True)

    (txt_qw, txt_ew, q2k_w, q2k_b, vis_qw, vis_ew, emb, w_ih_t, w_hh_t,
     bias, out_w, out_proj) = weights
    transposed = (txt_qw.T, q2k_w.T, vis_qw.T, w_ih_t.T, w_hh_t.T, out_w.T,
                  out_proj.T)

    vocab = out_proj.shape[1]
    out_shape = ([jax.ShapeDtypeStruct((batch, m_t, hidden), jnp.float32),
                  jax.ShapeDtypeStruct((batch, m_v, hidden), jnp.float32),
                  jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
                  jax.ShapeDtypeStruct((batch, hidden), jnp.float32)]
                 + [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                    for w in weights])
    out_specs = ([b_spec((m_t, hidden)), b_spec((m_v, hidden)),
                  b_spec((hidden,)), b_spec((hidden,))]
                 + [w_spec(w) for w in weights])

    tokens = tokens[..., None]  # see _forward_impl on the [T, B, 1] layout
    outs = pl.pallas_call(
        _make_bwd_kernel(K_STEPS, num_steps, emb_dim, hidden),
        grid=grid,
        in_specs=([rt((1,)), rt((emb_dim,)), b_spec((m_t, hidden)),
                   b_spec((m_t,)), b_spec((m_v, hidden)), rt((vocab,)),
                   rt((hidden,)), rt((hidden,)), b_spec((m_v,))]
                  + [w_spec(w) for w in weights]
                  + [w_spec(w) for w in transposed]),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block, hidden), jnp.float32),
            pltpu.VMEM((block, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(tokens, drop_mask, proj_textual, cmd_mask, proj_visual, dlogits,
      h_res, c_res, g_asum, *weights, *transposed)
    d_proj_txt, d_proj_vis, dh0, dc0 = outs[:4]
    dweights = tuple(outs[4:])
    return d_proj_txt, d_proj_vis, dh0, dc0, dweights


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_teacher_forced(proj_textual, cmd_mask, proj_visual, h0, c0,
                         tokens, drop_mask, weights, num_steps: int,
                         block_b: int = 112, interpret: bool = False,
                         block_b_bwd: int = None):
    """Fused teacher-forced unroll with a fused backward.

    proj_textual: [B, M_t, H]; cmd_mask: [B, M_t]; proj_visual: [B, M_v, H];
    h0/c0: [B, H]; tokens: [T_pad, B] i32 (time-major target tokens, padded
    to a multiple of K_STEPS with pad tokens); drop_mask: [T_pad, B, E]
    (embedded-token dropout mask, ones when deterministic); weights: tuple
    from pallas_decoder.pack_decoder_weights.

    ``block_b`` is the forward batch block; ``block_b_bwd`` (default: same)
    the backward one — the backward kernel holds ~2x the VMEM per row
    (weights + their transposes + 12 gradient refs), so its safe block is
    roughly half the forward's (measured at the flagship shapes: forward
    fits at 112 rows, backward at 64 but not 72).

    Returns (logits [T_pad, B, V] — entries at t >= num_steps are garbage and
    must be sliced off by the caller — and summed_attention [B, M_v] over the
    first num_steps steps only).
    """
    logits, _, _, asum = _forward_impl(
        proj_textual, cmd_mask, proj_visual, h0, c0, tokens, drop_mask,
        weights, num_steps, block_b, interpret)
    return logits, asum


def _fused_fwd(proj_textual, cmd_mask, proj_visual, h0, c0, tokens,
               drop_mask, weights, num_steps, block_b, interpret,
               block_b_bwd):
    logits, h_res, c_res, asum = _forward_impl(
        proj_textual, cmd_mask, proj_visual, h0, c0, tokens, drop_mask,
        weights, num_steps, block_b, interpret)
    residuals = (proj_textual, cmd_mask, proj_visual, tokens, drop_mask,
                 weights, h_res, c_res)
    return (logits, asum), residuals


def _fused_bwd(num_steps, block_b, interpret, block_b_bwd, residuals,
               cotangents):
    (proj_textual, cmd_mask, proj_visual, tokens, drop_mask, weights,
     h_res, c_res) = residuals
    dlogits, g_asum = cotangents
    # Cotangents of sliced-off padded steps arrive as zeros already; make it
    # explicit for safety when callers pass hand-built cotangents.
    t_pad = tokens.shape[0]
    if dlogits.shape[0] != t_pad:
        pad = t_pad - dlogits.shape[0]
        dlogits = jnp.concatenate(
            [dlogits, jnp.zeros((pad,) + dlogits.shape[1:], dlogits.dtype)])
    d_proj_txt, d_proj_vis, dh0, dc0, dweights = _backward_impl(
        proj_textual, cmd_mask, proj_visual, tokens, drop_mask, weights,
        h_res, c_res, dlogits, g_asum, num_steps,
        block_b if block_b_bwd is None else block_b_bwd, interpret)
    import numpy as np
    d_tokens = np.zeros(tokens.shape, dtype=jax.dtypes.float0)
    return (d_proj_txt, jnp.zeros_like(cmd_mask), d_proj_vis, dh0, dc0,
            d_tokens, jnp.zeros_like(drop_mask), dweights)


fused_teacher_forced.defvjp(_fused_fwd, _fused_bwd)
