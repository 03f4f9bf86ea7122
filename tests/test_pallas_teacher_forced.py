"""The fused teacher-forced kernel pair (forward + hand-derived backward)
must match a pure-jnp unroll of the identical step math — outputs AND
gradients for every differentiable input (attention keys, initial state, all
12 weight tensors), with time padding and embedded-token dropout active."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_seq2seq_gscan_tpu.models import ModelConfig, init_model_params
from multimodal_seq2seq_gscan_tpu.models.model import (
    encode_input, initialize_decoder_hidden, project_keys)
from multimodal_seq2seq_gscan_tpu.ops.pallas_decoder import (
    pack_decoder_weights)
from multimodal_seq2seq_gscan_tpu.ops.pallas_teacher_forced import (
    _step_forward, fused_teacher_forced)

BATCH, T_IN, GRID, CH, V_IN = 6, 7, 5, 8, 12
NUM_STEPS = 11  # deliberately not a multiple of K_STEPS: exercises padding
T_PAD = 16


@pytest.fixture(scope="module")
def setup():
    config = ModelConfig(input_vocabulary_size=V_IN, target_vocabulary_size=9,
                         num_cnn_channels=CH, embedding_dimension=8,
                         encoder_hidden_size=12, decoder_hidden_size=12,
                         cnn_kernel_size=3, cnn_hidden_num_channels=6)
    params = init_model_params(jax.random.PRNGKey(4), config)
    rng = np.random.RandomState(1)
    input_lengths = rng.randint(3, T_IN + 1, size=BATCH).astype(np.int32)
    input_ids = np.zeros((BATCH, T_IN), dtype=np.int32)
    for i in range(BATCH):
        input_ids[i, :input_lengths[i]] = rng.randint(
            1, V_IN, size=input_lengths[i])
    situations = rng.rand(BATCH, GRID, GRID, CH).astype(np.float32)
    encoded = encode_input(params, config, jnp.asarray(input_ids),
                           jnp.asarray(input_lengths),
                           jnp.asarray(situations), deterministic=True)
    proj_txt, proj_vis = project_keys(params, encoded)
    h_stack, c_stack = initialize_decoder_hidden(params, config,
                                                 encoded.hidden)
    weights = pack_decoder_weights(params, config.target_pad_idx)
    tokens = rng.randint(0, 9, size=(T_PAD, BATCH)).astype(np.int32)
    tokens[NUM_STEPS:] = config.target_pad_idx
    # decoder embedding width == decoder hidden size (reference decoder)
    emb_dim = weights[6].shape[1]
    drop = (rng.rand(T_PAD, BATCH, emb_dim) > 0.3).astype(np.float32) / 0.7
    inputs = (proj_txt, encoded.command_mask, proj_vis, h_stack[0],
              c_stack[0], jnp.asarray(tokens), jnp.asarray(drop), weights)
    return config, inputs


def spec_unroll(proj_txt, cmd_mask, proj_vis, h0, c0, tokens, drop, weights):
    """Pure-jnp reference of the same math (reuses the kernel's step fn on
    plain arrays — it is ref-free jnp code)."""
    h, c, asum, logits = h0, c0, 0.0, []
    for t in range(tokens.shape[0]):
        lg, h, c, att = _step_forward(tokens[t][:, None], drop[t], h, c,
                                      proj_txt, cmd_mask, proj_vis, weights)
        logits.append(lg)
        if t < NUM_STEPS:
            asum = asum + att
    return jnp.stack(logits), asum


def loss_of(fn):
    def loss(proj_txt, cmd_mask, proj_vis, h0, c0, tokens, drop, weights,
             w_log, w_asum):
        logits, asum = fn(proj_txt, cmd_mask, proj_vis, h0, c0, tokens,
                          drop, weights)
        return (jnp.sum(logits[:NUM_STEPS] * w_log)
                + jnp.sum(asum * w_asum))
    return loss


def test_forward_matches_spec(setup):
    _, inputs = setup
    def fused(*a):
        return fused_teacher_forced(*a, NUM_STEPS, 3, True)

    logits_f, asum_f = fused(*inputs)
    logits_s, asum_s = spec_unroll(*inputs)
    np.testing.assert_allclose(np.asarray(logits_f[:NUM_STEPS]),
                               np.asarray(logits_s[:NUM_STEPS]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(asum_f), np.asarray(asum_s),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_spec(setup):
    _, inputs = setup
    rng = np.random.RandomState(7)
    logits_shape = (NUM_STEPS, BATCH, 9)
    w_log = jnp.asarray(rng.randn(*logits_shape).astype(np.float32))
    w_asum = jnp.asarray(
        rng.randn(BATCH, inputs[2].shape[1]).astype(np.float32))

    def fused(*a):
        return fused_teacher_forced(*a, NUM_STEPS, 3, True)

    argnums = (0, 2, 3, 4, 7)  # proj_txt, proj_vis, h0, c0, weights
    g_fused = jax.grad(loss_of(fused), argnums=argnums)(
        *inputs, w_log, w_asum)
    g_spec = jax.grad(loss_of(spec_unroll), argnums=argnums)(
        *inputs, w_log, w_asum)
    for name, gf, gs in zip(("proj_txt", "proj_vis", "h0", "c0"),
                            g_fused[:4], g_spec[:4]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    for i, (gf, gs) in enumerate(zip(g_fused[4], g_spec[4])):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg="weight {}".format(i))


def test_model_forward_and_loss_grads_match(setup):
    """End-to-end: model.forward + loss under teacher_forced_impl='pallas'
    equals the XLA scan path, values and parameter gradients."""
    from multimodal_seq2seq_gscan_tpu.models.model import forward, get_loss

    config, _ = setup
    params = init_model_params(jax.random.PRNGKey(6), config)
    rng = np.random.RandomState(3)
    input_ids = jnp.asarray(rng.randint(1, V_IN, size=(BATCH, T_IN)),
                            jnp.int32)
    input_lengths = jnp.full((BATCH,), T_IN, jnp.int32)
    situations = jnp.asarray(rng.rand(BATCH, GRID, GRID, CH),
                             jnp.float32)
    targets = np.zeros((BATCH, 13), np.int32)
    for i in range(BATCH):
        n = rng.randint(4, 12)
        targets[i, 0] = 1
        targets[i, 1:n - 1] = rng.randint(3, 9, size=n - 2)
        targets[i, n - 1] = 2
    targets = jnp.asarray(targets)
    cfg_pallas = config._replace(teacher_forced_impl="pallas")

    def loss_for(cfg):
        def loss(p):
            log_probs, _ = forward(p, cfg, input_ids, input_lengths,
                                   situations, targets, deterministic=True)
            return get_loss(cfg, log_probs, targets)
        return loss

    loss_x, grads_x = jax.value_and_grad(loss_for(config))(params)
    loss_p, grads_p = jax.value_and_grad(loss_for(cfg_pallas))(params)
    np.testing.assert_allclose(float(loss_x), float(loss_p), rtol=1e-5)
    flat_x = jax.tree.leaves(grads_x)
    flat_p = jax.tree.leaves(grads_p)
    for gx, gp in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gp),
                                   rtol=3e-4, atol=3e-5)


def test_fused_batch_block_chooser():
    """Batches up to the flagship 200 run as ONE full block per kernel
    (requires the raised scoped-VMEM limit, train/step.py
    fused_compiler_options); larger batches fall back to 112/56 blocks
    (measured safe under the default 16 MiB limit), each divisible by 8
    unless it spans the whole (padded) batch."""
    from multimodal_seq2seq_gscan_tpu.models.model import _fused_batch_block

    assert _fused_batch_block(6) == (6, 6, 6)      # small batch: one block
    assert _fused_batch_block(200) == (200, 200, 200)  # flagship: one block
    assert _fused_batch_block(224) == (112, 56, 224)   # beyond the cap
    for batch in (13, 30, 111, 200, 512, 4096):
        fwd, bwd, padded = _fused_batch_block(batch)
        assert padded >= batch and padded % fwd == 0 and padded % bwd == 0
        assert fwd == padded or fwd % 8 == 0
        assert bwd == padded or bwd % 8 == 0
        assert batch <= 200 or (fwd <= 112 and bwd <= 64)


def test_padded_batch_path_matches_scan(setup, monkeypatch):
    """Force the batch-padding branch (block < batch) on the end-to-end model
    path: loss and parameter gradients must still equal the XLA scan path."""
    import multimodal_seq2seq_gscan_tpu.models.model as model_mod
    from multimodal_seq2seq_gscan_tpu.models.model import forward, get_loss

    monkeypatch.setattr(model_mod, "_fused_batch_block",
                        lambda batch: (4, 2, 8))

    config, _ = setup
    params = init_model_params(jax.random.PRNGKey(9), config)
    rng = np.random.RandomState(11)
    input_ids = jnp.asarray(rng.randint(1, V_IN, size=(BATCH, T_IN)),
                            jnp.int32)
    input_lengths = jnp.full((BATCH,), T_IN, jnp.int32)
    situations = jnp.asarray(rng.rand(BATCH, GRID, GRID, CH), jnp.float32)
    targets = np.zeros((BATCH, 13), np.int32)
    for i in range(BATCH):
        n = rng.randint(4, 12)
        targets[i, 0] = 1
        targets[i, 1:n - 1] = rng.randint(3, 9, size=n - 2)
        targets[i, n - 1] = 2
    targets = jnp.asarray(targets)
    cfg_pallas = config._replace(teacher_forced_impl="pallas")

    def loss_for(cfg):
        def loss(p):
            log_probs, _ = forward(p, cfg, input_ids, input_lengths,
                                   situations, targets, deterministic=True)
            return get_loss(cfg, log_probs, targets)
        return loss

    loss_x, grads_x = jax.value_and_grad(loss_for(config))(params)
    loss_p, grads_p = jax.value_and_grad(loss_for(cfg_pallas))(params)
    np.testing.assert_allclose(float(loss_x), float(loss_p), rtol=1e-5)
    for gx, gp in zip(jax.tree.leaves(grads_x), jax.tree.leaves(grads_p)):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gp),
                                   rtol=3e-4, atol=3e-5)
