"""Jitted train / eval steps, optionally sharded over a device mesh.

The train step computes loss (+ weighted auxiliary loss, reference
seq2seq/train.py:99-113), grads, and the Adam update in one XLA program.
Data parallelism: batches are sharded over the mesh's 'data' axis via input
shardings; XLA inserts the gradient all-reduce automatically from the
replicated-parameter / sharded-batch sharding annotations.
"""




import jax
import jax.numpy as jnp
import optax

from multimodal_seq2seq_gscan_tpu.core.batch import Batch
from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.models.model import (
    forward, get_auxiliary_accuracy, get_auxiliary_loss, get_loss, get_metrics)
from multimodal_seq2seq_gscan_tpu.train.state import TrainState


def loss_fn(params, config: ModelConfig, batch: Batch, rng,
            weight_target_loss: float, deterministic: bool = False):
    log_probs, aux_scores = forward(
        params, config, batch.input_ids, batch.input_lengths, batch.situations,
        batch.target_ids, rng=rng, deterministic=deterministic)
    loss = get_loss(config, log_probs, batch.target_ids)
    if config.auxiliary_task:
        aux_loss = get_auxiliary_loss(aux_scores, batch.target_positions,
                                      valid=batch.target_lengths > 0)
        loss = loss + weight_target_loss * aux_loss
    return loss, (log_probs, aux_scores)


def train_step_body(state: TrainState, batch: Batch, config: ModelConfig,
                    optimizer: optax.GradientTransformation,
                    weight_target_loss: float):
    """One optimizer step (shared by the per-step jit and the scanned chunk)."""
    step_rng = jax.random.fold_in(state.rng, state.step)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, (log_probs, aux_scores)), grads = grad_fn(
        state.params, config, batch, step_rng, weight_target_loss)
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    accuracy, exact_match = get_metrics(config, log_probs, batch.target_ids)
    if config.auxiliary_task:
        aux_accuracy = get_auxiliary_accuracy(
            aux_scores, batch.target_positions,
            valid=batch.target_lengths > 0)
    else:
        aux_accuracy = jnp.zeros(())
    metrics = {"loss": loss, "accuracy": accuracy,
               "exact_match": exact_match, "aux_accuracy": aux_accuracy}
    new_state = TrainState(step=state.step + 1, params=new_params,
                           opt_state=new_opt_state, rng=state.rng)
    return new_state, metrics


def make_train_step(config: ModelConfig, optimizer: optax.GradientTransformation,
                    weight_target_loss: float = 0.3, mesh=None,
                    donate: bool = True):
    """Build the jitted training step.

    With ``mesh``, parameters/optimizer state are replicated and batch arrays
    sharded along the 'data' axis; on one device everything stays local.
    """

    def train_step(state: TrainState, batch: Batch):
        return train_step_body(state, batch, config, optimizer,
                               weight_target_loss)

    compiler_options = fused_compiler_options(config)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        replicated = NamedSharding(mesh, P())
        data_sharded = NamedSharding(mesh, P("data"))
        # Params/opt state replicated; every batch array sharded on its
        # leading (batch) axis. Shardings are pytree prefixes.
        batch_shardings = Batch(*([data_sharded] * len(Batch._fields)))
        return jax.jit(train_step,
                       in_shardings=(replicated, batch_shardings),
                       out_shardings=(replicated, replicated),
                       donate_argnums=(0,) if donate else (),
                       compiler_options=compiler_options)
    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   compiler_options=compiler_options)


def fused_compiler_options(config: ModelConfig):
    """Per-program compiler options the fused teacher-forced kernels need.

    The full-batch single-block configuration (the fast one — grid blocks
    serialize) exceeds the 16 MiB default scoped-VMEM limit, so the program
    must be compiled with a raised limit (v5e has 128 MiB of VMEM). Returns
    None for the XLA impl or off-TPU (the flag is TPU-specific and the CPU
    interpret path doesn't need it)."""
    if (config.teacher_forced_impl == "pallas"
            and jax.default_backend() == "tpu"):
        from multimodal_seq2seq_gscan_tpu.ops.pallas_teacher_forced import (
            SCOPED_VMEM_LIMIT_KIB)
        return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_LIMIT_KIB)}
    return None


def make_eval_forward(config: ModelConfig):
    """Jitted teacher-forced eval forward (loss + metrics, no dropout)."""

    @jax.jit
    def eval_forward(params, batch: Batch):
        log_probs, aux_scores = forward(
            params, config, batch.input_ids, batch.input_lengths,
            batch.situations, batch.target_ids, deterministic=True)
        loss = get_loss(config, log_probs, batch.target_ids)
        accuracy, exact_match = get_metrics(config, log_probs, batch.target_ids)
        return {"loss": loss, "accuracy": accuracy, "exact_match": exact_match}

    return eval_forward
