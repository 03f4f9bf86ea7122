"""Training state: parameters + Adam optimizer + exponential-decay schedule.

Optimizer semantics match the reference: Adam(lr, betas) with per-step
LR multiplier ``lr_decay ** (step / lr_decay_steps)`` (reference
seq2seq/train.py:68-70).
"""

from typing import NamedTuple

import jax
import optax

from multimodal_seq2seq_gscan_tpu.models.config import ModelConfig
from multimodal_seq2seq_gscan_tpu.models.params import (
    ModelParams, init_model_params)


class TrainState(NamedTuple):
    step: jax.Array
    params: ModelParams
    opt_state: optax.OptState
    rng: jax.Array


def make_lr_schedule(learning_rate: float, lr_decay: float,
                     lr_decay_steps: float):
    def schedule(step):
        return learning_rate * (lr_decay ** (step / lr_decay_steps))
    return schedule


def make_optimizer(learning_rate: float = 0.001, adam_beta_1: float = 0.9,
                   adam_beta_2: float = 0.999, lr_decay: float = 0.9,
                   lr_decay_steps: float = 20000.0) -> optax.GradientTransformation:
    schedule = make_lr_schedule(learning_rate, lr_decay, lr_decay_steps)
    return optax.adam(learning_rate=schedule, b1=adam_beta_1, b2=adam_beta_2)


def create_train_state(rng: jax.Array, config: ModelConfig,
                       optimizer: optax.GradientTransformation) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    params = init_model_params(init_rng, config)
    opt_state = optimizer.init(params)
    import jax.numpy as jnp
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, rng=state_rng)
