"""Batch contract: the fixed-shape pytree fed to jitted device code.

All arrays are batch-first with static (bucketed) sequence dimensions so XLA
compiles once per bucket shape and never recompiles in the steady state.
"""

from typing import NamedTuple

import jax
import numpy as np


class Batch(NamedTuple):
    """One padded batch of gSCAN examples.

    Attributes:
      input_ids:      [B, T_in]  int32, SOS + tokens + EOS, zero-padded.
      input_lengths:  [B]        int32, true lengths incl. SOS/EOS.
      situations:     [B, H, W, C] float32 dense grid (C = object attrs + 1 + 4).
      target_ids:     [B, T_out] int32, SOS + tokens + EOS, zero-padded.
      target_lengths: [B]        int32, true lengths incl. SOS/EOS.
      agent_positions:  [B] int32 flattened row*grid_size+col agent cell.
      target_positions: [B] int32 flattened target-object cell.
    """

    input_ids: jax.Array
    input_lengths: jax.Array
    situations: jax.Array
    target_ids: jax.Array
    target_lengths: jax.Array
    agent_positions: jax.Array
    target_positions: jax.Array

    @property
    def batch_size(self) -> int:
        return self.input_ids.shape[0]

    @classmethod
    def stack_examples(cls, input_arrays, situation_arrays, target_arrays,
                       agent_positions, target_positions,
                       max_input_length=None, max_target_length=None) -> "Batch":
        """Pad variable-length numpy examples to a common shape (host side)."""
        input_lengths = np.array([len(a) for a in input_arrays], dtype=np.int32)
        target_lengths = np.array([len(a) for a in target_arrays], dtype=np.int32)
        t_in = int(max_input_length or input_lengths.max())
        t_out = int(max_target_length or target_lengths.max())
        batch = len(input_arrays)
        input_ids = np.zeros((batch, t_in), dtype=np.int32)
        target_ids = np.zeros((batch, t_out), dtype=np.int32)
        for i, (inp, tgt) in enumerate(zip(input_arrays, target_arrays)):
            input_ids[i, :len(inp)] = inp
            target_ids[i, :len(tgt)] = tgt
        situations = np.stack(situation_arrays).astype(np.float32)
        return cls(
            input_ids=input_ids,
            input_lengths=input_lengths,
            situations=situations,
            target_ids=target_ids,
            target_lengths=target_lengths,
            agent_positions=np.asarray(agent_positions, dtype=np.int32),
            target_positions=np.asarray(target_positions, dtype=np.int32),
        )
