"""multimodal_seq2seq_gscan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
grounded SCAN (gSCAN) multimodal sequence-to-sequence experiments.

Re-designed from scratch for TPU hardware with the same capabilities as the
PyTorch reference (LauraRuis/multimodal_seq2seq_gSCAN):

- ``gscan``     — the gSCAN dataset engine: grammar, gridworld simulator, oracle
                  demonstrations, dataset generation/loading and split assignment
                  (host-side, NumPy; replaces ``GroundedScan/``).
- ``core``      — data contracts shared between host pipeline and device code.
- ``data``      — the input pipeline: tokenization, dense situation vectorization,
                  bucketing/padding, device feeding (replaces ``seq2seq/gSCAN_dataset.py``).
- ``models``    — flax modules: situation CNN, BiLSTM command encoder, additive
                  attention, Bahdanau decoder — all ``lax.scan``-based, batch-first,
                  static shapes (replaces ``seq2seq/{cnn_model,seq2seq_model,model}.py``).
- ``train``     — jitted train step, Adam + exponential-decay schedule, metrics,
                  checkpointing (replaces ``seq2seq/train.py``).
- ``decode``    — fully-batched ``lax.scan`` greedy decoder + ``predict.json`` writer
                  (replaces the batch-1 loop of ``seq2seq/predict.py``).
- ``parallel``  — ``jax.sharding.Mesh`` utilities for data/model parallel execution.
- ``analysis``  — error/position analysis and visualization over predict.json.
- ``cli``       — command-line entry points mirroring the reference's two CLIs.
"""

__version__ = "0.1.0"
