"""Checkpointing: train state + bookkeeping, with best-on-dev-exact-match copy.

Mirrors the reference checkpoint semantics (seq2seq/model.py:237-261,
train.py:141-149): the running checkpoint holds {iteration, parameters,
optimizer state, best_iteration, best_accuracy, best_exact_match}; whenever dev
exact match improves the checkpoint is copied to ``model_best``.

Serialization is flax msgpack (pytree-faithful, framework-native) plus a JSON
sidecar with the scalar bookkeeping.
"""

import json
import logging
import os
import shutil
from typing import Tuple

import jax
from flax import serialization

from multimodal_seq2seq_gscan_tpu.train.state import TrainState

logger = logging.getLogger(__name__)

CHECKPOINT_FILE = "checkpoint.msgpack"
BEST_CHECKPOINT_FILE = "model_best.msgpack"


def save_checkpoint(output_directory: str, state: TrainState, *,
                    is_best: bool = False, best_iteration: int = 0,
                    best_accuracy: float = 0.0, best_exact_match: float = 0.0,
                    file_name: str = CHECKPOINT_FILE) -> str:
    os.makedirs(output_directory, exist_ok=True)
    path = os.path.join(output_directory, file_name)
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = {
        "iteration": int(state.step),
        "best_iteration": int(best_iteration),
        "best_accuracy": float(best_accuracy),
        "best_exact_match": float(best_exact_match),
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=4)
    if is_best:
        best_path = os.path.join(output_directory, BEST_CHECKPOINT_FILE)
        shutil.copyfile(path, best_path)
        shutil.copyfile(path + ".json", best_path + ".json")
    return path


def load_checkpoint(path: str, template: TrainState
                    ) -> Tuple[TrainState, dict]:
    """Restore a TrainState (template supplies the pytree structure/shapes)."""
    assert os.path.isfile(path), "No checkpoint found at {}".format(path)
    with open(path, "rb") as f:
        state = serialization.from_bytes(template, f.read())
    meta_path = path + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    else:
        meta = {"iteration": int(state.step), "best_iteration": 0,
                "best_accuracy": 0.0, "best_exact_match": 0.0}
    logger.info("Loaded checkpoint '%s' (iter %d)", path, meta["iteration"])
    return state, meta
