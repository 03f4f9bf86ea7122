"""Parameter logging (reference seq2seq/helpers.py:35-41 equivalent)."""

import logging

import jax

logger = logging.getLogger(__name__)


def log_parameters(params) -> int:
    """Log every parameter array's path and shape plus the total count."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    total = 0
    for path, leaf in flat:
        total += leaf.size
        name = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                        for p in path)
        logger.info("%s : %s", name, list(leaf.shape))
    logger.info("Total parameters: %d", total)
    return total
