"""Small harness utilities shared across the package.

count_parameters: reference MicFormer/utils.py:141-142 parity — total trainable
parameter count (the number the reference reports for each model family).
"""

from __future__ import annotations

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total element count of a parameter pytree (utils.py:141-142 parity)."""
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))
