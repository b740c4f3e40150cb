"""TPU-first op substrate shared by the model zoo.

Pure-function building blocks (windowing, batched window attention, trilinear
warp, positional encodings, resizing). Everything here is jit-safe: static
shapes, no data-dependent Python control flow. Pallas-fused variants of the
hot ops live in micformer_tpu/ops/pallas/ and are selected automatically on
TPU backends (falling back to the XLA reference implementations elsewhere).
"""

from micformer_tpu.ops.windows import (  # noqa: F401
    window_partition,
    window_reverse,
    shifted_window_mask,
    relative_position_index,
)
from micformer_tpu.ops.attention import multi_head_attention  # noqa: F401
from micformer_tpu.ops.warp import trilinear_sample, stn_warp  # noqa: F401
