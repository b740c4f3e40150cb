from micformer_tpu.infer.sliding_window import (  # noqa: F401
    sliding_window_inference,
    compute_steps_monai,
    compute_steps_nnunet,
    gaussian_importance_map,
)
from micformer_tpu.infer.sliding_window_2d import (  # noqa: F401
    sliding_window_inference_2d,
    sliding_window_inference_pseudo3d,
)
