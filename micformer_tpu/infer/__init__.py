from micformer_tpu.infer.sliding_window import (  # noqa: F401
    sliding_window_inference,
    compute_steps_monai,
    compute_steps_nnunet,
    gaussian_importance_map,
)
