from micformer_tpu.convert.torch_import import (  # noqa: F401
    linear_kernel,
    conv3d_kernel,
    conv_transpose3d_kernel,
    micformer_params_from_torch,
    load_reference_micformer,
    vtunet_params_from_swin2d,
    load_pretrained_params,
)
