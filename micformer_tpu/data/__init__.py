from micformer_tpu.data.mmwhs import (
    MMWHSDataset,
    get_datasets,
    kfold_split,
)
from micformer_tpu.data.nifti import load_nii, read_nifti, write_nifti
from micformer_tpu.data import image_utils  # noqa: F401
