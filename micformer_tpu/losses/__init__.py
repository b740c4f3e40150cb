from micformer_tpu.losses.dice import (
    mdice_loss,
    mdice_val_loss,
    hard_dice_metric,
    soft_dice_per_channel,
)
from micformer_tpu.losses.metrics import meandice, mean_iou, hd95
