from .masked import MaskedBatchNorm, PReLU
from .scatter import densify_images, pack_rows, pad_rows
from .losses import class_balanced_loss, sigmoid_focal_loss, softmax_focal_loss

__all__ = [
    "MaskedBatchNorm",
    "PReLU",
    "densify_images",
    "pack_rows",
    "pad_rows",
    "class_balanced_loss",
    "sigmoid_focal_loss",
    "softmax_focal_loss",
]
