from .coo_conv import ConvMaps, build_conv_maps, coo_conv_apply, coo_stem_conv
from .losses import (
    binary_event_loss,
    class_balanced_loss,
    sigmoid_focal_loss,
    softmax_focal_loss,
    split_event_targets,
)
from .masked import MaskedBatchNorm, PReLU
from .scatter import densify_images, pack_rows, pad_rows
from .sparse import (
    SparseGrid,
    from_coo,
    sparse_avg_pool,
    sparse_conv,
    sparse_global_avg_pool,
)

__all__ = [
    "ConvMaps",
    "build_conv_maps",
    "coo_conv_apply",
    "coo_stem_conv",
    "binary_event_loss",
    "class_balanced_loss",
    "sigmoid_focal_loss",
    "softmax_focal_loss",
    "split_event_targets",
    "MaskedBatchNorm",
    "PReLU",
    "densify_images",
    "pack_rows",
    "pad_rows",
    "SparseGrid",
    "from_coo",
    "sparse_avg_pool",
    "sparse_conv",
    "sparse_global_avg_pool",
]
