from .blocks import FeatureEmbedding, LinearBlock, make_divisible
from .coo_densenet import CooStemDenseNet
from .densenet import DenseNet
from .encoder import (
    DecoderLayer,
    EncoderLayer,
    InducedSetAttentionBlock,
    TransformerEncoder,
)
from .heads import EventDecoder, ProngDecoder
from .mobilenet import MobileNetV2
from .network import ModelConfig, TransformerCVN, create_pixel_embedder
from .pooling import MaskedSoftmaxPooling, MultiHeadPooling
from .resnet import ResNetStack
from .sdxl import SDXLEncoder
from .sparse_convnext import SparseConvNeXt
from .sparse_densenet import SparseDenseNet
from .sparse_fcnn import SparseFCNN

__all__ = [
    "FeatureEmbedding",
    "LinearBlock",
    "make_divisible",
    "CooStemDenseNet",
    "DenseNet",
    "DecoderLayer",
    "EncoderLayer",
    "InducedSetAttentionBlock",
    "TransformerEncoder",
    "EventDecoder",
    "ProngDecoder",
    "MobileNetV2",
    "ModelConfig",
    "TransformerCVN",
    "create_pixel_embedder",
    "MaskedSoftmaxPooling",
    "MultiHeadPooling",
    "ResNetStack",
    "SDXLEncoder",
    "SparseConvNeXt",
    "SparseDenseNet",
    "SparseFCNN",
]
