from .blocks import FeatureEmbedding, LinearBlock, make_divisible
from .densenet import DenseNet
from .encoder import EncoderLayer, TransformerEncoder
from .heads import EventDecoder, ProngDecoder
from .network import ModelConfig, TransformerCVN, create_pixel_embedder

__all__ = [
    "FeatureEmbedding",
    "LinearBlock",
    "make_divisible",
    "DenseNet",
    "EncoderLayer",
    "TransformerEncoder",
    "EventDecoder",
    "ProngDecoder",
    "ModelConfig",
    "TransformerCVN",
    "create_pixel_embedder",
]
