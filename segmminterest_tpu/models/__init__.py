from .segformerx import SegFormerX, SegFormerXLayer, FourStreamAttention, KnMLP, MLPBlock
from .interest import SegInterestModel, InteractionAggregation, model_loss
from . import losses

__all__ = [
    "SegFormerX",
    "SegFormerXLayer",
    "FourStreamAttention",
    "KnMLP",
    "MLPBlock",
    "SegInterestModel",
    "InteractionAggregation",
    "model_loss",
    "losses",
]
