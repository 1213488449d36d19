from .numerics import (
    survival_from_logits,
    log_survival_from_logits,
    l1_normalize,
    masked_attention_logits,
    MASK_FILL_VALUE,
)
from .mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch

__all__ = [
    "survival_from_logits",
    "log_survival_from_logits",
    "l1_normalize",
    "masked_attention_logits",
    "MASK_FILL_VALUE",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
