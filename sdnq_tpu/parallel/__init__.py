from .mesh import create_mesh, Mesh, NamedSharding, P
from .sharding import (
    qtensor_shardings, shard_params, DIT_TP_RULES, logical_axis_rules,
)
from .ring_attention import ring_attention
from .ulysses import ulysses_attention
from .pipeline import pipeline_forward, shard_stage_params

__all__ = [
    "create_mesh", "Mesh", "NamedSharding", "P",
    "qtensor_shardings", "shard_params", "DIT_TP_RULES",
    "logical_axis_rules", "ring_attention", "ulysses_attention",
    "pipeline_forward", "shard_stage_params",
]
