"""Core: config, device mesh/sharding helpers, checkpointing."""

from .config import Config, parse_args
from .sharding import make_mesh, shard_batch, shard_params

__all__ = ["Config", "parse_args", "make_mesh", "shard_batch",
           "shard_params"]
