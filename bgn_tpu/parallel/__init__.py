"""Mesh/sharding layer: data-parallel batches and giant-step-sharded BSGS."""
from .mesh import make_mesh, shard_ciphertext, replicate, DATA_AXIS  # noqa
