"""Application-level encrypted workloads built on the scheme primitives."""
from .encrypted_dot import encrypted_dot  # noqa: F401
