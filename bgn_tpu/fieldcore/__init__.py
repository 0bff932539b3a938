"""Limb-vectorized big-integer and Montgomery field arithmetic kernels."""
from . import limbs, montgomery  # noqa: F401
from .montgomery import MontCtx, make_mont_ctx  # noqa: F401
