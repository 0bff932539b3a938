"""Batched group-arithmetic kernels: F_p^2, the A1 curve, and the pairing."""
