"""ctypes bindings for the native host-math accelerator (csrc/).

The C++ library accelerates keygen's number-theory hot loops (the role
PBC's C param generator plays for the reference, bgn.go:93): Miller-Rabin
primality and the A1 cofactor search with an incremental small-prime sieve.
Falls back silently to pure Python (hostmath.py) when the .so is absent --
build it with `make native`."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                        "libbgnhost.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
        lib.bgn_is_probable_prime.restype = ctypes.c_int
        lib.bgn_is_probable_prime.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.bgn_find_cofactor.restype = ctypes.c_ulonglong
        lib.bgn_find_cofactor.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_ulonglong,
            ctypes.c_ulonglong, ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def is_probable_prime(n: int, rounds: int = 40) -> Optional[bool]:
    """Native Miller-Rabin; None if the library is unavailable."""
    lib = _load()
    if lib is None or n < 0:
        return None
    nbytes = max((n.bit_length() + 7) // 8, 1)
    if nbytes > 72 * 8:
        return None
    r = lib.bgn_is_probable_prime(n.to_bytes(nbytes, "little"), nbytes,
                                  rounds)
    if r < 0:
        return None
    return bool(r)


def find_cofactor(n: int, start_l: int = 4, max_l: int = 1 << 40,
                  rounds: int = 40) -> Optional[int]:
    """Native A1 cofactor search; None if unavailable or not found."""
    lib = _load()
    if lib is None:
        return None
    nbytes = max((n.bit_length() + 7) // 8, 1)
    if nbytes > 70 * 8:
        return None
    l = lib.bgn_find_cofactor(n.to_bytes(nbytes, "little"), nbytes,
                              start_l, max_l, rounds)
    return int(l) if l else None
