"""Device mesh construction and sharding helpers.

The reference has no distributed backend at all (SURVEY.md §2.3: its only
parallelism is goroutine fan-out under mutexes, poly.go:95-153); callers
ship gob bytes themselves.  Here scaling is first-class: ciphertext batches
are arrays, so data parallelism is a NamedSharding over a 1-D 'data' mesh
axis and every scheme kernel runs SPMD unchanged, with XLA inserting any
needed collectives over ICI."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_spec(batch_axis_pos: int, ndim: int, axis: str = DATA_AXIS) -> P:
    """PartitionSpec sharding one axis, replicating the rest."""
    spec = [None] * ndim
    spec[batch_axis_pos] = axis
    return P(*spec)


def shard_ciphertext(ct, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a Ciphertext batch on the mesh, sharded along the batch axis.

    L1 ciphertexts are AffinePoint(x[L,B], y[L,B], inf[B]); L2 are
    [2, L, B] GT arrays.  Limb/coordinate axes are replicated."""
    from ..ops.curve import AffinePoint
    from ..scheme import Ciphertext

    if ct.level2:
        sh = NamedSharding(mesh, batch_spec(2, 3, axis))
        return Ciphertext(jax.device_put(ct.data, sh), True)
    pt = AffinePoint(
        jax.device_put(ct.data.x, NamedSharding(mesh, batch_spec(1, 2, axis))),
        jax.device_put(ct.data.y, NamedSharding(mesh, batch_spec(1, 2, axis))),
        jax.device_put(ct.data.inf,
                       NamedSharding(mesh, batch_spec(0, 1, axis))))
    return Ciphertext(pt, False)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (keys, tables) across the mesh."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), tree)
