"""Device mesh + shard_map wrappers for the alignment kernels."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "reads") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_batch_to(arrays, batch: int):
    """Pad leading (read-batch) axis of every array to ``batch`` rows.

    Padding replicates the last read; callers slice results back to the
    true batch.  Needed so the batch divides the mesh axis.
    """
    out = []
    for a in arrays:
        b = a.shape[0]
        if b < batch:
            pad = jnp.repeat(a[-1:], batch - b, axis=0)
            a = jnp.concatenate([a, pad], axis=0)
        out.append(a)
    return out


def sharded_poa_fill(mesh: Mesh, mode: int = 0):
    """Return a jitted, reads-sharded POA fill for ``mode`` (0 or 1).

    Read tensors (seq, L, bta) are sharded over the ``reads`` mesh
    axis; the graph pytree and score table are replicated per chip.
    """
    from ..ops import poa_engine

    axis = mesh.axis_names[0]
    if mode == 0:
        fill = poa_engine._fill_global.__wrapped__
        in_specs = (P(), P(), P(axis), P(axis), P(axis))
    elif mode == 1:
        fill = poa_engine._fill_local.__wrapped__
        in_specs = (P(), P(), P(axis), P(axis))
    else:
        raise ValueError(mode)
    sharded = jax.shard_map(
        fill, mesh=mesh, in_specs=in_specs, out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)
