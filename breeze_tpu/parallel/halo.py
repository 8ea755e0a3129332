"""Explicit distributed halo exchange for shard_map execution.

TPU-native equivalent of the reference's MPI ``fill_halo_regions!``
(Oceananigans DistributedComputations; SURVEY.md §2.3 item 2): under
``jax.shard_map``, each device holds an interior shard of the (y, x) plane;
halo padding along a sharded periodic axis becomes a neighbor exchange via
``lax.ppermute`` over the ICI ring (cyclic permutation = periodic global
topology).

Two ways to use it:

1. **GSPMD (default production path)**: don't use this module — jit with
   ``NamedSharding`` and XLA partitions :func:`breeze_tpu.fields.pad`'s
   concatenate-of-slices into the same collective-permutes automatically.
2. **shard_map (manual path)**: wrap per-shard step code with
   :func:`shard_axes` so :func:`pad_axis_sharded` routes the wrap halos
   through ppermute.  This is the hook for future Pallas
   ``make_async_remote_copy`` halo kernels overlapped with interior compute
   (SURVEY.md §7 phase 8).
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp

_ctx = threading.local()


def _current_axes():
    return getattr(_ctx, "axes", {})


@contextlib.contextmanager
def shard_axes(axes: dict[int, str]):
    """Declare mesh axis names per array axis, e.g. {1: "y", 2: "x"}."""
    old = _current_axes()
    _ctx.axes = dict(axes)
    try:
        yield
    finally:
        _ctx.axes = old


def axis_is_sharded(axis: int) -> bool:
    return axis in _current_axes()


def pad_axis_sharded(a: jax.Array, axis: int, h: int) -> jax.Array:
    """Periodic halo pad along a sharded axis via neighbor ppermute.

    The local shard receives its left neighbor's top h slab and its right
    neighbor's bottom h slab; the cyclic permutation realizes the global
    periodic topology across the whole mesh axis.
    """
    name = _current_axes()[axis]
    n_shards = jax.lax.axis_size(name)
    n = a.shape[axis]
    lo_slab = jax.lax.slice_in_dim(a, n - h, n, axis=axis)   # my top → right nbr
    hi_slab = jax.lax.slice_in_dim(a, 0, h, axis=axis)       # my bottom → left nbr

    if n_shards == 1:
        return jnp.concatenate([lo_slab, a, hi_slab], axis=axis)

    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_left = jax.lax.ppermute(lo_slab, name, fwd)    # left nbr's top slab
    from_right = jax.lax.ppermute(hi_slab, name, bwd)   # right nbr's bottom slab
    return jnp.concatenate([from_left, a, from_right], axis=axis)
