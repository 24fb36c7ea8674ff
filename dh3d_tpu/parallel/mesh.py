"""Device-mesh utilities for data-parallel training.

The reference has no distributed backend at all (SURVEY.md §2.3 — single
GPU `SimpleTrainer`, `train.py:75`).  Parallelism here is greenfield and
TPU-native: a 1-D `data` mesh, batch (the tuple-flattened cloud axis)
sharded across it, parameters replicated.  The train step is an ordinary
`jax.jit` with sharding annotations — XLA inserts the gradient psum and
cross-device BatchNorm reductions over ICI automatically (global-view
semantics), so batch-norm is effectively sync-BN across the mesh for free.

Multi-slice / multi-host (DCN) scaling uses the same global-view step on
a 2-axis mesh `("dcn", "data")` from `multihost_mesh`: the batch shards
over the PRODUCT of both axes and parameters replicate over both, so the
gradient reduction XLA inserts is hierarchical — reduce-scatter/all-reduce
inside each slice over ICI first, then the (much smaller) cross-slice sum
over DCN.  Nothing in the model or losses names a mesh axis (global-view),
so the same train step runs unchanged on either mesh; only the device_put
shardings from `shard_batch` differ.  Since point clouds fit on one chip,
DCN never carries activations — only gradients/params — which is exactly
the regime DCN bandwidth supports.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}"
        )
    return Mesh(np.array(devices[:n_devices]), axis_names=("data",))


def multihost_mesh(n_slices: int, per_slice: int | None = None) -> Mesh:
    """2-axis `("dcn", "data")` mesh: `n_slices` groups of `per_slice`
    devices.  On real multi-slice hardware, devices within a row share
    ICI and rows communicate over DCN (jax orders `jax.devices()` by
    (slice, on-slice id), so the reshape maps rows to slices); on a CPU
    test mesh it exercises the same 2-axis shardings."""
    devices = jax.devices()
    if per_slice is None:
        per_slice = len(devices) // n_slices
    need = n_slices * per_slice
    if need > len(devices):
        raise ValueError(
            f"requested {n_slices}x{per_slice} devices, have {len(devices)}"
        )
    arr = np.array(devices[:need]).reshape(n_slices, per_slice)
    return Mesh(arr, axis_names=("dcn", "data"))


def _batch_axes(mesh: Mesh):
    """The mesh axes the batch shards over: every axis (product DP)."""
    return tuple(mesh.axis_names)


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Leading (cloud) axis sharded across all mesh axes (product DP)."""
    return NamedSharding(mesh, P(_batch_axes(mesh)))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a batch pytree: arrays whose leading axis divides the mesh
    are sharded on 'data'; the rest (e.g. the per-anchor R matrices, which
    have half the cloud count) are replicated — XLA re-shards them as needed
    inside the jitted step.

    A *whole batch* that cannot shard (no leaf's leading axis divisible by
    the mesh) silently loses all DP speedup, so that case warns loudly:
    pick batch sizes (x tuple fan-out) divisible by the mesh size.
    """
    import warnings

    n = int(np.prod([mesh.shape[a] for a in _batch_axes(mesh)]))
    sharded = shard_batch_spec(mesh)
    replicated = replicate_spec(mesh)

    def divisible(x):
        return x.ndim > 0 and x.shape[0] % n == 0

    if n > 1 and not any(map(divisible, jax.tree_util.tree_leaves(batch))):
        shapes = [tuple(x.shape)
                  for x in jax.tree_util.tree_leaves(batch)]
        warnings.warn(
            f"shard_batch: no array in the batch has a leading axis "
            f"divisible by the {n}-device mesh (shapes {shapes}); the whole "
            f"batch is REPLICATED and every device does the full-batch "
            f"work. Choose batch_size*tuple_size divisible by {n}.",
            stacklevel=2,
        )

    def put(x):
        spec = sharded if divisible(x) else replicated
        return jax.device_put(x, spec)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    spec = replicate_spec(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), tree)
