"""Collective/mesh backend: the one place that touches jax collectives.

The reference has no distributed layer (SURVEY.md §2.8/§5); its only
device-boundary precedent is the risc0 zkVM syscall
(k256/src/arithmetic/field/field_8x32_risc0.rs:178). Here the analogue is a
thin wrapper over jax.lax collectives on a named mesh so kernels never call
collectives directly — swap this module to retarget ICI vs DCN topologies.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS


def make_mesh(n_devices: int | None = None, axis: str = "dp",
              shape: tuple | None = None, axes: tuple | None = None) -> Mesh:
    """1-D mesh by default; pass shape/axes for multi-axis topologies, e.g.
    shape=(hosts, chips_per_host), axes=("dcn", "ici") to keep intra-host
    traffic on ICI and cross-host reduction on DCN."""
    devs = jax.devices()
    if shape is None:
        n = n_devices or len(devs)
        return Mesh(np.array(devs[:n]).reshape(n), (axis,))
    n = int(np.prod(shape))
    return Mesh(np.array(devs[:n]).reshape(shape), axes or
                tuple(f"ax{i}" for i in range(len(shape))))


def shard_batch(mesh: Mesh, axis, arr, batch_axis: int = -1):
    """Place an array with its batch axis sharded over `axis` (one mesh axis
    name or a tuple for multi-axis sharding)."""
    spec = [None] * arr.ndim
    spec[batch_axis] = axis
    return jax.device_put(arr, NamedSharding(mesh, PS(*spec)))


# in-SPMD collectives (usable inside shard_map bodies)

def all_gather(x, mesh_axis: str, axis: int = 0, tiled: bool = True):
    """Gather shards over `mesh_axis` along array dim `axis` (the MSM
    partial-fold transport, parallel/msm.py::msm_sharded)."""
    return jax.lax.all_gather(x, mesh_axis, axis=axis, tiled=tiled)


def axis_size(mesh_axis: str) -> int:
    """Static size of a named mesh axis inside a shard_map body."""
    return jax.lax.axis_size(mesh_axis)


def ppermute_ring_reduce(x, mesh_axis: str, fold):
    """Ring all-reduce with an arbitrary fold: D-1 neighbor `ppermute`
    steps, each followed by fold(acc, received).

    The second collective implementation behind the backend seam (the
    all_gather+tree-fold alternative): traffic is strictly nearest-neighbor
    (rides ICI ring links with no fan-in hotspot), memory is O(1) payloads
    instead of the gather's O(D), at the cost of D-1 sequential folds vs
    the tree's ceil(log2 D). Wins when the payload is small and the axis is
    short (the MSM partial fold: one [3, n_limbs] point per device); the
    gather-fold wins when D is large enough that log-depth matters.

    `fold` must be associative+commutative over the payload (point addition
    is). Every device ends with the identical full reduction.

    The D-1 steps run inside ONE lax.scan body so the fold traces once —
    unrolled, the sharded-MSM program grew from 75k to 133k jaxpr lines at
    D=8 (COMPILE.md round 4).
    """
    D = axis_size(mesh_axis)
    perm = [(i, (i + 1) % D) for i in range(D)]

    def step(carry, _):
        acc, send = carry
        recv = jax.lax.ppermute(send, mesh_axis, perm=perm)
        return (fold(acc, recv), recv), None

    (acc, _), _ = jax.lax.scan(step, (x, x), None, length=D - 1)
    return acc
