"""Device-mesh helpers for data-parallel training and extraction.

The reference's only multi-device use is ``nn.DataParallel`` on the
ResNet50 extractor (ref feature_extraction.py:99-100); here data
parallelism is a first-class ``jax.sharding.Mesh`` + NamedSharding
annotation on the batch axis — XLA inserts the gradient all-reduce over
ICI.  Bags within a batch stay on one chip (bag-level parallelism is the
batch axis; cross-chip bag sharding via psum-combined partial softmax is
the planned extension for ~100k-instance bags).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int,
                   axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Device-put every array in a loader batch with its leading (batch)
    dimension sharded over the mesh."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.dtype != object:
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim, axis))
        else:
            out[k] = v
    return out


def pad_batch_to_devices(batch: dict, n_devices: int) -> dict:
    """Pad the batch axis to a multiple of the mesh size (padded rows have
    valid=0 so losses/metrics ignore them)."""
    some = next(v for v in batch.values()
                if hasattr(v, "ndim") and v.ndim >= 1 and v.dtype != object)
    B = some.shape[0]
    rem = (-B) % n_devices
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.dtype != object \
                and v.shape[0] == B:
            pad = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# bag (instance-axis) sharding — sequence parallelism for MIL bags
# ---------------------------------------------------------------------------

BAG_AXIS = "bag"


def make_bag_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the bag (instance) axis for cross-chip sharded
    attention pooling (ops/sharded_pool.py; cfg.bag_shard)."""
    return make_mesh(n_devices, axis=BAG_AXIS)


def shard_batch_bags(batch: dict, mesh: Mesh, axis: str = BAG_AXIS) -> dict:
    """Device-put a loader batch with the INSTANCE axis (dim 1) of bag
    arrays sharded over the mesh; everything else replicated.  Pads the
    instance axis to a mesh-size multiple with masked rows (safe: the
    pool treats mask==0 as NEG_INF logits)."""
    n = mesh.shape[axis]
    out = {}
    for k, v in batch.items():
        if not (hasattr(v, "ndim") and v.dtype != object):
            out[k] = v
            continue
        is_bag = k.endswith("_bags") or k == "bags"
        is_mask = k.endswith("_mask") or k == "mask"
        if (is_bag or is_mask) and v.ndim >= 2:
            pad = (-v.shape[1]) % n
            if pad:
                widths = [(0, 0), (0, pad)] + [(0, 0)] * (v.ndim - 2)
                v = np.pad(v, widths)
            spec = P(None, axis, *([None] * (v.ndim - 2)))
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out


def make_dp_bag_mesh(bag_devices: int,
                     n_devices: Optional[int] = None) -> Mesh:
    """2-D ("data", "bag") mesh: batch sharded over the first axis,
    bag instances over the second (DP x SP composition)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % bag_devices:
        raise ValueError(f"{n} devices not divisible by bag_devices="
                         f"{bag_devices}")
    arr = np.array(devices).reshape(n // bag_devices, bag_devices)
    return Mesh(arr, (DATA_AXIS, BAG_AXIS))


def shard_batch_dp_bags(batch: dict, mesh: Mesh) -> dict:
    """Device-put a loader batch onto a ("data", "bag") mesh: bag arrays
    [B, N, ...] sharded over both axes, per-sample arrays [B] over the
    batch axis.  Pads B to a data-axis multiple (valid=0 rows) and N to
    a bag-axis multiple (masked instances)."""
    n_data = mesh.shape[DATA_AXIS]
    n_bag = mesh.shape[BAG_AXIS]
    batch = pad_batch_to_devices(batch, n_data)
    out = {}
    for k, v in batch.items():
        if not (hasattr(v, "ndim") and v.dtype != object):
            out[k] = v
            continue
        is_bag = k.endswith("_bags") or k == "bags"
        is_mask = k.endswith("_mask") or k == "mask"
        if (is_bag or is_mask) and v.ndim >= 2:
            pad = (-v.shape[1]) % n_bag
            if pad:
                widths = [(0, 0), (0, pad)] + [(0, 0)] * (v.ndim - 2)
                v = np.pad(v, widths)
            spec = P(DATA_AXIS, BAG_AXIS, *([None] * (v.ndim - 2)))
        elif v.ndim >= 1:
            spec = P(DATA_AXIS, *([None] * (v.ndim - 1)))
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
