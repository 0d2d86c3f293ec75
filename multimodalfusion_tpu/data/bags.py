"""Padded/bucketed batching of variable-length MIL bags.

The reference concatenates ragged bags and forces batch_size=1
(ref utils/utils.py:35-46, README.md:95).  For a static-shape compiler we
pad each batch of bags to a shared bucketed length and carry a mask; the
bucket ladder keeps the number of distinct jit signatures small.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

# bucket ladder for bag lengths: 128 … 65536 by powers of two
_BUCKETS = [128 * (2 ** k) for k in range(10)]


def bucket_len(n: int) -> int:
    """Smallest bucket >= n (>= 128 so TPU lanes stay aligned)."""
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + _BUCKETS[-1] - 1) // _BUCKETS[-1]) * _BUCKETS[-1]


def pad_bags(bags: Sequence[Optional[np.ndarray]], feat_dim: int,
             dtype=np.float32, reuse_buffers: bool = False
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Stack a list of [n_i, D] bags (None = missing modality -> all-pad)
    into (padded [B, N_bucket, D], mask [B, N_bucket]).

    Uses the threaded C++ collation (native/bagio.cpp) when available
    and falls back to numpy.
    """
    n_max = max([b.shape[0] for b in bags if b is not None], default=1)
    n_pad = bucket_len(n_max)
    B = len(bags)
    if dtype == np.float32:
        from multimodalfusion_tpu import native
        res = native.pad_bags_native(list(bags), n_pad, feat_dim,
                                     reuse_buffers=reuse_buffers)
        if res is not None:
            return res
    out = np.zeros((B, n_pad, feat_dim), dtype=dtype)
    mask = np.zeros((B, n_pad), dtype=np.float32)
    for i, b in enumerate(bags):
        if b is None or b.shape[0] == 0:
            continue
        n = b.shape[0]
        out[i, :n] = b
        mask[i, :n] = 1.0
    return out, mask


def intersect_slices(features: List[np.ndarray],
                     slice_ids: List[np.ndarray],
                     return_ids: bool = False):
    """Align multi-sequence radiology bags on their common slice ids and
    concatenate along the feature axis (ref dataset_survival.py:346-348).

    Row i of the result is slice ``sorted(common)[i]`` for EVERY modality
    — id-exact alignment.  The reference's boolean-mask indexing silently
    misaligns rows when modalities store their slices in different orders;
    here each modality is reindexed to the shared sorted id order instead.
    Duplicate ids within a modality are an error (the mask recipe would
    pair them with arbitrary rows of the other modalities).

    Returns [N_common, sum(D_m)], plus the sorted common ids when
    ``return_ids`` is set.
    """
    for s in slice_ids:
        if len(np.unique(s)) != len(s):
            raise ValueError(
                "duplicate slice ids within a modality: "
                f"{np.asarray(s).tolist()}")
    common = set(np.asarray(slice_ids[0]).tolist())
    for s in slice_ids[1:]:
        common &= set(np.asarray(s).tolist())
    common_sorted = np.array(sorted(common))
    aligned = []
    for f, s in zip(features, slice_ids):
        pos = {v: i for i, v in enumerate(np.asarray(s).tolist())}
        order = np.array([pos[v] for v in common_sorted.tolist()],
                         dtype=np.intp)
        aligned.append(np.asarray(f)[order])
    out = np.concatenate(aligned, axis=1)
    if return_ids:
        return out, common_sorted
    return out
