"""Host-side batch iterators producing fixed-shape (bucketed) numpy
batches ready for jit — the TPU-native replacement for the reference's
torch DataLoader + ragged collate (ref utils/utils.py:35-141).

Batches are dicts of numpy arrays with static shapes per (batch_size,
bag-bucket) pair; partial batches are padded and masked via ``valid``.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from multimodalfusion_tpu.data.bags import pad_bags
from multimodalfusion_tpu.data.survival_dataset import Sample, Split

# per-instance feature width of stage-1 extraction (truncated ResNet50,
# models/resnet.py); radiology bags concatenate one block per modality.
# The single point of truth for bag shapes — utils/model_export.py
# traces serving artifacts against it.
FEAT_DIM = 1024


def usable_indices(split: Split) -> List[int]:
    """Reference train/val loops skip samples missing any modality required
    by the mode (ref core_utils.py:185-192) — pre-filter them here.
    For pretrained stage, everything is usable (zeros embedding)."""
    ds = split.ds
    if ds.pretrained:
        return list(range(len(split)))
    idx = []
    for i in range(len(split)):
        present = split.probe_present(i)
        ok = all(present.get(m, False)
                 for m in ("radio", "path", "omic") if m in ds.mode)
        if ok:
            idx.append(i)
    return idx


def _batch_from_samples(samples: List[Sample], mode: str, pretrained: bool,
                        batch_size: int, n_radio_feat: int,
                        n_path_feat: int = FEAT_DIM,
                        reuse_buffers: bool = True
                        ) -> Dict[str, np.ndarray]:
    B = batch_size
    n = len(samples)
    batch: Dict[str, np.ndarray] = {
        "Y": np.zeros(B, np.int32),
        "t": np.zeros(B, np.float32),
        "c": np.zeros(B, np.float32),
        "valid": np.zeros(B, np.float32),
    }
    for i, s in enumerate(samples):
        batch["Y"][i] = s.disc_label
        batch["t"][i] = s.event_time
        batch["c"][i] = s.censorship
        batch["valid"][i] = 1.0
    batch["subject_ids"] = np.array(
        [s.subject_id for s in samples] + [""] * (B - n), dtype=object)

    if pretrained:
        for key, attr in (("h_radio", "h_radio"), ("h_path", "h_path"),
                          ("h_omic", "h_omic")):
            arr = np.zeros((B, 256), np.float32)
            for i, s in enumerate(samples):
                v = getattr(s, attr)
                if v is not None:
                    arr[i] = v
            # partial batches stay zero-padded: MaskedBatchNorm computes
            # batch statistics over `valid` rows only, matching the
            # reference's genuinely smaller ragged final torch batch
            batch[key] = arr
        return batch

    if "radio" in mode:
        bags = [s.radio for s in samples] + [None] * (B - n)
        # reuse-mode is safe: the engine device-puts each batch before the
        # loader builds the next one
        batch["radio_bags"], batch["radio_mask"] = pad_bags(
            bags, n_radio_feat, reuse_buffers=reuse_buffers)
    if "path" in mode:
        bags = [s.path for s in samples] + [None] * (B - n)
        batch["path_bags"], batch["path_mask"] = pad_bags(
            bags, n_path_feat, reuse_buffers=reuse_buffers)
    if "omic" in mode:
        G = next((s.omic.shape[0] for s in samples if s.omic is not None), 1)
        arr = np.zeros((B, G), np.float32)
        for i, s in enumerate(samples):
            if s.omic is not None:
                arr[i] = s.omic
        batch["genomic"] = arr
    return batch


def iter_batches(split: Split, batch_size: int = 1, shuffle: bool = False,
                 weighted: bool = False, seed: int = 0,
                 indices: Optional[List[int]] = None,
                 drop_last: bool = False,
                 reuse_collation_buffers: bool = True
                 ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield fixed-shape batches.  ``weighted`` replicates the reference's
    WeightedRandomSampler over (bin, censorship) classes
    (ref utils/utils.py:116-117)."""
    ds = split.ds
    if indices is None:
        indices = usable_indices(split)
    if not indices:
        return
    rng = np.random.default_rng(seed)
    order = list(indices)
    if weighted:
        w = split.class_weights()[indices]
        order = list(rng.choice(indices, size=len(indices), replace=True,
                                p=w / w.sum()))
    elif shuffle:
        rng.shuffle(order)

    n_radio_feat = len(ds.modalities) * FEAT_DIM
    warned = False
    for start in range(0, len(order), batch_size):
        chunk = order[start:start + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        samples = [split.get_sample(i) for i in chunk]
        if not ds.pretrained:
            # usable_indices pre-filters by file EXISTENCE only
            # (probe_present); a file that exists but fails to load
            # (truncated pt, corrupt h5) surfaces here — drop the sample
            # instead of collating a zero bag with valid=1
            kept = [s for s in samples
                    if all(s.present.get(m, False)
                           for m in ("radio", "path", "omic")
                           if m in ds.mode)]
            if len(kept) < len(samples) and not warned:
                kept_ids = {id(s) for s in kept}
                bad = [s.subject_id for s in samples
                       if id(s) not in kept_ids]
                print(f"WARNING: dropping samples with unloadable "
                      f"modalities (corrupt files?): {bad[:5]}...")
                warned = True
            samples = kept
            if not samples:
                continue
        yield _batch_from_samples(samples, ds.mode, ds.pretrained,
                                  batch_size, n_radio_feat,
                                  reuse_buffers=reuse_collation_buffers)


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch: overlap host-side batch assembly (file
    IO + collation) with device compute.  The reference relies on torch
    DataLoader workers for this (ref utils/utils.py:112); here a single
    daemon thread feeds a bounded queue.

    NOTE: pass ``reuse_collation_buffers=False`` to iter_batches when
    wrapping it here — the worker thread collates batch n+1 into the
    pooled buffer while the consumer may still hold batch n.
    """
    import queue
    import threading
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded-blocking put so an abandoned consumer (exception in the
        # training loop, generator GC'd mid-epoch) cannot leave the
        # worker pinned on a full queue holding collated batches forever
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:  # surface loader errors to consumer
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
