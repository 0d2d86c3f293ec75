"""On-disk artifact IO — keeps the reference's file formats so existing
feature stores work unchanged.

Formats:
  * feature h5: datasets ``features`` [N, D] float32 and ``slice_index``
    [N] (ref feature_extraction.py:57-61, appendable schema
    ref utils/wsi_utils.py:84-121)
  * coords h5: dataset ``coords`` [N, 2] with patch metadata attrs
    (ref WholeSlideImage.py:541-549)
  * ``.pt`` bags: torch-serialized float tensors (ref torch.save usage,
    feature_extraction.py:149-156); torch-cpu is used purely as a codec.
  * ``.pkl`` results (ref utils/file_utils.py:22-33)
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import h5py
import numpy as np


def save_hdf5(output_path: str, asset_dict: Dict[str, np.ndarray],
              attr_dict: Optional[dict] = None, mode: str = "a") -> str:
    """Append-or-create h5 writer (ref wsi_utils.py:84-121 semantics:
    first write creates chunked resizable datasets, later writes append
    along axis 0)."""
    with h5py.File(output_path, mode) as f:
        for key, val in asset_dict.items():
            val = np.asarray(val)
            if key not in f:
                maxshape = (None,) + val.shape[1:]
                dset = f.create_dataset(key, shape=val.shape,
                                        maxshape=maxshape, dtype=val.dtype,
                                        chunks=(1,) + val.shape[1:])
                dset[:] = val
                if attr_dict and key in attr_dict:
                    dset.attrs.update(attr_dict[key])
            else:
                dset = f[key]
                n = dset.shape[0]
                dset.resize(n + val.shape[0], axis=0)
                dset[n:] = val
    return output_path


def load_features_h5(path: str):
    """Read a radiology/pathology feature h5 -> (features, slice_index)."""
    with h5py.File(path, "r") as f:
        features = f["features"][:]
        slice_index = f["slice_index"][:] if "slice_index" in f else None
    return features, slice_index


def save_pt(path: str, array: np.ndarray) -> None:
    """Write a torch-format tensor file (interop with reference
    artifacts)."""
    import torch
    torch.save(torch.from_numpy(np.array(array, copy=True)), path)


def load_pt(path: str) -> np.ndarray:
    """Read a torch-format tensor file into numpy (cpu)."""
    import torch
    t = torch.load(path, map_location="cpu", weights_only=True)
    return np.asarray(t.detach().numpy())


def save_pkl(filename: str, obj) -> None:
    with open(filename, "wb") as f:
        pickle.dump(obj, f)


def load_pkl(filename: str):
    with open(filename, "rb") as f:
        return pickle.load(f)


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
