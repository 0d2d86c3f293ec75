"""Batched TPU feature embedding for WSI patches and radiology slices.

Replaces the reference's DataParallel ResNet50 inference loop
(ref feature_extraction.py:25-62, 93-108) with a jit-compiled
preprocess+embed step on fixed-shape padded batches; multi-chip runs
shard the batch axis over a data-parallel mesh (params replicated).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfusion_tpu.models.resnet import (ResNet50Trunc,
                                                load_torch_checkpoint,
                                                preprocess_images)


class Embedder:
    """images (uint8/float NHWC) -> 1024-d embeddings, padded/batched."""

    def __init__(self, weights_path: Optional[str] = None,
                 variables=None, batch_size: int = 128,
                 dtype=jnp.bfloat16, image_size: int = 224,
                 mesh=None, allow_random: bool = False,
                 s2d_stem: bool = True):
        # space-to-depth stem by default: same weights, same outputs
        # (to fp tolerance), better MXU utilization on the 3-channel
        # 7x7 conv (see models/resnet.py::_Stem)
        self.model = ResNet50Trunc(dtype=dtype, s2d_stem=s2d_stem)
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        self.batch_size = batch_size
        self.image_size = image_size
        self.mesh = mesh
        if variables is not None:
            self.variables = variables
        elif weights_path is not None:
            self.variables = load_torch_checkpoint(weights_path)
        elif allow_random:
            import warnings
            warnings.warn(
                "Embedder: no weights given — using a RANDOMLY initialized "
                "ResNet50. Embeddings are meaningless outside tests; pass a "
                "torchvision resnet50 state_dict (torch.save(torchvision."
                "models.resnet50(weights='IMAGENET1K_V1').state_dict(), "
                "'resnet50.pt')).", stacklevel=2)
            self.variables = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, image_size, image_size, 3), jnp.float32))
        else:
            raise ValueError(
                "Embedder needs ResNet50 weights (weights_path= or "
                "variables=). Export them once with torch: "
                "torch.save(torchvision.models.resnet50("
                "weights='IMAGENET1K_V1').state_dict(), 'resnet50.pt'). "
                "Pass allow_random=True only for tests.")

        @jax.jit
        def _embed(variables, images):
            x = preprocess_images(images, center_crop=self.image_size)
            return self.model.apply(variables, x)

        self._embed = _embed
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._batch_sharding = NamedSharding(
                mesh, P(mesh.axis_names[0], None, None, None))
            self._repl = NamedSharding(mesh, P())
            self.variables = jax.device_put(self.variables, self._repl)

    def _pad_to_batch(self, images: np.ndarray) -> np.ndarray:
        n = images.shape[0]
        if n == self.batch_size:
            return images
        pad = self.batch_size - n
        return np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)])

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        """Any number of NHWC images -> [N, 1024] float32 features.

        Double-buffered: chunk k+1 is dispatched before chunk k's
        features are read back, so the host transfer + readback of one
        chunk overlaps the device compute of the next (jax dispatch is
        async; np.asarray is the only blocking point).
        """
        if images.shape[0] == 0:
            return np.zeros((0, 1024), np.float32)
        # resize short batches up to the fixed signature to avoid retraces
        outs = []
        pending = None  # (device feats, valid row count)
        for start in range(0, images.shape[0], self.batch_size):
            chunk = images[start:start + self.batch_size]
            n = chunk.shape[0]
            padded = self._pad_to_batch(chunk)
            if self.mesh is not None:
                padded = jax.device_put(padded, self._batch_sharding)
            feats = self._embed(self.variables, padded)
            if pending is not None:
                outs.append(np.asarray(pending[0][:pending[1]],
                                       np.float32))
            pending = (feats, n)
        outs.append(np.asarray(pending[0][:pending[1]], np.float32))
        return np.concatenate(outs, axis=0)

    def embed_slices(self, slices: np.ndarray) -> np.ndarray:
        """[N, H, W] grayscale in [0,1] -> [N, 1024]; resizes/pads the
        spatial dims to the model's input size on host (cheap vs the
        conv stack)."""
        from multimodalfusion_tpu.data.radiology import slices_to_rgb
        if slices.shape[0] == 0:
            return np.zeros((0, 1024), np.float32)
        rgb = slices_to_rgb(slices.astype(np.float32))
        rgb = _fit_spatial(rgb, self.image_size)
        return self.embed_images(rgb)


def _fit_spatial(images: np.ndarray, size: int) -> np.ndarray:
    """Center-crop-or-pad NHWC images to (size, size) — reference uses
    torchvision CenterCrop(224), which zero-pads smaller images
    (ref feature_extraction.py:103-108)."""
    n, h, w, c = images.shape
    out = np.zeros((n, size, size, c), images.dtype)
    # crop
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    crop = images[:, top:top + size, left:left + size, :]
    ch, cw = crop.shape[1], crop.shape[2]
    # pad (centered)
    pt = (size - ch) // 2
    pl = (size - cw) // 2
    out[:, pt:pt + ch, pl:pl + cw, :] = crop
    return out
