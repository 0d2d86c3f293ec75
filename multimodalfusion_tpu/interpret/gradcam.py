"""GradCAM++ on the ResNet trunk via jax.grad — replaces the reference's
pytorch-grad-cam dependency (ref gradcam.py:64,101-105: GradCAMPlusPlus
on resnet50.layer3[-1], CAM weighted by the AMIL attention score and
blurred into per-slice overlays)."""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def gradcam_pp(activations: jax.Array, grads: jax.Array) -> jax.Array:
    """GradCAM++ from layer activations [B, h, w, C] and gradients of the
    target wrt those activations.  Returns CAMs [B, h, w] in [0, 1]."""
    g2 = grads ** 2
    g3 = g2 * grads
    denom = 2.0 * g2 + jnp.sum(activations * g3, axis=(1, 2), keepdims=True)
    alpha = jnp.where(jnp.abs(denom) > 1e-12, g2 / denom, 0.0)
    weights = jnp.sum(alpha * jax.nn.relu(grads), axis=(1, 2))  # [B, C]
    cam = jax.nn.relu(jnp.einsum("bc,bhwc->bhw", weights, activations))
    peak = jnp.max(cam, axis=(1, 2), keepdims=True)
    return cam / jnp.maximum(peak, 1e-12)


def gradcam_for(spatial_fn: Callable, head_fn: Callable,
                images: jax.Array) -> np.ndarray:
    """End-to-end CAM: images -> trunk activations (spatial_fn) -> scalar
    target (head_fn, e.g. attention-weighted risk).  One jit program."""

    @jax.jit
    def _run(images):
        act = spatial_fn(images)
        grads = jax.grad(lambda a: jnp.sum(head_fn(a)))(act)
        return gradcam_pp(act, grads)

    return np.asarray(_run(images))


def upsample_cams(cams: np.ndarray, size) -> np.ndarray:
    """Bilinear-resize CAMs to the original slice size (host, cv2)."""
    import cv2
    out = np.stack([cv2.resize(c.astype(np.float32), (size[1], size[0]))
                    for c in cams])
    return out


def cam_overlay(image_gray: np.ndarray, cam: np.ndarray,
                mask: np.ndarray = None, blur: int = 11,
                alpha: float = 0.5) -> np.ndarray:
    """Blend a CAM over a grayscale slice (ref gradcam.py:124-189:
    attention x CAM product, mask-zeroed, gaussian blurred)."""
    import cv2
    from matplotlib import cm
    cam = cam.astype(np.float32)
    if mask is not None:
        cam = cam * (mask > 0)
    if blur:
        cam = cv2.GaussianBlur(cam, (blur, blur), 0)
        cam = cam / max(cam.max(), 1e-12)
    heat = (cm.jet(cam)[..., :3] * 255).astype(np.uint8)
    base = np.repeat((np.clip(image_gray, 0, 1) * 255)
                     .astype(np.uint8)[..., None], 3, axis=-1)
    return cv2.addWeighted(base, 1 - alpha, heat, alpha, 0)
