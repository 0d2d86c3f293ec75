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
    target wrt those activations.  Returns CAMs [B, h, w] in [0, 1].

    Matches the pytorch-grad-cam ``GradCAMPlusPlus`` the reference runs
    (gradcam.py:101-105): alpha_ij = g_ij^2 / (2 g_ij^2 +
    (sum_ab A_ab) g_ij^3 + eps), zeroed where g_ij == 0; channel weight
    = sum_ij alpha_ij relu(g_ij); CAM min-max scaled per image."""
    g2 = grads ** 2
    g3 = g2 * grads
    sum_act = jnp.sum(activations, axis=(1, 2), keepdims=True)  # [B,1,1,C]
    denom = 2.0 * g2 + sum_act * g3 + 1e-6
    alpha = jnp.where(grads != 0.0, g2 / denom, 0.0)
    weights = jnp.sum(alpha * jax.nn.relu(grads), axis=(1, 2))  # [B, C]
    cam = jax.nn.relu(jnp.einsum("bc,bhwc->bhw", weights, activations))
    lo = jnp.min(cam, axis=(1, 2), keepdims=True)
    hi = jnp.max(cam, axis=(1, 2), keepdims=True)
    return (cam - lo) / (1e-7 + hi - lo)


def gradcam_for(spatial_fn: Callable, head_fn: Callable,
                images: jax.Array, aug_smooth: bool = False) -> np.ndarray:
    """End-to-end CAM: images -> trunk activations (spatial_fn) -> scalar
    target (head_fn, e.g. attention-weighted risk).  One jit program.

    ``aug_smooth`` replicates pytorch-grad-cam's test-time augmentation
    (ref gradcam.py:105 runs with aug_smooth=True): the CAM is averaged
    over horizontal flip x brightness multiply {0.9, 1, 1.1}, each CAM
    min-max scaled before averaging, flips deaugmented."""

    @jax.jit
    def _run(images):
        act = spatial_fn(images)
        grads = jax.grad(lambda a: jnp.sum(head_fn(a)))(act)
        return gradcam_pp(act, grads)

    if not aug_smooth:
        return np.asarray(_run(images))
    cams = []
    for flip in (False, True):
        x = jnp.flip(images, axis=2) if flip else images
        for factor in (0.9, 1.0, 1.1):
            cam = _run(x * factor)
            if flip:
                cam = jnp.flip(cam, axis=2)
            cams.append(cam)
    return np.asarray(jnp.mean(jnp.stack(cams), axis=0))


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
