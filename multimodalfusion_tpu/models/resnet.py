"""Truncated ResNet50 feature extractor (Flax linen, NHWC).

TPU-native equivalent of ref models/resnet_custom.py:57-119
(``ResNet_Baseline``/``resnet50_baseline``): torchvision ResNet50 cut
after layer3 with adaptive average pooling -> 1024-d embeddings for WSI
patches and radiology slices.

Weights: ``port_torch_state_dict`` converts a torchvision-format
state_dict (the artifact the reference downloads via model_zoo,
ref resnet_custom.py:121-126) into flax variables — conv kernels
OIHW -> HWIO, batch-norm params + running stats.  Without a weights
file the model initializes randomly (useful for tests/benchmarks; real
extraction should load ported ImageNet weights for parity).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

he_normal = jax.nn.initializers.variance_scaling(2.0, "fan_out",
                                                 "truncated_normal")

STAGE_SIZES = (3, 4, 6)          # layer1..layer3 (layer4 dropped)
STAGE_WIDTHS = (64, 128, 256)    # bottleneck 3x3 widths
EXPANSION = 4
FEATURE_DIM = STAGE_WIDTHS[-1] * EXPANSION  # 1024


class Bottleneck(nn.Module):
    width: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, kernel_init=he_normal,
            name=name)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        y = nn.relu(bn("bn1")(conv(self.width, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.width, 3, self.strides,
                                   "conv2")(y)))
        y = bn("bn3")(conv(self.width * EXPANSION, 1, 1, "conv3")(y))
        if self.downsample:
            residual = bn("downsample_bn")(
                conv(self.width * EXPANSION, 1, self.strides,
                     "downsample_conv")(x))
        return nn.relu(y + residual)


class _Stem(nn.Module):
    """conv1: 7x7 stride-2 on 3-channel input, params in the canonical
    torchvision shape [7, 7, 3, 64].

    With ``s2d=True`` the SAME weights run as an equivalent 4x4
    stride-1 conv on a space-to-depth input ([B, H/2, W/2, 12]): the
    MLPerf-ResNet TPU trick.  A 3-channel 7x7 conv feeds the MXU's
    128-wide contraction with only 7*3=21 useful lanes; packing the
    2x2 pixel blocks into channels quadruples the contraction depth
    (4*4*12=192 taps) and halves the spatial extent.  The kernel is
    zero-padded 7->8 on the top/left then regrouped, so outputs are
    bit-identical in exact arithmetic (tested to fp tolerance).
    """
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", he_normal, (7, 7, 3, 64),
                            jnp.float32)
        B, H, W, C = x.shape
        if not (self.s2d and H % 2 == 0 and W % 2 == 0):
            return jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # pad taps 7->8 at the front: row offset p-3 becomes
        # 2*(cell m - 2) + r with p+1 = 2m + r, m in 0..3, r in 0..1
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kp = kp.reshape(4, 2, 4, 2, C, 64).transpose(0, 2, 1, 3, 4, 5)
        kp = kp.reshape(4, 4, 4 * C, 64)  # channel order (r, s, c)
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2,
                                                    4 * C)
        # output i reads cells i-2..i+1 -> asymmetric (2, 1) padding
        return jax.lax.conv_general_dilated(
            xs, kp.astype(self.dtype), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet50Trunc(nn.Module):
    """images NHWC float [B, H, W, 3] -> embeddings [B, 1024]."""
    dtype: Any = jnp.float32
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_spatial: bool = False):
        x = x.astype(self.dtype)
        x = _Stem(dtype=self.dtype, s2d=self.s2d_stem, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (n_blocks, width) in enumerate(
                zip(STAGE_SIZES, STAGE_WIDTHS), start=1):
            for i in range(n_blocks):
                strides = 2 if (i == 0 and stage > 1) else 1
                downsample = (i == 0)
                x = Bottleneck(width=width, strides=strides,
                               downsample=downsample, dtype=self.dtype,
                               name=f"layer{stage}_{i}")(x, train)
        if return_spatial:
            # layer3 output [B, h, w, 1024] — the GradCAM target layer
            # (ref gradcam.py:64 uses resnet50.layer3[-1])
            return x.astype(jnp.float32)
        # adaptive average pool to 1x1 (ref resnet_custom.py:100-106)
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# torchvision state_dict porting
# ---------------------------------------------------------------------------

def _conv_kernel(w) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def port_torch_state_dict(state_dict: Dict[str, Any]):
    """Convert a torchvision ResNet50 state_dict (tensors or ndarrays)
    into {'params': ..., 'batch_stats': ...} for ResNet50Trunc.

    Only conv1/bn1/layer1-3 keys are consumed (layer4/fc ignored —
    mirrors the reference's strict=False truncated load,
    ref resnet_custom.py:117-126).
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().numpy()
                        if hasattr(v, "numpy") else v)
          for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def port_bn(flax_mod: Sequence[str], torch_prefix: str):
        put(params, list(flax_mod) + ["scale"], sd[f"{torch_prefix}.weight"])
        put(params, list(flax_mod) + ["bias"], sd[f"{torch_prefix}.bias"])
        put(stats, list(flax_mod) + ["mean"],
            sd[f"{torch_prefix}.running_mean"])
        put(stats, list(flax_mod) + ["var"],
            sd[f"{torch_prefix}.running_var"])

    put(params, ["conv1", "kernel"], _conv_kernel(sd["conv1.weight"]))
    port_bn(["bn1"], "bn1")
    for stage, n_blocks in enumerate(STAGE_SIZES, start=1):
        for i in range(n_blocks):
            t = f"layer{stage}.{i}"
            f = f"layer{stage}_{i}"
            for c in (1, 2, 3):
                put(params, [f, f"conv{c}", "kernel"],
                    _conv_kernel(sd[f"{t}.conv{c}.weight"]))
                port_bn([f, f"bn{c}"], f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in sd:
                put(params, [f, "downsample_conv", "kernel"],
                    _conv_kernel(sd[f"{t}.downsample.0.weight"]))
                port_bn([f, "downsample_bn"], f"{t}.downsample.1")
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats)}


def load_torch_checkpoint(path: str):
    """Load a torch-serialized ResNet50 state_dict file and port it."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return port_torch_state_dict(sd)


# ImageNet preprocessing constants (ref feature_extraction.py:103-108)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_images(images, center_crop: int = 224):
    """uint8/float NHWC [B, H, W, 3] -> normalized float32, center-cropped
    (torchvision CenterCrop(224) + Normalize, ref
    feature_extraction.py:103-108).  Runs under jit on device."""
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    H, W = x.shape[1], x.shape[2]
    if center_crop and (H != center_crop or W != center_crop):
        top = max((H - center_crop) // 2, 0)
        left = max((W - center_crop) // 2, 0)
        x = jax.lax.dynamic_slice_in_dim(x, top, min(center_crop, H), 1)
        x = jax.lax.dynamic_slice_in_dim(x, left, min(center_crop, W), 2)
    return (x - IMAGENET_MEAN) / IMAGENET_STD
