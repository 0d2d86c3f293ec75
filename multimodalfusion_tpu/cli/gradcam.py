"""Radiology GradCAM++ CLI — rewrite of ref gradcam.py + utils_ig.py:176:
ResNet50 trunk + radio-AMIL head end-to-end on raw MRI slices; CAMs on
the layer3 activations, weighted by each slice's attention score,
saved as per-slice PNG overlays and a NIfTI CAM volume."""
from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from multimodalfusion_tpu.data.io import ensure_dir
from multimodalfusion_tpu.data.nifti import write_nifti
from multimodalfusion_tpu.data.radiology import (preprocess_glioma_scan,
                                                 preprocess_lung_scan,
                                                 slices_to_rgb)
from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                               load_checkpoint)
from multimodalfusion_tpu.extract.features import _fit_spatial
from multimodalfusion_tpu.interpret.gradcam import (cam_overlay,
                                                    upsample_cams)
from multimodalfusion_tpu.models.resnet import (ResNet50Trunc,
                                                load_torch_checkpoint,
                                                preprocess_images)
from multimodalfusion_tpu.utils.experiment import read_settings


def build_parser():
    p = argparse.ArgumentParser(description="radiology GradCAM++")
    p.add_argument("--scan", type=str, required=True,
                   help="NIfTI path (or DICOM dir for lung)")
    p.add_argument("--ckpt_path", type=str, required=True,
                   help="stage-2 radio AMIL results dir")
    p.add_argument("--which_k", type=int, default=0)
    p.add_argument("--modality", type=str, default="T1")
    p.add_argument("--cancer_type", type=str, default="glioma",
                   choices=["glioma", "lung"])
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--weights", type=str, default=None,
                   help="torch ResNet50 state_dict")
    p.add_argument("--allow_random_weights", action="store_true",
                   default=False,
                   help="proceed with a randomly initialized ResNet50 "
                        "(test/debug only — the CAM volume is noise)")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--top_frac", type=float, default=0.1,
                   help="fraction of top-attention slices to render")
    p.add_argument("--no_aug_smooth", action="store_true", default=False,
                   help="disable the flip x brightness test-time "
                        "augmentation the reference always applies "
                        "(ref gradcam.py:105 aug_smooth=True)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    save_dir = ensure_dir(args.save_dir)
    exp_code = os.path.basename(os.path.normpath(args.ckpt_path))
    settings = read_settings(os.path.join(args.ckpt_path,
                                          f"experiment_{exp_code}.txt"))
    modalities = settings["radio_modality"]

    lung_mask = None
    if args.cancer_type == "lung":
        # lung CAMs are zeroed outside the lung segmentation
        # (ref gradcam.py:124-189 via PreprocessDatasetMask)
        slices, slice_ids, lung_mask = preprocess_lung_scan(
            args.scan, return_mask=True)
    else:
        slices, slice_ids = preprocess_glioma_scan(args.scan)
    if slices.shape[0] == 0:
        print("empty scan")
        return 1
    rgb = _fit_spatial(slices_to_rgb(slices), args.image_size)
    images = jnp.asarray(rgb)

    resnet = ResNet50Trunc()
    if args.weights:
        res_vars = load_torch_checkpoint(args.weights)
    elif args.allow_random_weights:
        import warnings
        warnings.warn(
            "gradcam: no --weights given — the ResNet50 is RANDOMLY "
            "initialized and the CAM volume is noise (test/debug only).",
            stacklevel=1)
        res_vars = resnet.init(jax.random.PRNGKey(0), images[:1])
    else:
        print("error: --weights is required (torch ResNet50 state_dict; "
              "export once with torch.save(torchvision.models.resnet50("
              "weights='IMAGENET1K_V1').state_dict(), 'resnet50.pt')). "
              "Pass --allow_random_weights to override for tests.",
              file=sys.stderr)
        return 2

    cfg = TrainConfig(model_type="radio_attention_mil", mode="radio",
                      modalities=tuple(modalities),
                      n_classes=settings["n_classes"],
                      bag_loss=settings["bag_loss"],
                      radio_fusion=settings.get("radio_fusion") or "concat",
                      gate_radio=settings.get("gate_radio", True),
                      batch_size=1, seed=settings["seed"])
    amil = build_model(cfg)
    n_mod = len(modalities)
    N = images.shape[0]
    bag_template = jnp.zeros((1, N, n_mod * 1024), jnp.float32)
    mask = jnp.ones((1, N), jnp.float32)
    amil_vars = dict(amil.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        bags=bag_template, mask=mask, deterministic=True))
    amil_vars = load_checkpoint(
        os.path.join(args.ckpt_path,
                     f"s_{args.which_k}_minloss_checkpoint.msgpack"),
        amil_vars)
    mod_slot = modalities.index(args.modality) if args.modality in \
        modalities else 0

    # normalize ONCE: the reference's aug_smooth multiplies the already
    # ImageNet-normalized input tensor (pytorch-grad-cam tta.Multiply on
    # input_tensor, ref gradcam.py:105), so the augmentation must land
    # AFTER preprocessing, i.e. spatial_fn must not renormalize
    x_norm = jax.jit(
        lambda im: preprocess_images(im, center_crop=args.image_size))(
            images)

    def spatial_fn(xn):
        return resnet.apply(res_vars, xn, return_spatial=True)

    def head_fn(act):
        emb = jnp.mean(act, axis=(1, 2))              # [N, 1024]
        bag = jnp.zeros((1, N, n_mod * 1024), emb.dtype)
        bag = jax.lax.dynamic_update_slice(
            bag, emb[None], (0, 0, mod_slot * 1024))
        out = amil.apply(amil_vars, bags=bag, mask=mask,
                         deterministic=True)
        return out["risk"]

    # aug_smooth mirrors the reference's GradCAMPlusPlus invocation
    # (ref gradcam.py:105: aug_smooth=True).  The extra unaugmented
    # spatial pass for the attention scores is 1 of 7 total passes with
    # aug_smooth on — not worth complicating gradcam_for's API over.
    from multimodalfusion_tpu.interpret.gradcam import gradcam_for
    cams = gradcam_for(spatial_fn, head_fn, x_norm,
                       aug_smooth=not args.no_aug_smooth)

    @jax.jit
    def attn_scores(xn):
        act = spatial_fn(xn)
        emb = jnp.mean(act, axis=(1, 2))
        bag = jnp.zeros((1, N, n_mod * 1024), emb.dtype)
        bag = jax.lax.dynamic_update_slice(bag, emb[None],
                                           (0, 0, mod_slot * 1024))
        return amil.apply(amil_vars, bags=bag, mask=mask,
                          deterministic=True, attention_only=True)[0]

    scores = attn_scores(x_norm)
    cams = np.asarray(cams)
    scores = np.asarray(scores)
    attn = np.exp(scores - scores.max())
    attn = attn / attn.sum()
    weighted = cams * (attn / max(attn.max(), 1e-12))[:, None, None]

    ups = upsample_cams(weighted, slices.shape[1:3])
    if lung_mask is not None:
        # zero outside the lungs, then smooth the hard mask edge
        # (ref gradcam.py: mask-zeroed + gaussian-blurred CAM)
        ups = np.asarray([cv2.GaussianBlur(c * m.astype(np.float32),
                                           (11, 11), 0)
                          for c, m in zip(np.asarray(ups), lung_mask)])
    write_nifti(os.path.join(save_dir, "cam_volume.nii.gz"),
                ups.astype(np.float32))
    n_top = max(int(np.ceil(len(scores) * args.top_frac)), 1)
    top = np.argsort(-scores)[:n_top]
    for i in top:
        overlay = cam_overlay(slices[i], ups[i])
        cv2.imwrite(os.path.join(
            save_dir, f"slice{int(slice_ids[i])}_a{scores[i]:.3f}.png"),
            cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
    print(f"wrote {n_top} overlays + cam_volume.nii.gz -> {save_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
