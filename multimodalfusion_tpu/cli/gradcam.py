"""Radiology GradCAM++ CLI — rewrite of ref gradcam.py + utils_ig.py:176:
ResNet50 trunk + radio-AMIL head end-to-end on raw MRI/CT slices; CAMs
on the layer3 activations, weighted by each slice's attention score,
saved as per-slice PNG overlays and NIfTI CAM volumes.

Two driving modes:

* single scan (``--scan``): CAM one volume for one modality — the
  verified-as-run unit (tools/parity_attributions.py matched the
  reference's grad_cam_radio to corr 1.000000 on this path);
* cohort (``--csv_path``, ref gradcam.py:30-70): loop a scan-list CSV
  (subject_id + one path column per modality, like the heatmap radio
  branch's scan_list), select slices by the attention scores the
  heatmap CLI wrote (``--scores_csv``), and render every modality —
  per-slice overlays under ``{subject}/ig_heatmap/`` (default) or, with
  ``--all_slices`` (ref :85-189), full attention-weighted, blurred,
  cross-modality-normalized CAM volumes as ``{subject}_{mod}_attr
  .nii.gz`` + ``_orig.nii.gz``, side-by-side PNGs under
  ``ig_heatmap_all/{mod}/`` and a ``heatmap.pkl`` of the raw CAMs.

Deliberate deviation: the reference hardcodes ``selected=['sfb11',
'sfb47']`` (gradcam.py:57) so only two subjects ever render; here every
subject in the CSV runs unless ``--subject`` restricts it.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import cv2
import numpy as np
import pandas as pd

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
                                                    gradcam_for,
                                                    upsample_cams)
from multimodalfusion_tpu.models.resnet import (ResNet50Trunc,
                                                load_torch_checkpoint,
                                                preprocess_images)
from multimodalfusion_tpu.utils.experiment import read_settings


def build_parser():
    p = argparse.ArgumentParser(description="radiology GradCAM++")
    p.add_argument("--scan", type=str, default=None,
                   help="NIfTI path (or DICOM dir for lung) — single-scan "
                        "mode; mutually exclusive with --csv_path")
    p.add_argument("--ckpt_path", type=str, required=True,
                   help="stage-2 radio AMIL results dir")
    p.add_argument("--which_k", type=int, default=0)
    p.add_argument("--modality", type=str, default="T1",
                   help="single-scan mode: which bag slot the scan fills")
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
                   help="single-scan mode: fraction of top-attention "
                        "slices to render")
    p.add_argument("--no_aug_smooth", action="store_true", default=False,
                   help="disable the flip x brightness test-time "
                        "augmentation the reference always applies "
                        "(ref gradcam.py:105 aug_smooth=True)")
    # ---- cohort mode (ref gradcam.py:30-70) ----
    p.add_argument("--csv_path", type=str, default=None,
                   help="cohort scan list: subject_id + one scan-path "
                        "column per modality (ref gradcam.py:31)")
    p.add_argument("--radio_dir", type=str, default="",
                   help="base dir the CSV's scan paths are relative to "
                        "(ref gradcam.py:30)")
    p.add_argument("--scores_csv", type=str, default=None,
                   help="scores.csv from the heatmap radio branch "
                        "(subject_id, slice_index, attention): slice "
                        "selection + attention weights (the reference "
                        "reads patches_dir/{subject}/scores.csv, "
                        "gradcam.py:83); without it each subject's "
                        "attention is recomputed from the rendered "
                        "modality's own slices")
    p.add_argument("--subject", type=str, default=None,
                   help="restrict the cohort to one subject "
                        "(ref gradcam.py:37)")
    p.add_argument("--top", type=int, default=20,
                   help="cohort mode: top-attention slices to render "
                        "(ref gradcam.py:36,87)")
    p.add_argument("--all_slices", action="store_true", default=False,
                   help="cohort mode: render full attention-weighted CAM "
                        "volumes instead of top slices "
                        "(ref gradcam.py:38,125-189)")
    p.add_argument("--segment", action="store_true", default=False,
                   help="lung segmentation-masked preprocessing (ref "
                        "gradcam.py:35; implied by --cancer_type lung)")
    p.add_argument("--modalities", type=str, default=None,
                   help="comma list of modality columns to render "
                        "(default: the checkpoint's radio_modality; "
                        "ref gradcam.py:34)")
    p.add_argument("--overwrite", action="store_true", default=False,
                   help="re-render subjects whose output dir exists "
                        "(ref gradcam.py:39,75)")
    return p


def _load_resnet(args, example_images):
    resnet = ResNet50Trunc()
    if args.weights:
        if not os.path.isfile(args.weights):
            print(f"error: --weights {args.weights!r} does not exist",
                  file=sys.stderr)
            return resnet, None
        return resnet, load_torch_checkpoint(args.weights)
    if args.allow_random_weights:
        import warnings
        warnings.warn(
            "gradcam: no --weights given — the ResNet50 is RANDOMLY "
            "initialized and the CAM volume is noise (test/debug only).",
            stacklevel=1)
        return resnet, resnet.init(jax.random.PRNGKey(0),
                                   example_images[:1])
    print("error: --weights is required (torch ResNet50 state_dict; "
          "export once with torch.save(torchvision.models.resnet50("
          "weights='IMAGENET1K_V1').state_dict(), 'resnet50.pt')). "
          "Pass --allow_random_weights to override for tests.",
          file=sys.stderr)
    return resnet, None


def _load_amil(args, settings, modalities):
    """Radio-AMIL head from the stage-2 results dir.  Parameters are
    bag-length independent: init once with a dummy bag, apply at any N."""
    cfg = TrainConfig(model_type="radio_attention_mil", mode="radio",
                      modalities=tuple(modalities),
                      n_classes=settings["n_classes"],
                      bag_loss=settings["bag_loss"],
                      radio_fusion=settings.get("radio_fusion") or "concat",
                      gate_radio=settings.get("gate_radio", True),
                      batch_size=1, seed=settings["seed"])
    amil = build_model(cfg)
    n_mod = len(modalities)
    bag_template = jnp.zeros((1, 16, n_mod * 1024), jnp.float32)
    amil_vars = dict(amil.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        bags=bag_template, mask=jnp.ones((1, 16), jnp.float32),
        deterministic=True))
    amil_vars = load_checkpoint(
        os.path.join(args.ckpt_path,
                     f"s_{args.which_k}_minloss_checkpoint.msgpack"),
        amil_vars)
    return amil, amil_vars


def _scan_cams(resnet, res_vars, amil, amil_vars, n_mod, mod_slot,
               x_norm, aug_smooth):
    """CAMs [N, h, w] + attention scores [N] for one preprocessed,
    ImageNet-normalized scan filling bag slot ``mod_slot``."""
    N = x_norm.shape[0]

    def spatial_fn(xn):
        return resnet.apply(res_vars, xn, return_spatial=True)

    def _bag(act):
        emb = jnp.mean(act, axis=(1, 2))              # [N, 1024]
        bag = jnp.zeros((1, N, n_mod * 1024), emb.dtype)
        return jax.lax.dynamic_update_slice(
            bag, emb[None], (0, 0, mod_slot * 1024))

    mask = jnp.ones((1, N), jnp.float32)

    def head_fn(act):
        out = amil.apply(amil_vars, bags=_bag(act), mask=mask,
                         deterministic=True)
        return out["risk"]

    cams = gradcam_for(spatial_fn, head_fn, x_norm, aug_smooth=aug_smooth)

    @jax.jit
    def attn_scores(xn):
        return amil.apply(amil_vars, bags=_bag(spatial_fn(xn)), mask=mask,
                          deterministic=True, attention_only=True)[0]

    return np.asarray(cams), np.asarray(attn_scores(x_norm))


class CamRunner:
    """Compile-once CAM program for cohort driving.

    ``_scan_cams`` builds fresh closures per scan, so every
    subject x modality re-traces (and every distinct slice count
    recompiles) — across a real cohort the compiles dominate chip time.
    This runner jits ONE program with the modality slot as a traced
    scalar and pads the slice axis to a bucket (mask-excluded from the
    attention softmax), so the whole cohort compiles once per
    (bucket, aug-variant) pair.  Buckets ride a power-of-two ladder
    (like data/bags.py) rather than a fixed multiple: scan lengths of
    91/120/156/300 land in just 3 buckets (128, 256, 512) instead of
    compiling one program per distinct 16-multiple.  CAM/score
    equality with the verified-as-run ``_scan_cams`` path is pinned in
    tests/test_gradcam_cli.py."""

    BUCKET_MIN = 16

    @classmethod
    def bucket_len(cls, n: int) -> int:
        b = cls.BUCKET_MIN
        while b < n:
            b *= 2
        return b

    def __init__(self, resnet, res_vars, amil, amil_vars, n_mod,
                 aug_smooth: bool):
        self.aug = aug_smooth

        def spatial_fn(xn):
            return resnet.apply(res_vars, xn, return_spatial=True)

        def _bag(act, slot):
            emb = jnp.mean(act, axis=(1, 2))
            Np = emb.shape[0]
            bag = jnp.zeros((1, Np, n_mod * 1024), emb.dtype)
            return jax.lax.dynamic_update_slice(
                bag, emb[None], (0, 0, slot * 1024))

        from multimodalfusion_tpu.interpret.gradcam import gradcam_pp

        @jax.jit
        def _cam(xn, mask, slot):
            act = spatial_fn(xn)

            def head(a):
                out = amil.apply(amil_vars, bags=_bag(a, slot),
                                 mask=mask[None], deterministic=True)
                return out["risk"]

            grads = jax.grad(lambda a: jnp.sum(head(a)))(act)
            return gradcam_pp(act, grads)

        @jax.jit
        def _scores(xn, mask, slot):
            return amil.apply(
                amil_vars, bags=_bag(spatial_fn(xn), slot),
                mask=mask[None], deterministic=True,
                attention_only=True)[0]

        self._cam, self._scores = _cam, _scores

    def __call__(self, x_norm, slot: int):
        """(cams [N, h, w], attention scores [N]) for a normalized scan;
        pads N to the bucket internally."""
        N = x_norm.shape[0]
        n_pad = self.bucket_len(N) - N
        mask = jnp.asarray(
            np.concatenate([np.ones(N, np.float32),
                            np.zeros(n_pad, np.float32)]))
        x = jnp.pad(x_norm, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
        slot = jnp.asarray(slot, jnp.int32)
        if not self.aug:
            cams = self._cam(x, mask, slot)
        else:
            # pytorch-grad-cam's aug_smooth (ref gradcam.py:105): mean of
            # per-variant min-max-scaled CAMs over flip x brightness
            acc = []
            for flip in (False, True):
                xv = jnp.flip(x, axis=2) if flip else x
                for factor in (0.9, 1.0, 1.1):
                    cam = self._cam(xv * factor, mask, slot)
                    if flip:
                        cam = jnp.flip(cam, axis=2)
                    acc.append(cam)
            cams = jnp.mean(jnp.stack(acc), axis=0)
        scores = self._scores(x, mask, slot)
        return np.asarray(cams)[:N], np.asarray(scores)[:N]


def _preprocess(path, lung: bool, want_mask: bool):
    """(slices [N,H,W] in [0,1], slice ids [N], lung mask or None)."""
    if lung:
        if want_mask:
            slices, slice_ids, m = preprocess_lung_scan(path,
                                                        return_mask=True)
            return slices, slice_ids, m
        slices, slice_ids = preprocess_lung_scan(path)
        return slices, slice_ids, None
    slices, slice_ids = preprocess_glioma_scan(path)
    return slices, slice_ids, None


def run_single_scan(args) -> int:
    save_dir = ensure_dir(args.save_dir)
    exp_code = os.path.basename(os.path.normpath(args.ckpt_path))
    settings = read_settings(os.path.join(args.ckpt_path,
                                          f"experiment_{exp_code}.txt"))
    modalities = settings["radio_modality"]

    lung = args.cancer_type == "lung" or args.segment
    # lung CAMs are zeroed outside the lung segmentation
    # (ref gradcam.py:124-189 via PreprocessDatasetMask)
    slices, slice_ids, lung_mask = _preprocess(args.scan, lung, lung)
    if slices.shape[0] == 0:
        print("empty scan")
        return 1
    rgb = _fit_spatial(slices_to_rgb(slices), args.image_size)
    images = jnp.asarray(rgb)

    resnet, res_vars = _load_resnet(args, images)
    if res_vars is None:
        return 2
    amil, amil_vars = _load_amil(args, settings, modalities)
    mod_slot = modalities.index(args.modality) if args.modality in \
        modalities else 0

    # normalize ONCE: the reference's aug_smooth multiplies the already
    # ImageNet-normalized input tensor (pytorch-grad-cam tta.Multiply on
    # input_tensor, ref gradcam.py:105), so the augmentation must land
    # AFTER preprocessing, i.e. spatial_fn must not renormalize
    x_norm = jax.jit(
        lambda im: preprocess_images(im, center_crop=args.image_size))(
            images)
    cams, scores = _scan_cams(resnet, res_vars, amil, amil_vars,
                              len(modalities), mod_slot, x_norm,
                              aug_smooth=not args.no_aug_smooth)
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


def _subject_slice_selection(scores_df, subject, top, all_slices):
    """(selected slice ids, {slice_id: attention}) from the heatmap
    radio branch's scores.csv — mirrors ref gradcam.py:83-88 (top rows
    of the per-subject scores.csv vs all slices sorted by index)."""
    grp = scores_df[scores_df["subject_id"] == subject]
    if grp.empty:
        return None, None
    att = {int(r.slice_index): float(r.attention)
           for r in grp.itertuples()}
    if all_slices:
        sel = sorted(att)
    else:
        by_score = grp.sort_values("attention", ascending=False)
        sel = [int(s) for s in by_score["slice_index"].head(top)]
    return sel, att


def run_cohort(args) -> int:
    if args.scan is not None:
        print("error: pass either --scan or --csv_path, not both",
              file=sys.stderr)
        return 2
    save_dir = ensure_dir(args.save_dir)
    exp_code = os.path.basename(os.path.normpath(args.ckpt_path))
    settings = read_settings(os.path.join(args.ckpt_path,
                                          f"experiment_{exp_code}.txt"))
    ckpt_mods = list(settings["radio_modality"])
    modalities = (args.modalities.split(",") if args.modalities
                  else ckpt_mods)
    cohort = pd.read_csv(args.csv_path)
    if args.subject is not None:
        cohort = cohort[cohort["subject_id"] == args.subject]
        if cohort.empty:
            print(f"error: subject {args.subject} not in {args.csv_path}",
                  file=sys.stderr)
            return 2
    scores_df = pd.read_csv(args.scores_csv) if args.scores_csv else None
    lung = args.cancer_type == "lung" or args.segment
    aug = not args.no_aug_smooth

    # load/validate --weights BEFORE the subject loop: a bad path must
    # fail in seconds, not after the first subject's preprocessing.
    # Only the --allow_random_weights path defers (its init needs a
    # concrete example batch).
    resnet = res_vars = runner = None
    if args.weights or not args.allow_random_weights:
        resnet, res_vars = _load_resnet(args, None)
        if res_vars is None:
            return 2
        amil, amil_vars = _load_amil(args, settings, ckpt_mods)
        runner = CamRunner(resnet, res_vars, amil, amil_vars,
                           len(ckpt_mods), aug)
    out_name = "ig_heatmap_all" if args.all_slices else "ig_heatmap"
    n_done = 0
    for _, row in cohort.iterrows():
        subject = str(row["subject_id"])
        sub_dir = os.path.join(save_dir, subject)
        if os.path.isdir(os.path.join(sub_dir, out_name)) \
                and not args.overwrite:
            print(f"{subject}: {out_name} exists, skipping "
                  "(--overwrite to redo)")
            continue
        mods = [m for m in modalities
                if m in row.index and not pd.isna(row[m])]
        if not mods:
            print(f"{subject}: no modality paths in the CSV, skipping")
            continue

        # per-modality preprocess + CAM over the full scan
        per_mod = {}
        for m in mods:
            path = os.path.join(args.radio_dir, str(row[m]))
            try:
                slices, sids, lmask = _preprocess(path, lung, lung)
            except (OSError, ValueError) as e:
                print(f"{subject}/{m}: cannot preprocess ({e})")
                continue
            if slices.shape[0] == 0:
                print(f"{subject}/{m}: empty scan")
                continue
            images = jnp.asarray(_fit_spatial(slices_to_rgb(slices),
                                              args.image_size))
            if res_vars is None:
                resnet, res_vars = _load_resnet(args, images)
                if res_vars is None:
                    return 2
                amil, amil_vars = _load_amil(args, settings, ckpt_mods)
                runner = CamRunner(resnet, res_vars, amil, amil_vars,
                                   len(ckpt_mods), aug)
            x_norm = preprocess_images(images,
                                       center_crop=args.image_size)
            slot = ckpt_mods.index(m) if m in ckpt_mods else 0
            cams, scores = runner(x_norm, slot)
            per_mod[m] = {"slices": slices,
                          "ids": [int(s) for s in sids],
                          "mask": lmask,
                          "cams": upsample_cams(cams, slices.shape[1:3]),
                          "scores": scores}
        if not per_mod:
            continue

        if scores_df is not None:
            sel, att = _subject_slice_selection(
                scores_df, subject, args.top, args.all_slices)
            if sel is None:
                print(f"{subject}: not in --scores_csv, skipping")
                continue
        else:
            # no scores.csv: rank by the first RENDERED modality's own
            # attention (documented fallback; the reference hard-requires
            # the per-subject scores.csv).  "First rendered", not
            # mods[0]: a modality that failed preprocessing is absent
            # from per_mod and must not KeyError the whole cohort run.
            first = per_mod[next(m for m in mods if m in per_mod)]
            att = dict(zip(first["ids"],
                           [float(s) for s in first["scores"]]))
            order = np.argsort(-first["scores"])
            sel = (sorted(att) if args.all_slices
                   else [first["ids"][i] for i in order[:args.top]])

        if args.all_slices:
            _write_volumes(sub_dir, subject, per_mod, sel, att)
        else:
            out_dir = ensure_dir(os.path.join(sub_dir, "ig_heatmap"))
            n_png = 0
            for k, sid in enumerate(sel):
                for m, d in per_mod.items():
                    if sid not in d["ids"]:
                        continue
                    i = d["ids"].index(sid)
                    cam = d["cams"][i]
                    if d["mask"] is not None:
                        cam = cam * d["mask"][i].astype(np.float32)
                    overlay = cam_overlay(d["slices"][i], cam)
                    # ref gradcam.py:114: {modality}_{k}_{slide}.png
                    cv2.imwrite(os.path.join(out_dir, f"{m}_{k}_{sid}.png"),
                                cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
                    n_png += 1
            print(f"{subject}: {n_png} overlays -> {out_dir}")
        n_done += 1
    print(f"gradcam cohort: {n_done} subjects rendered")
    return 0


def _write_volumes(sub_dir, subject, per_mod, sel, att):
    """--all_slices composite (ref gradcam.py:125-189): per modality,
    mask-zeroed CAM volume normalized on the CROSS-modality range,
    weighted by the min-max-scaled attention, gaussian-blurred
    (sigma 5 along slices, 1 in-plane), renormalized cross-modality;
    written as NIfTI volumes + side-by-side PNGs + raw-CAM pickle."""
    from scipy.ndimage import gaussian_filter
    ensure_dir(sub_dir)
    # attention weights over the selected slice ids, min-max scaled
    a = np.asarray([att.get(s, 0.0) for s in sel], np.float32)
    rng_a = max(float(a.max() - a.min()), 1e-12)
    w = (a - a.min()) / rng_a

    vols, origs, raw = {}, {}, {}
    for m, d in per_mod.items():
        idx = [d["ids"].index(s) for s in sel if s in d["ids"]]
        keep = [j for j, s in enumerate(sel) if s in d["ids"]]
        if not idx:
            continue
        cam = np.asarray(d["cams"])[idx]
        if d["mask"] is not None:
            cam = cam * d["mask"][idx].astype(np.float32)
        else:
            # glioma: zero the CAM on the black background
            # (ref masks via all_masks, gradcam.py:138-145)
            cam = cam * (d["slices"][idx] > 0)
        raw[m] = cam
        vols[m] = (cam, np.asarray(w)[keep])
        origs[m] = d["slices"][idx]
    if not vols:
        return
    g_lo = min(float(c.min()) for c, _ in vols.values())
    g_hi = max(float(c.max()) for c, _ in vols.values())
    g_rng = max(g_hi - g_lo, 1e-12)
    blurred = {}
    for m, (cam, wm) in vols.items():
        cam = (cam - g_lo) / g_rng * wm[:, None, None]
        blurred[m] = gaussian_filter(cam, sigma=[5, 1, 1])
    b_lo = min(float(c.min()) for c in blurred.values())
    b_hi = max(float(c.max()) for c in blurred.values())
    b_rng = max(b_hi - b_lo, 1e-12)
    for m in blurred:
        attr = (blurred[m] - b_lo) / b_rng
        write_nifti(os.path.join(sub_dir, f"{subject}_{m}_orig.nii.gz"),
                    origs[m].astype(np.float32))
        write_nifti(os.path.join(sub_dir, f"{subject}_{m}_attr.nii.gz"),
                    attr.astype(np.float32))
        png_dir = ensure_dir(os.path.join(sub_dir, "ig_heatmap_all", m))
        for i in range(attr.shape[0]):
            overlay = cam_overlay(origs[m][i], attr[i])
            gray = (np.clip(origs[m][i], 0, 1) * 255).astype(np.uint8)
            side = np.concatenate(
                [np.repeat(gray[..., None], 3, axis=-1), overlay], axis=1)
            cv2.imwrite(os.path.join(png_dir, f"all_{i:03d}.png"),
                        cv2.cvtColor(side, cv2.COLOR_RGB2BGR))
    with open(os.path.join(sub_dir, "heatmap.pkl"), "wb") as f:
        pickle.dump(raw, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"{subject}: attr/orig NIfTIs + ig_heatmap_all PNGs -> "
          f"{sub_dir}")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.csv_path is not None:
        return run_cohort(args)
    if args.scan is None:
        print("error: one of --scan or --csv_path is required",
              file=sys.stderr)
        return 2
    return run_single_scan(args)


if __name__ == "__main__":
    sys.exit(main())
