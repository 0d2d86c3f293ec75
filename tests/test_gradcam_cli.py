"""Radiology GradCAM CLI end-to-end: NIfTI scan + trained radio AMIL ->
per-slice overlays + CAM volume."""
import os

import numpy as np
import pytest

from fixtures import make_cohort_csv, make_feature_store, make_splits

from multimodalfusion_tpu.cli.gradcam import main as gc_main
from multimodalfusion_tpu.cli.main import main as s2_main
from multimodalfusion_tpu.data.nifti import read_nifti, write_nifti


def test_gradcam_cli(tmp_path):
    b = tmp_path
    csv_path, df, latent = make_cohort_csv(
        str(b / "dataset_csv" / "brain"), n=20, seed=4)
    make_feature_store(str(b / "features" / "brain"), df, latent, seed=4,
                       bag_range=(5, 12))
    make_splits(str(b / "splits" / "brain" / "1fold"), df, k=1)
    rc = s2_main(["--cancer_type", "brain", "--which_splits", "1fold",
                  "--k", "1", "--max_epochs", "1",
                  "--model_type", "radio_attention_mil", "--mode", "radio",
                  "--radio_fusion", "concat", "--bag_loss", "nll_surv",
                  "--batch_size", "4",
                  "--data_root_dir", str(b / "features"),
                  "--dataset_root", str(b / "dataset_csv"),
                  "--splits_root", str(b / "splits"),
                  "--results_dir", str(b / "res"), "--overwrite"])
    assert rc == 0
    exp = next((b / "res" / "brain" / "1fold").iterdir())

    rng = np.random.default_rng(0)
    vol = np.zeros((8, 96, 96), np.float32)
    vol[1:7, 16:80, 16:80] = rng.uniform(5, 90, size=(6, 64, 64))
    scan = str(b / "scan.nii.gz")
    write_nifti(scan, vol, origin_lps=(0.0, -239.0, 0.0))

    # no --weights and no override must refuse loudly (the CAM volume
    # would be noise from a randomly initialized ResNet)
    rc = gc_main(["--scan", scan, "--ckpt_path", str(exp),
                  "--which_k", "0", "--modality", "T1",
                  "--save_dir", str(b / "cam"), "--image_size", "96",
                  "--top_frac", "0.4"])
    assert rc == 2
    rc = gc_main(["--scan", scan, "--ckpt_path", str(exp),
                  "--which_k", "0", "--modality", "T1",
                  "--save_dir", str(b / "cam"), "--image_size", "96",
                  "--top_frac", "0.4", "--allow_random_weights"])
    assert rc == 0
    cam_vol = read_nifti(str(b / "cam" / "cam_volume.nii.gz"))
    assert cam_vol.data.shape[0] == 6  # one CAM per kept slice
    assert np.isfinite(cam_vol.data).all()
    assert 0.0 <= cam_vol.data.max() <= 1.0 + 1e-5
    pngs = list((b / "cam").glob("slice*.png"))
    assert len(pngs) >= 2  # top 40% of 6 slices

    # lung branch: CAMs zeroed outside the lung segmentation
    lung = np.full((10, 72, 72), 40, np.int16)
    lung[:, :4, :] = lung[:, -4:, :] = -1000
    lung[:, :, :4] = lung[:, :, -4:] = -1000
    lung[2:9, 20:52, 12:32] = -850
    lung[2:9, 20:52, 40:60] = -850
    lscan = str(b / "lung.nii.gz")
    write_nifti(lscan, lung.astype(np.float32), pixdim=(1.0, 1.0, 1.5))
    rc = gc_main(["--scan", lscan, "--ckpt_path", str(exp),
                  "--which_k", "0", "--cancer_type", "lung",
                  "--save_dir", str(b / "cam_lung"), "--image_size", "96",
                  "--top_frac", "0.5", "--allow_random_weights"])
    assert rc == 0
    lung_cam = read_nifti(str(b / "cam_lung" / "cam_volume.nii.gz")).data
    assert lung_cam.shape[0] > 0 and np.isfinite(lung_cam).all()
    # mask-zeroing must suppress CAM outside the lungs (the gaussian
    # blur smears a few px past the edge, so compare means not zeros)
    from multimodalfusion_tpu.data.radiology import preprocess_lung_scan
    _, _, lmask = preprocess_lung_scan(lscan, return_mask=True)
    assert lung_cam[lmask].mean() > 2 * max(lung_cam[~lmask].mean(), 1e-9)


def test_preprocess_lung_volume_return_mask():
    from multimodalfusion_tpu.data.radiology import preprocess_lung_volume
    vol = np.full((8, 72, 72), 40, np.int16)
    vol[:, :4, :] = vol[:, -4:, :] = -1000
    vol[:, :, :4] = vol[:, :, -4:] = -1000
    vol[2:7, 20:52, 12:32] = -850
    vol[2:7, 20:52, 40:60] = -850
    slices, ids, mask = preprocess_lung_volume(vol, (2.0, 1.0, 1.0),
                                               return_mask=True)
    assert mask.shape == slices.shape and mask.dtype == bool
    assert mask.any()  # lungs present
    # the segmentation only admits voxels below -320 HU; after the
    # (-1000, 400) window that is < 0.486 (resampling interpolates
    # boundary voxels between lung -850 and tissue +40)
    assert slices[mask].max() < 0.5
    assert slices[mask].mean() < 0.25          # mostly true lung interior
    assert slices[~mask].mean() > 0.5          # outside is mostly tissue
    with pytest.raises(ValueError):
        preprocess_lung_volume(vol, (2.0, 1.0, 1.0),
                               segment_each_slice=True, return_mask=True)


def test_gradcam_cohort_mode(tmp_path):
    """Cohort driving (ref gradcam.py:30-70): scan-list CSV + the heatmap
    radio branch's scores.csv select slices; per-subject ig_heatmap
    overlays (top mode) and attention-weighted CAM volumes
    (--all_slices), with idempotent skip."""
    import pandas as pd
    b = tmp_path
    csv_path, df, latent = make_cohort_csv(
        str(b / "dataset_csv" / "brain"), n=20, seed=5)
    make_feature_store(str(b / "features" / "brain"), df, latent, seed=5,
                       bag_range=(5, 12))
    make_splits(str(b / "splits" / "brain" / "1fold"), df, k=1)
    rc = s2_main(["--cancer_type", "brain", "--which_splits", "1fold",
                  "--k", "1", "--max_epochs", "1",
                  "--model_type", "radio_attention_mil", "--mode", "radio",
                  "--radio_fusion", "concat", "--bag_loss", "nll_surv",
                  "--batch_size", "4",
                  "--data_root_dir", str(b / "features"),
                  "--dataset_root", str(b / "dataset_csv"),
                  "--splits_root", str(b / "splits"),
                  "--results_dir", str(b / "res"), "--overwrite"])
    assert rc == 0
    exp = next((b / "res" / "brain" / "1fold").iterdir())

    # two subjects x two modalities of tiny glioma scans; slice ids
    # after black-slice dropping are 1..6
    rng = np.random.default_rng(1)
    scans_dir = b / "scans"
    os.makedirs(scans_dir)
    rows = []
    for subj in ("SUBJ000", "SUBJ001"):
        row = {"subject_id": subj}
        for mod in ("T1", "T2"):
            vol = np.zeros((8, 96, 96), np.float32)
            vol[1:7, 16:80, 16:80] = rng.uniform(5, 90, size=(6, 64, 64))
            p = f"{subj}_{mod}.nii.gz"
            write_nifti(str(scans_dir / p), vol,
                        origin_lps=(0.0, -239.0, 0.0))
            row[mod] = p
        rows.append(row)
    cohort_csv = str(b / "scan_list.csv")
    pd.DataFrame(rows).to_csv(cohort_csv, index=False)

    # attention scores in the heatmap radio branch's layout
    srows = []
    for subj in ("SUBJ000", "SUBJ001"):
        for sid in range(1, 7):
            srows.append({"subject_id": subj, "slice_index": sid,
                          "attention": float(10 - sid),
                          "group": "top" if sid <= 3 else "low"})
    scores_csv = str(b / "scores.csv")
    pd.DataFrame(srows).to_csv(scores_csv, index=False)

    common = ["--ckpt_path", str(exp), "--which_k", "0",
              "--csv_path", cohort_csv, "--radio_dir", str(scans_dir),
              "--scores_csv", scores_csv, "--image_size", "96",
              "--modalities", "T1,T2", "--allow_random_weights",
              "--no_aug_smooth"]

    # ---- top mode: top-2 slices x 2 modalities = 4 PNGs per subject,
    # named {modality}_{rank}_{slice_id}.png (ref gradcam.py:114)
    rc = gc_main(common + ["--save_dir", str(b / "coh"), "--top", "2"])
    assert rc == 0
    for subj in ("SUBJ000", "SUBJ001"):
        pngs = sorted(p.name for p in
                      (b / "coh" / subj / "ig_heatmap").glob("*.png"))
        # highest scores are slice ids 1 and 2
        assert pngs == ["T1_0_1.png", "T1_1_2.png",
                        "T2_0_1.png", "T2_1_2.png"], pngs

    # idempotent skip: drop a sentinel, rerun without --overwrite
    marker = b / "coh" / "SUBJ000" / "ig_heatmap" / "T1_0_1.png"
    sig = marker.read_bytes()
    marker.write_bytes(b"sentinel")
    rc = gc_main(common + ["--save_dir", str(b / "coh"), "--top", "2"])
    assert rc == 0
    assert marker.read_bytes() == b"sentinel"
    rc = gc_main(common + ["--save_dir", str(b / "coh"), "--top", "2",
                           "--overwrite"])
    assert rc == 0
    assert marker.read_bytes() == sig

    # ---- --subject restriction + --all_slices volumes
    rc = gc_main(common + ["--save_dir", str(b / "coh_all"),
                           "--all_slices", "--subject", "SUBJ001"])
    assert rc == 0
    assert not (b / "coh_all" / "SUBJ000").exists()
    sub = b / "coh_all" / "SUBJ001"
    for mod in ("T1", "T2"):
        attr = read_nifti(str(sub / f"SUBJ001_{mod}_attr.nii.gz")).data
        orig = read_nifti(str(sub / f"SUBJ001_{mod}_orig.nii.gz")).data
        # glioma preprocessing crops to the nonzero bounding box (64x64)
        assert attr.shape == orig.shape == (6, 64, 64)
        assert np.isfinite(attr).all()
        assert 0.0 <= attr.min() and attr.max() <= 1.0 + 1e-5
        side = list((sub / "ig_heatmap_all" / mod).glob("all_*.png"))
        assert len(side) == 6
    # cross-modality normalization: the global max over BOTH attr
    # volumes is exactly 1
    t1 = read_nifti(str(sub / "SUBJ001_T1_attr.nii.gz")).data
    t2 = read_nifti(str(sub / "SUBJ001_T2_attr.nii.gz")).data
    assert max(t1.max(), t2.max()) == pytest.approx(1.0, abs=1e-5)
    assert (sub / "heatmap.pkl").exists()

    # ---- a bad --weights path fails up front (rc 2) BEFORE any
    # subject preprocessing: the fresh save_dir stays subject-free
    rc = gc_main(common + ["--save_dir", str(b / "coh_bad"),
                           "--weights", str(b / "missing.pt"),
                           "--top", "2"])
    assert rc == 2
    assert list((b / "coh_bad").iterdir()) == []

    # ---- no --scores_csv + the FIRST modality unreadable: the
    # attention-ranked fallback must key off the first modality that
    # actually rendered, not mods[0] (which would KeyError the cohort)
    rows_bad = [{"subject_id": "SUBJ000",
                 "T1": "does_not_exist.nii.gz",
                 "T2": f"SUBJ000_T2.nii.gz"}]
    bad_csv = str(b / "scan_list_bad.csv")
    pd.DataFrame(rows_bad).to_csv(bad_csv, index=False)
    no_scores = [a for a in common
                 if a not in ("--scores_csv", scores_csv)]
    no_scores[no_scores.index(cohort_csv)] = bad_csv
    rc = gc_main(no_scores + ["--save_dir", str(b / "coh_fb"),
                              "--top", "2"])
    assert rc == 0
    pngs = sorted(p.name for p in
                  (b / "coh_fb" / "SUBJ000" / "ig_heatmap").glob("*.png"))
    assert len(pngs) == 2 and all(n.startswith("T2_") for n in pngs), pngs


def test_cam_runner_matches_scan_cams():
    """The compile-once cohort CamRunner (slot traced, slices padded to
    a bucket and mask-excluded) must produce the exact CAMs/scores of
    the per-scan closures that were parity-verified against the
    reference's grad_cam_radio."""
    import jax
    import jax.numpy as jnp
    from multimodalfusion_tpu.cli.gradcam import CamRunner, _scan_cams
    from multimodalfusion_tpu.engine.train import TrainConfig, build_model
    from multimodalfusion_tpu.models.resnet import ResNet50Trunc

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 64, 64, 3)).astype(np.float32))
    resnet = ResNet50Trunc()
    res_vars = resnet.init(jax.random.PRNGKey(0), x[:1])
    mods = ("T1", "T2")
    cfg = TrainConfig(model_type="radio_attention_mil", mode="radio",
                      modalities=mods, n_classes=4, bag_loss="nll_surv",
                      radio_fusion="concat", batch_size=1, seed=0)
    amil = build_model(cfg)
    amil_vars = dict(amil.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        bags=jnp.zeros((1, 16, 2048), jnp.float32),
        mask=jnp.ones((1, 16), jnp.float32), deterministic=True))

    for aug in (False, True):
        runner = CamRunner(resnet, res_vars, amil, amil_vars, len(mods),
                           aug)
        for slot in (0, 1):
            want_c, want_s = _scan_cams(resnet, res_vars, amil, amil_vars,
                                        len(mods), slot, x, aug)
            got_c, got_s = runner(x, slot)
            assert got_c.shape == want_c.shape == (5, 4, 4)
            np.testing.assert_allclose(got_s, want_s, rtol=0, atol=1e-5)
            np.testing.assert_allclose(got_c, want_c, rtol=0, atol=1e-4)


def test_cam_runner_compiles_once_per_bucket():
    """Scans of different lengths inside one 16-slice bucket and
    different modality slots must all hit ONE compiled program (the
    point of CamRunner vs the per-scan closures)."""
    import jax
    import jax.numpy as jnp
    from multimodalfusion_tpu.cli.gradcam import CamRunner
    from multimodalfusion_tpu.engine.train import TrainConfig, build_model
    from multimodalfusion_tpu.models.resnet import ResNet50Trunc

    rng = np.random.default_rng(1)
    resnet = ResNet50Trunc()
    x0 = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    res_vars = resnet.init(jax.random.PRNGKey(0), x0)
    cfg = TrainConfig(model_type="radio_attention_mil", mode="radio",
                      modalities=("T1", "T2"), n_classes=4,
                      bag_loss="nll_surv", radio_fusion="concat",
                      batch_size=1, seed=0)
    amil = build_model(cfg)
    amil_vars = dict(amil.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        bags=jnp.zeros((1, 16, 2048), jnp.float32),
        mask=jnp.ones((1, 16), jnp.float32), deterministic=True))
    runner = CamRunner(resnet, res_vars, amil, amil_vars, 2,
                       aug_smooth=False)
    for n, slot in ((5, 0), (11, 1), (16, 0), (3, 1)):
        x = jnp.asarray(rng.normal(size=(n, 64, 64, 3)).astype(np.float32))
        cams, scores = runner(x, slot)
        assert cams.shape[0] == scores.shape[0] == n
    assert runner._cam._cache_size() == 1
    assert runner._scores._cache_size() == 1


def test_cam_runner_bucket_ladder():
    """Realistic CT scan lengths (91/120/156/300 slices) must land in
    the power-of-two ladder's buckets — at most 3 compiled programs,
    not one per distinct 16-multiple."""
    import jax
    import jax.numpy as jnp
    from multimodalfusion_tpu.cli.gradcam import CamRunner
    from multimodalfusion_tpu.engine.train import TrainConfig, build_model
    from multimodalfusion_tpu.models.resnet import ResNet50Trunc

    assert [CamRunner.bucket_len(n) for n in (1, 16, 17, 91, 120, 156,
                                              300)] == \
        [16, 16, 32, 128, 128, 256, 512]

    rng = np.random.default_rng(2)
    resnet = ResNet50Trunc()
    x0 = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    res_vars = resnet.init(jax.random.PRNGKey(0), x0)
    cfg = TrainConfig(model_type="radio_attention_mil", mode="radio",
                      modalities=("T1", "T2"), n_classes=4,
                      bag_loss="nll_surv", radio_fusion="concat",
                      batch_size=1, seed=0)
    amil = build_model(cfg)
    amil_vars = dict(amil.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        bags=jnp.zeros((1, 16, 2048), jnp.float32),
        mask=jnp.ones((1, 16), jnp.float32), deterministic=True))
    runner = CamRunner(resnet, res_vars, amil, amil_vars, 2,
                       aug_smooth=False)
    # 33 and 60 share the 64-bucket; 91 and 120 the 128-bucket
    for n in (33, 60, 91, 120, 156):
        x = jnp.asarray(rng.normal(size=(n, 32, 32, 3)).astype(np.float32))
        cams, scores = runner(x, 0)
        assert cams.shape[0] == scores.shape[0] == n
    assert runner._cam._cache_size() == 3     # buckets 64, 128, 256
    assert runner._scores._cache_size() == 3
