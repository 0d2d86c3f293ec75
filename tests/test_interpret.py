"""Integrated gradients, GradCAM++, heatmaps, and survival analysis."""
import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from multimodalfusion_tpu import analysis
from multimodalfusion_tpu.interpret import gradcam, heatmaps
from multimodalfusion_tpu.interpret.ig import (completeness_gap,
                                               integrated_gradients,
                                               modality_attributions)


def test_ig_linear_function_exact():
    """For linear f, IG = w * x exactly at any n_steps."""
    w = jnp.array([1.0, -2.0, 3.0])
    x = jnp.array([[2.0, 1.0, -1.0]])
    (attr,) = integrated_gradients(lambda a: a @ w, (x,), n_steps=5)
    np.testing.assert_allclose(np.asarray(attr), np.asarray(x * w),
                               rtol=1e-6)


def test_ig_completeness_nonlinear():
    def f(a):
        return jnp.sum(jnp.tanh(a) ** 2, axis=-1)
    x = jnp.array([[0.5, -1.2, 2.0, 0.1]])
    attrs = integrated_gradients(f, (x,), n_steps=256)
    gap = completeness_gap(f, (x,), attrs)
    assert gap < 1e-3


def test_ig_multiple_inputs():
    def f(a, b):
        return jnp.sum(a * 2.0, axis=-1) + jnp.sum(b ** 2, axis=-1)
    a = jnp.ones((3, 4))
    b = jnp.full((3, 2), 2.0)
    attr_a, attr_b = integrated_gradients(f, (a, b), n_steps=64)
    np.testing.assert_allclose(np.asarray(attr_a), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(attr_b), 4.0, rtol=1e-2)


def test_modality_attributions_shapes():
    def f(a, b):
        return jnp.sum(a, axis=-1) - jnp.sum(b, axis=-1)
    a = jnp.ones((4, 8))
    b = jnp.ones((4, 8))
    out = modality_attributions(f, (a, b), ("radio", "path"))
    assert set(out) == {"radio", "path"}
    assert out["radio"].shape == (4,)


def test_gradcam_pp_localizes():
    """Activation energy concentrated in one quadrant -> CAM peaks
    there."""
    act = np.zeros((1, 8, 8, 4), np.float32)
    act[0, :4, :4, :] = 1.0
    w = jnp.ones((4,))

    def head(a):
        return jnp.einsum("bhwc,c->b", a, w)

    grads = jax.grad(lambda a: jnp.sum(head(a)))(jnp.asarray(act))
    cams = gradcam.gradcam_pp(jnp.asarray(act), grads)
    cams = np.asarray(cams)
    assert cams.shape == (1, 8, 8)
    assert cams[0, :4, :4].mean() > cams[0, 4:, 4:].mean()
    assert cams.max() <= 1.0 + 1e-6


def test_cam_overlay_shapes():
    img = np.random.default_rng(0).uniform(size=(32, 32)).astype(np.float32)
    cam = np.zeros((32, 32), np.float32)
    cam[8:16, 8:16] = 1.0
    out = gradcam.cam_overlay(img, cam)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_ig_gausslegendre_matches_dense_riemann():
    """The default Gauss-Legendre rule (captum's default, what the
    reference runs) integrates a smooth nonlinear f to the same IG as a
    very fine midpoint Riemann sum."""
    w = jnp.array([0.7, -1.3, 0.4])

    def f(x):
        return jnp.sum(jnp.tanh(x @ w) ** 2 + 0.3 * jnp.sin(x @ w))

    x = jnp.array([[1.2, -0.5, 2.0]])
    (gl,) = integrated_gradients(f, (x,), n_steps=20,
                                 method="gausslegendre")
    (dense,) = integrated_gradients(f, (x,), n_steps=4000,
                                    method="riemann_middle")
    np.testing.assert_allclose(np.asarray(gl), np.asarray(dense),
                               rtol=1e-5, atol=1e-7)


def test_gradcam_pp_matches_pytorch_grad_cam_formula():
    """gradcam_pp pins to the pytorch-grad-cam GradCAMPlusPlus math the
    reference invokes (gradcam.py:101-105): alpha = g^2 / (2 g^2 +
    sum(A) g^3 + 1e-6) zeroed at g==0, weights = sum(alpha relu(g)),
    min-max scaled CAM."""
    rng = np.random.default_rng(1)
    act = rng.normal(size=(2, 5, 5, 7)).astype(np.float32)
    grads = rng.normal(size=(2, 5, 5, 7)).astype(np.float32)
    grads[0, 0, 0, 0] = 0.0  # exercise the g==0 zeroing

    # reference formula in NCHW, as the library computes it
    a_nchw = np.transpose(act, (0, 3, 1, 2))
    g_nchw = np.transpose(grads, (0, 3, 1, 2))
    g2, g3 = g_nchw ** 2, g_nchw ** 3
    sum_act = a_nchw.sum(axis=(2, 3))[:, :, None, None]
    aij = g2 / (2 * g2 + sum_act * g3 + 1e-6)
    aij = np.where(g_nchw != 0, aij, 0)
    wts = (np.maximum(g_nchw, 0) * aij).sum(axis=(2, 3))
    cam = np.maximum((wts[:, :, None, None] * a_nchw).sum(axis=1), 0)
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    want = (cam - lo) / (1e-7 + hi - lo)

    got = np.asarray(gradcam.gradcam_pp(jnp.asarray(act),
                                        jnp.asarray(grads)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_to_percentiles():
    s = np.array([1.0, 5.0, 3.0])
    p = heatmaps.to_percentiles(s)
    assert list(np.argsort(p)) == list(np.argsort(s))
    assert p.max() == 100.0


def test_score_to_percentile_matches_scipy():
    """Vectorized score2percentile (ref heatmap_utils.py:32-34) pins to
    scipy.stats.percentileofscore(kind='rank'), ties and all."""
    from scipy.stats import percentileofscore
    rng = np.random.default_rng(0)
    ref = np.round(rng.normal(size=50), 1)  # rounding forces ties
    qs = np.concatenate([ref[:10], rng.normal(size=10)])
    got = heatmaps.score_to_percentile(qs, ref)
    want = np.array([percentileofscore(ref, q, kind="rank") for q in qs])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_draw_heatmap_and_sampling():
    from multimodalfusion_tpu.data import wsi
    slide = wsi.synthetic_slide(1024, 768, n_blobs=2, seed=3)
    coords = np.array([[0, 0], [256, 256], [512, 512], [256, 0]])
    scores = np.array([0.1, 0.9, 0.5, 0.3])
    img = heatmaps.draw_heatmap(slide, scores, coords, patch_size=256,
                                vis_level=2)
    assert img.shape[2] == 3
    sc, cc = heatmaps.sample_rois(scores, coords, k=2, mode="topk")
    assert list(sc) == [0.9, 0.5]
    sc, cc = heatmaps.sample_rois(scores, coords, k=2, mode="reverse_topk")
    assert list(sc) == [0.1, 0.3]
    assert heatmaps.dynamic_k(100000) == 500
    assert heatmaps.dynamic_k(1000) == 200


def test_draw_heatmap_tissue_mask_clips_colormap():
    """segment=True writes heatmap color only inside the tissue contours
    (ref visHeatmap's get_seg_mask clipping): a patch spanning background
    keeps the raw slide pixels outside tissue, differs inside."""
    from multimodalfusion_tpu.data import wsi
    slide = wsi.synthetic_slide(1024, 768, n_blobs=1, seed=7)
    tissue, holes = wsi.segment_tissue(slide, a_t=0.1, a_h=0.05)
    assert tissue, "fixture must segment at least one contour"
    # one patch per grid cell covering the whole slide at level 0
    xs, ys = np.meshgrid(np.arange(0, 1024, 256), np.arange(0, 768, 256))
    coords = np.stack([xs.ravel(), ys.ravel()], axis=1)
    scores = np.linspace(0.1, 0.9, len(coords))
    vis_level = 2
    base = slide.read_region((0, 0), vis_level,
                             slide.level_dimensions[vis_level])
    masked = heatmaps.draw_heatmap(slide, scores, coords, patch_size=256,
                                   vis_level=vis_level, alpha=1.0,
                                   segment=True, tissue=tissue, holes=holes)
    unmasked = heatmaps.draw_heatmap(slide, scores, coords, patch_size=256,
                                     vis_level=vis_level, alpha=1.0,
                                     segment=False)
    scale = (1.0 / slide.level_downsamples[vis_level][0],
             1.0 / slide.level_downsamples[vis_level][1])
    w, h = slide.level_dimensions[vis_level]
    seg = heatmaps.get_seg_mask((w, h), scale, tissue, holes)
    assert 0 < seg.sum() < seg.size
    # outside tissue: masked == raw slide, while the unmasked render colors
    # everything patch-covered
    np.testing.assert_array_equal(masked[~seg], base[~seg])
    assert (unmasked[~seg] != base[~seg]).any()
    # inside tissue both renders show the colormap
    np.testing.assert_array_equal(masked[seg], unmasked[seg])
    assert (masked[seg] != base[seg]).any()


def test_draw_heatmap_block_blending_matches_global():
    """block_blend (bounded-memory canvas blending, ref :752) must equal a
    single global addWeighted for a slide that fits in one block."""
    import cv2
    from multimodalfusion_tpu.data import wsi
    slide = wsi.synthetic_slide(512, 384, n_blobs=2, seed=1)
    coords = np.array([[0, 0], [256, 0], [0, 192], [256, 192]])
    scores = np.array([0.2, 0.8, 0.5, 0.9])
    small_blocks = heatmaps.draw_heatmap(
        slide, scores, coords, patch_size=256, vis_level=1, alpha=0.4,
        block_size=40)
    one_block = heatmaps.draw_heatmap(
        slide, scores, coords, patch_size=256, vis_level=1, alpha=0.4,
        block_size=4096)
    np.testing.assert_array_equal(small_blocks, one_block)


def test_draw_heatmap_custom_downsample_and_max_size():
    from multimodalfusion_tpu.data import wsi
    slide = wsi.synthetic_slide(1024, 768, n_blobs=1, seed=2)
    coords = np.array([[0, 0], [256, 256]])
    scores = np.array([0.3, 0.8])
    img = heatmaps.draw_heatmap(slide, scores, coords, vis_level=1,
                                custom_downsample=2)
    assert img.shape[:2] == (768 // 2 // 2, 1024 // 2 // 2)
    img = heatmaps.draw_heatmap(slide, scores, coords, vis_level=1,
                                max_size=100)
    assert max(img.shape[:2]) == 100


def test_draw_heatmap_binarize_and_blank_canvas():
    from multimodalfusion_tpu.data import wsi
    slide = wsi.synthetic_slide(512, 512, n_blobs=1, seed=4)
    coords = np.array([[0, 0], [256, 256]])
    scores = np.array([0.1, 0.9])
    img = heatmaps.draw_heatmap(slide, scores, coords, vis_level=1,
                                alpha=1.0, blank_canvas=True,
                                use_percentiles=False,
                                binarize=True, threshold=0.5)
    # low-score patch fails the cutoff: stays canvas white
    assert (img[10, 10] == [255, 255, 255]).all()
    # high-score patch is colored
    assert (img[200, 200] != [255, 255, 255]).any()


def test_local_attr_plot_writes_pngs(tmp_path):
    """Per-patient signed-attribution bar plots (local SHAP stand-in)."""
    from multimodalfusion_tpu.interpret.explanations import (
        local_attr_plot, local_attr_plots)
    rng = np.random.default_rng(0)
    attr = rng.normal(size=(6, 10))
    feats = rng.normal(size=(6, 10))
    genes = [f"g{i}_cnv" for i in range(10)]
    p = local_attr_plot(attr[0], feats[0], feats, genes,
                        str(tmp_path / "one.png"), max_display=5)
    assert (tmp_path / "one.png").stat().st_size > 1000
    # constant feature column must not crash the color normalization
    feats_const = feats.copy()
    feats_const[:, 3] = 1.0
    local_attr_plot(attr[1], feats_const[1], feats_const, genes,
                    str(tmp_path / "const.png"))
    out = local_attr_plots(attr, feats, [f"P{i}" for i in range(6)], genes,
                           str(tmp_path / "local"), n_patients=2)
    assert len(out) == 2
    assert all(p.endswith("_local_attr.png") for p in out)


def test_global_beeswarm_data_semantics():
    """Plot-data assertions for the global SHAP-style beeswarm (ref
    getGlobalShap, evaluation.py:1003-1141): row order by summed
    |attr|, train-referenced color normalization + clipping, NaN
    handling, jitter bounds, symmetric power-of-two x-range."""
    from multimodalfusion_tpu.interpret.explanations import (
        beeswarm_offsets, global_beeswarm_data)
    rng = np.random.default_rng(4)
    N, M, G = 30, 50, 12
    attr = rng.normal(size=(N, G)) * np.linspace(0.1, 2.0, G)
    feats = rng.normal(size=(N, G))
    feats[0, 5] = np.nan                      # a NaN feature value
    ref = rng.normal(size=(M, G)) * 3.0       # train cohort, wider range

    data = global_beeswarm_data(attr, feats, ref_features=ref,
                                max_display=8)
    order = data["feature_order"]
    assert len(order) == 8
    # ascending bottom-to-top by summed |attr| — the top row (last) is
    # the globally most important feature
    sums = np.abs(attr).sum(axis=0)
    assert list(order) == sorted(np.argsort(sums)[-8:],
                                 key=lambda i: sums[i])
    for row in data["rows"]:
        i = row["feature"]
        # colors normalized on the TRAIN (ref) percentile range
        assert row["vmin"] == pytest.approx(np.nanpercentile(ref[:, i], 5))
        assert row["vmax"] == pytest.approx(np.nanpercentile(ref[:, i], 95))
        # every sample's dot present except NaN feature values
        n_nan = int(np.isnan(feats[:, i]).sum())
        assert len(row["cvals"]) == N - n_nan
        assert len(row["shaps"]) == N
        # cvals clipped into [vmin, vmax]
        assert np.all(row["cvals"] >= row["vmin"] - 1e-12)
        assert np.all(row["cvals"] <= row["vmax"] + 1e-12)
        # jitter stays inside the row band
        assert np.all(np.abs(row["ys"]) <= 0.9 * 0.4 + 1e-12)
    # symmetric power-of-two x-range covering max |attr|
    lo, hi = data["xlim"]
    assert lo == -hi and hi >= np.abs(attr).max()
    assert hi / 2.0 <= np.abs(attr).max() + 1e-12
    # offsets deterministic under a seed
    ys1 = beeswarm_offsets(attr[:, 0], seed=3)
    ys2 = beeswarm_offsets(attr[:, 0], seed=3)
    np.testing.assert_array_equal(ys1, ys2)


def test_global_beeswarm_plot_renders(tmp_path):
    from multimodalfusion_tpu.interpret.explanations import \
        global_beeswarm_plot
    rng = np.random.default_rng(0)
    attr = rng.normal(size=(20, 10))
    feats = rng.normal(size=(20, 10))
    genes = [f"g{i}" for i in range(10)]
    data = global_beeswarm_plot(attr, feats, genes,
                                str(tmp_path / "bees.png"), max_display=6)
    assert (tmp_path / "bees.png").stat().st_size > 1000
    assert len(data["rows"]) == 6
    # constant feature column must not crash color normalization
    feats_const = feats.copy()
    feats_const[:, 2] = 2.0
    global_beeswarm_plot(attr, feats_const, genes,
                         str(tmp_path / "bees_const.png"))
    # near-zero attributions shrink the x-stride to ~1e-12: the tick
    # grid must stay bounded (a fixed +0.01 arange epsilon allocated
    # ~1e10 ticks here)
    global_beeswarm_plot(attr * 1e-13, feats, genes,
                         str(tmp_path / "bees_zero.png"))


def test_draw_heatmap_roi_screening():
    """top_left/bot_right restrict the render to the bbox and drop outside
    patches (ref screen_coords)."""
    from multimodalfusion_tpu.data import wsi
    slide = wsi.synthetic_slide(1024, 768, n_blobs=1, seed=5)
    coords = np.array([[0, 0], [256, 256], [768, 512]])
    scores = np.array([0.2, 0.9, 0.5])
    img = heatmaps.draw_heatmap(slide, scores, coords, vis_level=1,
                                top_left=(256, 256), bot_right=(768, 768))
    assert img.shape[:2] == (256, 256)


# ---------------------------------------------------------------------------
# analysis / reporting
# ---------------------------------------------------------------------------

def test_logrank_identical_groups():
    rng = np.random.default_rng(0)
    t = rng.uniform(1, 50, 40)
    e = np.ones(40, bool)
    chi2, p = analysis.logrank_test(e, t, e, t)
    assert chi2 == pytest.approx(0.0, abs=1e-10)
    assert p == pytest.approx(1.0)


def test_logrank_separated_groups():
    t_a = np.linspace(1, 10, 30)
    t_b = np.linspace(50, 90, 30)
    e = np.ones(30, bool)
    chi2, p = analysis.logrank_test(e, t_a, e, t_b)
    assert p < 1e-6 and chi2 > 20


def test_logrank_vectorized_matches_loop_oracle():
    """The vectorized Mantel-Haenszel matches a per-time loop."""
    from scipy.stats import chi2 as chi2_dist
    rng = np.random.default_rng(5)
    t_a = np.round(rng.uniform(1, 30, 50), 0)  # integer ties
    t_b = np.round(rng.uniform(5, 40, 45), 0)
    e_a = rng.uniform(size=50) > 0.3
    e_b = rng.uniform(size=45) > 0.3

    O_minus_E = V = 0.0
    for t in np.unique(np.concatenate([t_a[e_a], t_b[e_b]])):
        n_a, n_b = np.sum(t_a >= t), np.sum(t_b >= t)
        d_a, d_b = np.sum((t_a == t) & e_a), np.sum((t_b == t) & e_b)
        n, d = n_a + n_b, d_a + d_b
        if n <= 1:
            continue
        O_minus_E += d_a - d * n_a / n
        V += d * (n_a / n) * (n_b / n) * (n - d) / (n - 1)
    want_chi2 = O_minus_E ** 2 / V
    chi2, p = analysis.logrank_test(e_a, t_a, e_b, t_b)
    assert chi2 == pytest.approx(want_chi2, rel=1e-12)
    assert p == pytest.approx(float(chi2_dist.sf(want_chi2, 1)), rel=1e-12)


def test_stratify_risk_quartiles():
    """hazard2grade semantics (ref evaluation.py:80-84): grade = index
    of first cutpoint above the risk."""
    risk = np.arange(8, dtype=float)  # 0..7
    strat = analysis.stratify_risk(risk, [25, 50, 75])
    # percentiles of 0..7 at [25,50,75] = [1.75, 3.5, 5.25]
    np.testing.assert_array_equal(strat, [0, 0, 1, 1, 2, 2, 3, 3])
    # cutpoint tie: value equal to a cut goes to the upper stratum
    assert analysis.hazard2grade(np.array([1.75]), [1.75, 3.5])[0] == 1


def test_km_by_risk_group_percentiles(tmp_path):
    rng = np.random.default_rng(4)
    n = 120
    risk = rng.normal(size=n)
    t = np.exp(2.5 - risk + 0.2 * rng.normal(size=n))
    results = {"subject_id": np.array([f"S{i}" for i in range(n)]),
               "risk": risk, "survival": t,
               "censorship": (rng.uniform(size=n) < 0.2).astype(float)}
    groups = analysis.km_by_risk_group(results, percentiles=[25, 50, 75])
    assert len(groups["strata"]) == 4
    assert groups["n_low"] + groups["n_high"] == pytest.approx(n / 2, abs=2)
    assert groups["logrank_p"] < 0.05
    out = analysis.plot_km(groups, str(tmp_path / "km4.png"))
    import os
    assert os.path.getsize(out) > 1000


def test_hazard_histogram(tmp_path):
    rng = np.random.default_rng(6)
    n = 100
    risk = rng.normal(size=n)
    df = pd.DataFrame({
        "subject_id": [f"S{i}" for i in range(n)],
        "risk": risk,
        "survival": np.exp(3.2 - risk + 0.3 * rng.normal(size=n)),
        "censorship": (rng.uniform(size=n) < 0.2).astype(float)})
    out = str(tmp_path / "h.png")
    res = analysis.hazard_histogram(df, out)
    import os
    assert os.path.getsize(out) > 1000
    # censored patients appear in neither group
    assert res["n_low"] + res["n_high"] == int((df.censorship == 0).sum())
    # short survivors carry higher z-scored risk on average
    assert res["low"][1].size and res["high"][1].size


def test_pool_folds_by_subject():
    d0 = pd.DataFrame({"subject_id": ["A", "B"], "risk": [1.0, 2.0],
                       "survival": [10.0, 20.0], "censorship": [0., 1.]})
    d1 = pd.DataFrame({"subject_id": ["A", "C"], "risk": [3.0, 5.0],
                       "survival": [10.0, 30.0], "censorship": [0., 0.]})
    pooled = analysis.pool_folds_by_subject([d0, d1], "mean")
    pooled = pooled.set_index("subject_id")
    assert pooled.loc["A", "risk"] == pytest.approx(2.0)  # (1+3)/2
    assert pooled.loc["C", "risk"] == pytest.approx(5.0)
    assert len(pooled) == 3
    pmax = analysis.pool_folds_by_subject([d0, d1], "max")
    assert pmax.set_index("subject_id").loc["A", "risk"] == 3.0


def test_survival_auc_wrapper():
    """ref survival_AUC (evaluation.py:559-580): iauc + IPCW c at
    tau=times[-1] + Harrell c with tied_tol 1e-5."""
    rng = np.random.default_rng(8)
    n = 80
    risk = rng.normal(size=n)
    t = np.round(np.exp(2.5 - risk + 0.3 * rng.normal(size=n)), 0) + 1
    e = rng.uniform(size=n) > 0.3
    iauc, ipcw_c, harrell = analysis.survival_auc(e, t, e, t, risk)
    assert 0.6 < iauc <= 1.0
    assert 0.6 < ipcw_c <= 1.0
    assert harrell == pytest.approx(
        __import__("multimodalfusion_tpu.metrics",
                   fromlist=["m"]).concordance_index_censored(
            e, t, risk, tied_tol=1e-5)[0])


def test_bootstrap_ci_contains_point():
    rng = np.random.default_rng(1)
    n = 60
    risk = rng.normal(size=n)
    t = np.exp(2 - risk + 0.3 * rng.normal(size=n))
    e = np.ones(n, bool)
    c, lo, hi = analysis.bootstrap_cindex_ci(e, t, risk, n_boot=200)
    assert lo <= c <= hi
    assert c > 0.7


def test_km_by_risk_group_and_plot(tmp_path):
    rng = np.random.default_rng(2)
    n = 80
    risk = rng.normal(size=n)
    t = np.exp(2.5 - risk + 0.2 * rng.normal(size=n))
    results = {"subject_id": np.array([f"S{i}" for i in range(n)]),
               "risk": risk, "survival": t,
               "censorship": (rng.uniform(size=n) < 0.2).astype(float),
               "disc_label": np.zeros(n)}
    groups = analysis.km_by_risk_group(results)
    assert groups["logrank_p"] < 0.01  # risk separates survival
    out = analysis.plot_km(groups, str(tmp_path / "km.png"))
    import os
    assert os.path.getsize(out) > 1000


def test_summarize_experiments(tmp_path):
    import os
    import pandas as pd
    for exp, vals in (("EXP_A", [0.7, 0.75]), ("EXP_B", [0.6, 0.65])):
        d = tmp_path / "brain" / "5foldcv" / exp
        os.makedirs(d)
        pd.DataFrame({"folds": [0, 1], "val_cindex": vals}).to_csv(
            d / "summary.csv")
    df = analysis.summarize_experiments(str(tmp_path))
    assert len(df) == 2
    a = df[df.experiment.str.endswith("EXP_A")].iloc[0]
    assert a["experiment"] == "brain__5foldcv__EXP_A"
    assert a["val_cindex_mean"] == pytest.approx(0.725)


def test_summarize_experiments_nan_inf_columns(tmp_path):
    """All-NaN columns report NaN silently; an inf value (e.g. an ibs
    blow-up on a degenerate split) must SURFACE as an inf mean rather
    than be masked to NaN — and neither case may warn."""
    import os
    import warnings

    import pandas as pd
    for exp, vals in (("ALLNAN", [np.nan, np.nan]),
                      ("ALLINF", [np.inf, np.inf]),
                      ("MIXED", [0.7, 0.8, np.nan])):
        d = tmp_path / exp
        os.makedirs(d)
        pd.DataFrame({"folds": range(len(vals)),
                      "val_cindex": vals}).to_csv(d / "summary.csv")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        df = analysis.summarize_experiments(str(tmp_path))
    r = df.set_index("experiment")
    assert np.isnan(r.loc["ALLNAN", "val_cindex_mean"])
    assert np.isinf(r.loc["ALLINF", "val_cindex_mean"])
    assert r.loc["MIXED", "val_cindex_mean"] == pytest.approx(0.75)
    assert r.loc["MIXED", "val_cindex_std"] == pytest.approx(0.05)


def test_patch_mosaic():
    rng = np.random.default_rng(0)
    patches = rng.integers(0, 256, size=(7, 32, 32, 3), dtype=np.uint8)
    canvas = heatmaps.patch_mosaic(patches, n_cols=3, gap=2)
    # 3 rows x 3 cols of 32px + gaps
    assert canvas.shape == (3 * 32 + 4 * 2, 3 * 32 + 4 * 2, 3)
    np.testing.assert_array_equal(canvas[2:34, 2:34], patches[0])
    # downscale path
    c2 = heatmaps.patch_mosaic(patches, n_cols=4, downscale=2)
    assert c2.shape[0] < canvas.shape[0]
    # empty
    assert heatmaps.patch_mosaic(np.zeros((0, 8, 8, 3), np.uint8)).shape \
        == (8, 8, 3)


def test_summarize_cli(tmp_path):
    import os
    import pandas as pd
    from multimodalfusion_tpu.cli.summarize import main as sm
    from multimodalfusion_tpu.data.io import save_pkl
    rng = np.random.default_rng(3)
    d = tmp_path / "res" / "brain" / "5cv" / "EXP"
    os.makedirs(d)
    pd.DataFrame({"folds": [0, 1], "val_cindex": [0.7, 0.72]}).to_csv(
        d / "summary.csv")
    n = 40
    risk = rng.normal(size=n)
    res = {"subject_id": np.array([f"S{i}" for i in range(n)]),
           "risk": risk,
           "survival": np.exp(2.5 - risk + 0.2 * rng.normal(size=n)),
           "censorship": np.zeros(n), "disc_label": np.zeros(n)}
    save_pkl(str(d / "split_train_val_0_results.pkl"), res)
    # cohort CSV for the survival_AUC columns (use the cohort itself)
    cohort_csv = tmp_path / "cohort.csv"
    pd.DataFrame({"subject_id": res["subject_id"],
                  "survival_months": res["survival"],
                  "censorship": res["censorship"]}).to_csv(cohort_csv)
    rc = sm(["--results_root", str(tmp_path / "res"),
             "--save_dir", str(tmp_path / "rep"), "--km",
             "--bootstrap", "50", "--percentiles", "25,50,75",
             "--hazard_hist", "--cohort_csv", str(cohort_csv)])
    assert rc == 0
    cv = pd.read_csv(tmp_path / "rep" / "cv_summary.csv")
    assert cv.iloc[0]["val_cindex_mean"] == pytest.approx(0.71)
    rg = pd.read_csv(tmp_path / "rep" / "risk_group_stats.csv")
    assert rg.iloc[0]["logrank_p"] < 0.05
    assert rg.iloc[0]["pooled_cindex"] > 0.6
    assert 0.5 < rg.iloc[0]["iauc"] <= 1.0
    assert 0.5 < rg.iloc[0]["ipcw_cindex"] <= 1.0
    assert list((tmp_path / "rep").glob("*_km.png"))
    assert list((tmp_path / "rep").glob("*_hist.png"))
    # threshold gating: an absurdly small threshold suppresses KM plots
    rc = sm(["--results_root", str(tmp_path / "res"),
             "--save_dir", str(tmp_path / "rep2"), "--km",
             "--km_thresh", "1e-300"])
    assert rc == 0
    assert not list((tmp_path / "rep2").glob("*_km.png"))


def test_pivot_summary_and_bar(tmp_path):
    """Model x cohort pivot + grouped bar comparison (ref
    utils_summary.py:315-335 pivot_summary/plot_bar)."""
    import os

    import pandas as pd

    from multimodalfusion_tpu.cli.summarize import main as sm

    for cohort, exp, vals in (("brain", "OMICS_a0.0_s1", [0.70, 0.72]),
                              ("brain", "PATH_a0.0_s1", [0.60, 0.62]),
                              ("lung", "OMICS_a0.0_s1", [0.66, 0.68])):
        d = tmp_path / "res" / cohort / "5cv" / exp
        os.makedirs(d)
        pd.DataFrame({"folds": [0, 1], "val_cindex": vals}).to_csv(
            d / "summary.csv")
    table = analysis.summarize_experiments(str(tmp_path / "res"))
    pv = analysis.pivot_summary(table)
    assert pv.loc["OMICS_a0.0_s1", "brain"] == pytest.approx(0.71)
    assert pv.loc["OMICS_a0.0_s1", "lung"] == pytest.approx(0.67)
    assert pv.loc["PATH_a0.0_s1", "brain"] == pytest.approx(0.61)
    assert np.isnan(pv.loc["PATH_a0.0_s1", "lung"])  # not run there
    out = analysis.plot_compare_bar(pv, str(tmp_path / "cmp.png"))
    assert os.path.getsize(out) > 1000
    # empty table degrades gracefully
    assert analysis.pivot_summary(pd.DataFrame()).empty
    # results_root pointed AT a cohort dir: no cohort path component,
    # so the splits dir must NOT masquerade as a cohort column
    table_b = analysis.summarize_experiments(str(tmp_path / "res" /
                                                 "brain"))
    pv_b = analysis.pivot_summary(table_b)
    assert list(pv_b.columns) == ["(root)"]
    assert pv_b.loc["OMICS_a0.0_s1", "(root)"] == pytest.approx(0.71)

    rc = sm(["--results_root", str(tmp_path / "res"),
             "--save_dir", str(tmp_path / "rep"), "--pivot"])
    assert rc == 0
    pv2 = pd.read_csv(tmp_path / "rep" / "cv_pivot.csv",
                      index_col="model")
    assert set(pv2.columns) == {"brain", "lung"}
    assert (tmp_path / "rep" / "cv_compare.png").stat().st_size > 1000


def test_emit_heatmap_yamls(tmp_path):
    """Stage-4 -> stage-5 bridge (ref generate_heatmap_yamls,
    evaluation.py:734-786): best-fold selection, branch inference from
    the experiment code, template section passthrough, checkpoint-less
    folds skipped, --all_folds per-fold loop."""
    import os

    import pandas as pd
    import yaml

    from multimodalfusion_tpu.cli.summarize import (emit_heatmap_yamls,
                                                    main as sm)

    root = tmp_path / "res"
    exps = {"OMICS_a0.0_s1": [0.60, 0.75, 0.70],
            "PATH_a0.0_s1": [0.55, 0.52, 0.58],
            "MMF_a0.0_s1": [0.8, 0.8, 0.8]}   # fusion head: no branch
    for exp, vals in exps.items():
        d = root / "lung" / "3foldcv" / exp
        os.makedirs(d)
        pd.DataFrame({"folds": [0, 1, 2],
                      "val_cindex": vals}).to_csv(d / "summary.csv")
        for k in range(3):
            if exp.startswith("PATH") and k == 2:
                continue  # best PATH fold lacks its checkpoint
            (d / f"s_{k}_minloss_checkpoint.msgpack").write_bytes(b"x")
    tpl = tmp_path / "tpl.yaml"
    tpl.write_text(yaml.dump({
        "data_arguments": {"feat_dir": "/feats"},
        "heatmap_arguments": {"max_display": 7},
        "sample_arguments": {"floor": 10},
    }))

    out = tmp_path / "cfgs"
    written = emit_heatmap_yamls(str(root), str(out),
                                 template=str(tpl))
    names = {os.path.basename(p) for p in written}
    # OMICS best fold = 1 (0.75); PATH best fold 2 has no ckpt -> skip;
    # MMF has no heatmap branch
    assert names == {
        "heatmap_config_lung__3foldcv__OMICS_a0.0_s1_val_1.yaml"}
    cfg = yaml.safe_load(open(written[0]))
    assert cfg["exp_arguments"]["branch"] == "omic"
    assert cfg["model_arguments"]["which_k"] == 1
    assert cfg["model_arguments"]["ckpt_path"] == str(
        root / "lung" / "3foldcv" / "OMICS_a0.0_s1")
    # template sections carried through
    assert cfg["data_arguments"] == {"feat_dir": "/feats"}
    assert cfg["heatmap_arguments"] == {"max_display": 7}
    assert cfg["sample_arguments"] == {"floor": 10}
    # save_dir defaults under the emit dir, per-experiment-and-fold
    assert cfg["exp_arguments"]["save_dir"].startswith(
        str(out / "heatmap_results"))

    # --all_folds mirrors the reference's per-idx loop
    out2 = tmp_path / "cfgs_all"
    written = emit_heatmap_yamls(str(root), str(out2), all_folds=True)
    stems = {os.path.basename(p) for p in written}
    assert sum(s.startswith("heatmap_config_lung__3foldcv__OMICS")
               for s in stems) == 3
    assert sum(s.startswith("heatmap_config_lung__3foldcv__PATH")
               for s in stems) == 2  # fold 2 ckpt missing

    # an experiment whose every fold is NaN (e.g. single-sample val
    # splits) is skipped instead of crashing nanargmax
    dnan = root / "lung" / "3foldcv" / "OMICS_a0.0_s9"
    os.makedirs(dnan)
    pd.DataFrame({"folds": [0, 1],
                  "val_cindex": [float("nan")] * 2}).to_csv(
        dnan / "summary.csv")
    (dnan / "s_0_minloss_checkpoint.msgpack").write_bytes(b"x")
    written = emit_heatmap_yamls(str(root), str(tmp_path / "cfgs_nan"),
                                 template=str(tpl))
    assert not any("a0.0_s9" in os.path.basename(p) for p in written)
    # the healthy experiment is still emitted
    assert names <= {os.path.basename(p) for p in written}

    # wired into the CLI
    rc = sm(["--results_root", str(root),
             "--save_dir", str(tmp_path / "rep"),
             "--emit_heatmap_yamls", str(tmp_path / "cli_cfgs"),
             "--heatmap_template", str(tpl)])
    assert rc == 0
    assert list((tmp_path / "cli_cfgs").glob("heatmap_config_*.yaml"))


def test_all_clis_expose_help():
    """Every CLI module builds its parser (import/flag smoke)."""
    import importlib
    for m in ("main", "main_pretrained", "eval_pretrained",
              "pre_trained_feature", "feature_extraction",
              "extract_features_fp", "create_patches", "create_heatmaps",
              "create_attributions", "gradcam", "summarize", "infer"):
        mod = importlib.import_module(f"multimodalfusion_tpu.cli.{m}")
        assert mod.build_parser().format_help()


def test_expected_gradients_linear_exact():
    """For linear f and a single-row background, expected gradients is
    exactly (x - b) * w regardless of the sampled alphas."""
    from multimodalfusion_tpu.interpret.ig import expected_gradients
    w = jnp.array([1.0, -2.0, 0.5])
    b = jnp.array([[0.3, -0.1, 1.0]])
    x = jnp.array([[2.0, 1.0, -1.0], [0.0, 0.5, 0.25]])
    attr = expected_gradients(lambda a: a @ w, x, b, n_samples=16)
    np.testing.assert_allclose(np.asarray(attr), np.asarray((x - b) * w),
                               rtol=1e-5, atol=1e-6)


def test_expected_gradients_converges_to_background_mean():
    """With many draws, linear-model attributions approach
    (x - mean(background)) * w."""
    from multimodalfusion_tpu.interpret.ig import expected_gradients
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=6).astype(np.float32))
    bg = jnp.asarray(rng.normal(size=(40, 6)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(3, 6)).astype(np.float32))
    attr = expected_gradients(lambda a: a @ w, x, bg, n_samples=4000)
    want = (x - jnp.mean(bg, axis=0)) * w
    np.testing.assert_allclose(np.asarray(attr), np.asarray(want),
                               atol=0.15)
