"""Single-file serving export (utils/model_export.py + cli/export_model):
jax.export StableHLO artifacts with the weights baked in must reproduce
the checkpoint's outputs exactly — loadable with NO model code."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                               model_inputs)
from multimodalfusion_tpu.utils.model_export import (example_batch,
                                                     export_scorer,
                                                     load_scorer)


def _init(model, cfg, batch_size, bag_len=64):
    kw = {k: jnp.asarray(v) for k, v in model_inputs(
        cfg, example_batch(cfg, batch_size, bag_len)).items()}
    return dict(model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           deterministic=True, **kw))


def _roundtrip(cfg, probe, bag_len=64, rtol=2e-5):
    model = build_model(cfg)
    variables = _init(model, cfg, next(iter(probe.values())).shape[0],
                      bag_len)
    blob = export_scorer(model, variables, cfg,
                         batch_size=next(iter(probe.values())).shape[0],
                         bag_len=bag_len, platforms=["cpu"])
    got = load_scorer(blob)(probe)
    want = model.apply(variables, deterministic=True,
                       **{k: jnp.asarray(v) for k, v in probe.items()})
    assert got, "no outputs in artifact"
    for k in got:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]), rtol=rtol,
                                   atol=1e-6)
    return sorted(got)


def test_export_maxnet_cox_roundtrip():
    rng = np.random.default_rng(1)
    cfg = TrainConfig(model_type="max_net", mode="omic",
                      omic_input_dim=36, bag_loss="cox_surv")
    keys = _roundtrip(cfg, {"genomic_features": rng.normal(
        size=(4, 36)).astype(np.float32)})
    assert keys == ["risk"]  # scalar-risk family: no hazards


def test_export_path_amil_nll_roundtrip():
    rng = np.random.default_rng(2)
    cfg = TrainConfig(model_type="path_attention_mil", mode="path",
                      bag_loss="nll_surv", gate_path=True)
    keys = _roundtrip(cfg, {
        "bags": rng.normal(size=(2, 64, 1024)).astype(np.float32),
        "mask": (rng.uniform(size=(2, 64)) < 0.8).astype(np.float32)})
    assert keys == ["S", "hazards", "risk"]


def test_export_pretrained_head_roundtrip():
    rng = np.random.default_rng(3)
    cfg = TrainConfig(model_type="mm_attention_mil",
                      mode="radio_path_omic", pretrained=True,
                      train_type="late-fcnn", bag_loss="nll_surv",
                      n_layers=1)
    probe = {f"h_{m}": rng.normal(size=(4, 256)).astype(np.float32)
             for m in ("radio", "path", "omic")}
    probe["valid"] = np.ones((4,), np.float32)
    keys = _roundtrip(cfg, probe)
    assert "risk" in keys


def test_export_multi_platform_from_cpu():
    """A ("cpu","tpu") artifact built on a CPU-only process must
    serialize (cross-platform lowering via the unfused pooling trace)
    and still execute on cpu."""
    rng = np.random.default_rng(4)
    cfg = TrainConfig(model_type="path_attention_mil", mode="path",
                      bag_loss="nll_surv", gate_path=True)
    model = build_model(cfg)
    variables = _init(model, cfg, 2, 64)
    blob = export_scorer(model, variables, cfg, batch_size=2, bag_len=64,
                         platforms=["cpu", "tpu"])
    probe = {"bags": rng.normal(size=(2, 64, 1024)).astype(np.float32),
             "mask": np.ones((2, 64), np.float32)}
    got = load_scorer(blob)(probe)
    want = model.apply(variables, deterministic=True,
                       bags=jnp.asarray(probe["bags"]),
                       mask=jnp.asarray(probe["mask"]))
    np.testing.assert_allclose(np.asarray(got["risk"]),
                               np.asarray(want["risk"]), rtol=2e-5,
                               atol=1e-6)


def test_export_tpu_only_from_cpu_warns_and_check_skips(tmp_path):
    """--platforms tpu from a CPU process: warns that the fused kernels
    are not kept (trace-time kernel choice), and --check skips instead
    of crashing (a tpu-only artifact cannot execute on cpu)."""
    import warnings

    from multimodalfusion_tpu.utils.model_export import (save_scorer,
                                                         traces_fused)
    assert not traces_fused(["tpu"])  # CPU process
    cfg = TrainConfig(model_type="max_net", mode="omic",
                      omic_input_dim=8, bag_loss="cox_surv")
    model = build_model(cfg)
    variables = _init(model, cfg, 2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sidecar = save_scorer(str(tmp_path / "a.stablehlo"), model,
                              variables, cfg, batch_size=2,
                              platforms=["tpu"])
    assert any("non-TPU process" in str(w.message) for w in caught)
    assert sidecar["platforms"] == ["tpu"]


def test_force_unfused_context_restores():
    """Cross-platform exports trace under force_unfused(); the override
    must hold inside the context (even where the backend would pick the
    fused kernels) and restore cleanly, including on error."""
    from multimodalfusion_tpu.ops import mil_attention as mil
    assert not mil._FORCE_UNFUSED
    with mil.force_unfused():
        assert mil._FORCE_UNFUSED and not mil._use_pallas()
        with mil.force_unfused():       # re-entrant
            assert mil._FORCE_UNFUSED
        assert mil._FORCE_UNFUSED
    assert not mil._FORCE_UNFUSED
    with pytest.raises(RuntimeError):
        with mil.force_unfused():
            raise RuntimeError("boom")
    assert not mil._FORCE_UNFUSED


def test_export_requires_omic_dim():
    cfg = TrainConfig(model_type="max_net", mode="omic",
                      omic_input_dim=0)
    with pytest.raises(ValueError, match="omic_input_dim"):
        example_batch(cfg)


def test_export_cli_on_trained_experiment(tmp_path):
    """Train a tiny real experiment through the stage-2 CLI, export fold
    0 with --check (the CLI's own round-trip assertion), and serve the
    artifact standalone — including the data-derived omic width being
    recovered from the checkpoint."""
    from fixtures import make_cohort_csv, make_splits

    from multimodalfusion_tpu.cli.export_model import main as export_main
    from multimodalfusion_tpu.cli.main import main as cli_main

    base = tmp_path
    _, df, _ = make_cohort_csv(str(base / "dataset_csv" / "brain"),
                               n=30, seed=5)
    make_splits(str(base / "splits" / "brain" / "1foldcv"), df, k=1,
                val_frac=0.3, seed=5)
    rc = cli_main([
        "--cancer_type", "brain", "--which_splits", "1foldcv",
        "--k", "1", "--max_epochs", "2", "--n_classes", "4",
        "--model_type", "max_net", "--mode", "omic",
        "--bag_loss", "cox_surv", "--batch_size", "16",
        "--data_root_dir", str(base / "features"),
        "--dataset_root", str(base / "dataset_csv"),
        "--splits_root", str(base / "splits"),
        "--results_dir", str(base / "results"), "--overwrite"])
    assert rc == 0
    exp = next((base / "results" / "brain" / "1foldcv").iterdir())
    rc = export_main(["--model_path", str(exp), "--which_k", "0",
                      "--batch_size", "4", "--check"])
    assert rc == 0
    art = exp / "s_0_scorer.stablehlo"
    assert art.exists() and (exp / "s_0_scorer.stablehlo.json").exists()

    # standalone serving: only the artifact + jax
    import json
    sidecar = json.loads((exp / "s_0_scorer.stablehlo.json").read_text())
    scorer = load_scorer(art.read_bytes())
    rng = np.random.default_rng(0)
    probe = {k: rng.normal(size=s["shape"]).astype(s["dtype"])
             for k, s in sidecar["inputs"].items()}
    out = scorer(probe)
    risk = np.asarray(out["risk"])
    assert risk.shape[0] == 4 and np.isfinite(risk).all()

    # PROOF of "no model code": a fresh interpreter whose sys.path
    # cannot import multimodalfusion_tpu serves the artifact with jax
    # alone and reproduces the risk scores bit-for-bit
    import subprocess
    import sys
    script = (
        "import sys, json, numpy as np\n"
        "try:\n"
        "    import multimodalfusion_tpu\n"
        "    raise SystemExit('model code importable — test is vacuous')\n"
        "except ImportError:\n"
        "    pass\n"
        "from jax import export as jexport\n"
        f"exp = jexport.deserialize(bytearray(open({str(art)!r}, 'rb')"
        ".read()))\n"
        f"sidecar = json.load(open({str(art) + '.json'!r}))\n"
        "rng = np.random.default_rng(0)\n"
        "probe = {k: rng.normal(size=s['shape']).astype(s['dtype'])\n"
        "         for k, s in sidecar['inputs'].items()}\n"
        "out = exp.call(probe)\n"
        "np.save(sys.argv[1], np.asarray(out['risk']))\n"
    )
    risk_path = str(tmp_path / "standalone_risk.npy")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", script, risk_path],
                       cwd=str(tmp_path), env=env, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    np.testing.assert_array_equal(np.load(risk_path), risk)
