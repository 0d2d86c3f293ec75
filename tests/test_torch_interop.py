"""Torch checkpoint interop: round-trips and functional parity against
torch replicas of the reference stage-2 models."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from multimodalfusion_tpu.models import MaxNet, PathAMIL
from multimodalfusion_tpu.utils import torch_interop as ti

KEY = jax.random.PRNGKey(0)


class TorchGatedAttn(tnn.Module):
    """Reference Attn_Net_Gated replica (model_modules.py:87-110)."""

    def __init__(self, L=256, D=256):
        super().__init__()
        self.attention_a = tnn.Sequential(tnn.Linear(L, D), tnn.Tanh())
        self.attention_b = tnn.Sequential(tnn.Linear(L, D), tnn.Sigmoid())
        self.attention_c = tnn.Linear(D, 1)

    def forward(self, x):
        return self.attention_c(self.attention_a(x) * self.attention_b(x))


class TorchPathAMIL(tnn.Module):
    """Reference MIL_Attention_fc_surv_path replica (:45-72), batch=1."""

    def __init__(self, n_classes=4):
        super().__init__()
        fc = tnn.Linear(1024, 256)
        self.attention_net_WSI = tnn.Sequential(
            fc, tnn.ReLU(), tnn.Dropout(0.25), TorchGatedAttn())
        self.classifier = tnn.Linear(256, n_classes)

    def forward(self, h):
        x = self.attention_net_WSI[0](h)
        x = torch.relu(x)
        A = self.attention_net_WSI[3](x).T          # [1, N]
        A = torch.softmax(A, dim=1)
        M = A @ x
        logits = self.classifier(M)
        hazards = torch.sigmoid(logits)
        S = torch.cumprod(1 - hazards, dim=1)
        return hazards, S


class TorchMaxNet(tnn.Module):
    """Reference MaxNet replica (model_genomic.py:13-72), eval mode."""

    def __init__(self, input_dim, n_classes=4):
        super().__init__()
        self.fc_omic = tnn.Sequential(
            tnn.Sequential(tnn.Linear(input_dim, 256), tnn.SELU()),
            tnn.Sequential(tnn.Linear(256, 256), tnn.SELU()))
        self.classifier = tnn.Linear(256, n_classes)

    def forward(self, x):
        f = self.fc_omic(x)
        logits = self.classifier(f)
        hazards = torch.sigmoid(logits)
        S = torch.cumprod(1 - hazards, dim=1)
        return hazards, S


def test_maxnet_torch_to_flax_parity(rng):
    tm = TorchMaxNet(36)
    tm.eval()
    x = rng.normal(size=(5, 36)).astype(np.float32)
    with torch.no_grad():
        h_ref, S_ref = tm(torch.tensor(x))
    model = MaxNet(bag_loss="nll_surv", n_classes=4)
    variables = model.init(KEY, jnp.asarray(x))
    # note: reference SNN block Sequential nests Linear at .0
    sd = {k.replace("fc_omic.0.0.", "fc_omic.0.0.")
          .replace("fc_omic.1.0.", "fc_omic.1.0."): v
          for k, v in tm.state_dict().items()}
    params = ti.torch_to_flax("max_net", sd, variables["params"])
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out["hazards"]), h_ref.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["S"]), S_ref.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_path_amil_torch_to_flax_parity(rng):
    tm = TorchPathAMIL()
    tm.eval()
    bag = rng.normal(size=(60, 1024)).astype(np.float32)
    with torch.no_grad():
        h_ref, S_ref = tm(torch.tensor(bag))
    model = PathAMIL(gate=True, n_classes=4)
    bags = jnp.asarray(bag)[None]
    mask = jnp.ones((1, 60), jnp.float32)
    variables = model.init(KEY, bags, mask)
    params = ti.torch_to_flax("path_attention_mil", tm.state_dict(),
                              variables["params"])
    out = model.apply({"params": params}, bags, mask)
    np.testing.assert_allclose(np.asarray(out["hazards"]), h_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_export_import_roundtrip(tmp_path, rng):
    bag = rng.normal(size=(30, 1024)).astype(np.float32)
    model = PathAMIL(gate=True)
    bags, mask = jnp.asarray(bag)[None], jnp.ones((1, 30), jnp.float32)
    variables = model.init(KEY, bags, mask)
    out1 = model.apply(variables, bags, mask)
    p = str(tmp_path / "ckpt.pt")
    ti.export_pt(p, "path_attention_mil", variables["params"])
    params2 = ti.import_pt(p, "path_attention_mil", variables["params"])
    out2 = model.apply({"params": params2}, bags, mask)
    np.testing.assert_allclose(np.asarray(out1["risk"]),
                               np.asarray(out2["risk"]), rtol=1e-6)


def test_import_is_strict_false(rng):
    """Unknown keys in the state_dict are ignored; missing keys keep the
    template values (ref load_state_dict(strict=False))."""
    model = MaxNet(bag_loss="nll_surv")
    x = jnp.zeros((1, 36))
    variables = model.init(KEY, x)
    sd = {"some.unrelated.weight": torch.zeros(3, 3)}
    params = ti.torch_to_flax("max_net", sd, variables["params"])
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_config_from_settings_reference_txt_shape():
    """config_from_settings hydrates from the REFERENCE's settings-txt
    key set (a literal dict as ref main.py:215-246 writes it — no
    gate_*/batch_size/split_mode/alpha_surv keys) with the reference's
    constructor defaults."""
    from multimodalfusion_tpu.utils.experiment import config_from_settings
    ref_settings = {
        'data_root_dir': '/x/feat/brain',
        'csv_path': 'dataset_csv/brain/survival.csv',
        'split_dir': './splits/brain/2foldcv', 'cancer_type': 'brain',
        'mode': 'path', 'num_splits': 2, 'n_classes': 4,
        'k_start': -1, 'k_end': -1, 'task': 'survival',
        'max_epochs': 30, 'results_dir': '/x/ref_results/brain',
        'lr': 0.0002, 'reg': 1e-05, 'label_frac': 1.0,
        'inst_loss': None, 'bag_loss': 'nll_surv', 'bag_weight': 0.7,
        'seed': 0, 'model_type': 'path_attention_mil',
        'model_size_wsi': 'small', 'model_size_omic': 'small',
        'model_size_radio': 'small', 'use_drop_out': True,
        'weighted_sample': False, 'gc': 1, 'opt': 'adam',
        'fusion': None, 'radio_fusion': None, 'radio_mil_type': None,
        'radio_modality': ['T1', 'T2', 'T1Gd', 'FLAIR'],
    }
    cfg = config_from_settings(ref_settings, batch_size=4)
    assert cfg.model_type == "path_attention_mil"
    assert cfg.pretrained is False          # no train_type key
    assert cfg.gate_path is True            # ref Attn_Net_Gated default
    assert cfg.gate_radio is True
    assert cfg.gate is False                # mm fusion gate not recorded
    assert cfg.radio_fusion == "concat"     # None -> the usable default
    assert cfg.drop_out is True             # use_drop_out carried over
    assert cfg.batch_size == 4              # override wins
    assert cfg.modalities == ("T1", "T2", "T1Gd", "FLAIR")

    # stage-4 style: train_type flips pretrained on
    s4 = dict(ref_settings, train_type="early-fcnn", n_layers=2,
              bag_loss="cox_surv", alpha_surv=0.6, split_mode="train_val")
    cfg4 = config_from_settings(s4)
    assert cfg4.pretrained is True
    assert cfg4.train_type == "early-fcnn"
    assert cfg4.n_layers == 2
    assert cfg4.alpha_surv == 0.6
