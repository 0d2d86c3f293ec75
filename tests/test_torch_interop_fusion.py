"""Fusion-stack torch checkpoint interop: round-trips and functional
parity against torch replicas of the reference stage-4 pretrained heads
(nll_models_pretrained.py, coxranking_models_pretrained.py) and the
trimodal MM_MIL_Attention_fc_surv (model_mm_attention_mil.py:34-200).

Export direction is proven with ``load_state_dict(strict=True)`` into
the torch replica, so every key the reference expects is present and
shaped right; import direction is proven by forward parity to 1e-4.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from multimodalfusion_tpu.models.mm_amil import MMAttentionMIL
from multimodalfusion_tpu.models.pretrained_heads import (
    MultimodalPretrained, UnimodalPretrained)
from multimodalfusion_tpu.utils import torch_interop as ti

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# torch replicas of the reference modules (state_dict-identical layouts)
# ---------------------------------------------------------------------------

class TorchHighway(tnn.Module):
    """Replica of ref Highway (model_modules.py:5-26)."""

    def __init__(self, size, num_layers):
        super().__init__()
        self.num_layers = num_layers
        self.nonlinear = tnn.ModuleList(
            [tnn.Linear(size, size) for _ in range(num_layers)])
        self.linear = tnn.ModuleList(
            [tnn.Linear(size, size) for _ in range(num_layers)])
        self.gate = tnn.ModuleList(
            [tnn.Linear(size, size) for _ in range(num_layers)])
        self.bn1 = tnn.BatchNorm1d(size)
        self.bn2 = tnn.BatchNorm1d(size)
        self.dropout1 = tnn.Dropout(0.7)

    def forward(self, x):
        x = self.dropout1(self.bn1(x))
        for i in range(self.num_layers):
            g = torch.sigmoid(self.gate[i](x))
            x = g * tF.relu(self.nonlinear[i](x)) + (1 - g) * self.linear[i](x)
        return self.bn2(x)


class TorchXlinearFusion(tnn.Module):
    """Replica of ref XlinearFusion (model_modules.py:113-178) with the
    CUDA-only ones-append made device-agnostic."""

    def __init__(self, skip=1, gate=1, dim=256, scale_dim=16,
                 num_modalities=4, mmhid1=256, mmhid2=256, dropout_rate=0.25):
        super().__init__()
        self.skip, self.gate, self.num_modalities = skip, gate, num_modalities
        dim_og, dim = dim, dim // scale_dim
        skip_dim = dim_og * num_modalities if skip else 0
        reduce = []
        for _ in range(num_modalities):
            linear_h = tnn.Sequential(tnn.Linear(dim_og, dim), tnn.ReLU())
            linear_z = tnn.Sequential(
                tnn.Linear(dim_og * num_modalities, dim))
            linear_o = tnn.Sequential(tnn.Linear(dim, dim), tnn.ReLU(),
                                      tnn.Dropout(p=dropout_rate))
            reduce.append(tnn.ModuleList([linear_h, linear_z, linear_o]))
        self.reduce = tnn.ModuleList(reduce)
        self.post_fusion_dropout = tnn.Dropout(p=dropout_rate)
        self.encoder1 = tnn.Sequential(
            tnn.Linear((dim + 1) ** num_modalities, mmhid1), tnn.ReLU(),
            tnn.Dropout(p=dropout_rate))
        self.encoder2 = tnn.Sequential(
            tnn.Linear(mmhid1 + skip_dim, mmhid2), tnn.ReLU(),
            tnn.Dropout(p=dropout_rate))

    def forward(self, v_list):
        v_cat = torch.cat(v_list, axis=1)
        o_list = []
        for i, v in enumerate(v_list):
            h = self.reduce[i][0](v)
            z = self.reduce[i][1](v_cat)
            o = self.reduce[i][2](torch.sigmoid(z) * h)
            o = torch.cat((o, torch.ones(o.shape[0], 1)), 1)
            o_list.append(o)
        o_fusion = o_list[0]
        for o in o_list[1:]:
            o_fusion = torch.bmm(o_fusion.unsqueeze(2),
                                 o.unsqueeze(1)).flatten(start_dim=1)
        out = self.encoder1(self.post_fusion_dropout(o_fusion))
        if self.skip:
            for v in v_list:
                out = torch.cat((out, v), axis=1)
        return self.encoder2(out)


class TorchMMUnimodalHighway(tnn.Module):
    """Replica of ref nll unimonal_pretrained train_type=highway
    (nll_models_pretrained.py:24-26)."""

    def __init__(self, n_classes=4, n_layers=1):
        super().__init__()
        self.highway = TorchHighway(256, n_layers)
        self.classifier = tnn.Linear(256, n_classes)

    def forward(self, h):
        logits = self.classifier(self.highway(h))
        hazards = torch.sigmoid(logits)
        S = torch.cumprod(1 - hazards, dim=1)
        return -torch.sum(S, dim=1), hazards, S


class TorchMMEarlyFcnn(tnn.Module):
    """Replica of ref nll multimodal_pretrained early-fcnn
    (nll_models_pretrained.py:82-84)."""

    def __init__(self, n_mod=3, n_classes=4):
        super().__init__()
        self.classifier = tnn.Sequential(
            tnn.Linear(n_mod * 256, 128), tnn.BatchNorm1d(128), tnn.ReLU(),
            tnn.Dropout(0.7), tnn.Linear(128, n_classes))

    def forward(self, h_radio, h_path, h_omic):
        logits = self.classifier(torch.cat([h_radio, h_path, h_omic], dim=1))
        hazards = torch.sigmoid(logits)
        S = torch.cumprod(1 - hazards, dim=1)
        return -torch.sum(S, dim=1), hazards, S


class TorchMMKronecker(tnn.Module):
    """Replica of ref nll multimodal_pretrained kronecker
    (nll_models_pretrained.py:101-103)."""

    def __init__(self, n_mod=3, n_classes=4):
        super().__init__()
        self.xfusion = TorchXlinearFusion(num_modalities=n_mod,
                                          dropout_rate=0.7)
        self.classifier = tnn.Linear(256, n_classes)

    def forward(self, h_radio, h_path, h_omic):
        logits = self.classifier(self.xfusion([h_radio, h_path, h_omic]))
        hazards = torch.sigmoid(logits)
        S = torch.cumprod(1 - hazards, dim=1)
        return -torch.sum(S, dim=1), hazards, S


class TorchMMLateFcnnCox(tnn.Module):
    """Replica of ref coxranking multimodal_pretrained late-fcnn
    (coxranking_models_pretrained.py:80-83)."""

    def __init__(self, n_mod=3):
        super().__init__()
        def layer():
            return tnn.Sequential(tnn.Linear(256, 128), tnn.BatchNorm1d(128),
                                  tnn.ReLU(), tnn.Dropout(0.7),
                                  tnn.Linear(128, 1))
        self.layer_WSI, self.layer_MRI, self.layer_omic = (layer(), layer(),
                                                           layer())
        self.classifier = tnn.Sequential(tnn.Linear(n_mod, 1))

    def forward(self, h_radio, h_path, h_omic):
        mm = torch.cat([self.layer_MRI(h_radio).unsqueeze(0),
                        self.layer_WSI(h_path).unsqueeze(0),
                        self.layer_omic(h_omic).unsqueeze(0)], axis=2)
        return self.classifier(mm).squeeze()


class TorchGatedAttn(tnn.Module):
    def __init__(self, L=256, D=256):
        super().__init__()
        self.attention_a = tnn.Sequential(tnn.Linear(L, D), tnn.Tanh())
        self.attention_b = tnn.Sequential(tnn.Linear(L, D), tnn.Sigmoid())
        self.attention_c = tnn.Linear(D, 1)

    def forward(self, x):
        return self.attention_c(self.attention_a(x) * self.attention_b(x)), x


class TorchMMAttentionMIL(tnn.Module):
    """Replica of ref MM_MIL_Attention_fc_surv, mode=radio_path_omic,
    radio_fusion=concat, fusion=tensor (model_mm_attention_mil.py:34-200,
    with the undefined-``size_path`` bug fixed the same way the rebuild
    fixes it)."""

    def __init__(self, input_dim=36, n_modalities=4, n_classes=4):
        super().__init__()
        self.fc_omic = tnn.Sequential(
            tnn.Sequential(tnn.Linear(input_dim, 256), tnn.SELU(),
                           tnn.AlphaDropout(0.25)),
            tnn.Sequential(tnn.Linear(256, 256), tnn.SELU(),
                           tnn.AlphaDropout(0.25)))
        self.attention_net_radio = tnn.Sequential(
            tnn.Linear(1024, 256), tnn.ReLU(), tnn.Dropout(0.25),
            TorchGatedAttn())
        self.reduce_dim = tnn.Linear(1024 * n_modalities, 1024)
        self.attention_net_WSI = tnn.Sequential(
            tnn.Linear(1024, 256), tnn.ReLU(), tnn.Dropout(0.25),
            TorchGatedAttn())
        self.mm = TorchXlinearFusion(dim=256, scale_dim=16, mmhid1=512,
                                     mmhid2=512, num_modalities=3, skip=1)
        self.classifier = tnn.Sequential(
            tnn.Linear(512, 256), tnn.ReLU(), tnn.Dropout(0.25),
            tnn.Linear(256, n_classes))

    def forward(self, radio_cat, path_bag, genomic):
        h_r = self.reduce_dim(radio_cat)
        A_r, h_r = self.attention_net_radio(h_r)
        A_r = torch.softmax(A_r.T, dim=1)
        M_r = A_r @ h_r
        A_p, h_p = self.attention_net_WSI(path_bag)
        A_p = torch.softmax(A_p.T, dim=1)
        M_p = A_p @ h_p
        O = self.fc_omic(genomic.unsqueeze(0))
        MM = self.mm([M_r, M_p, O])
        logits = self.classifier(MM)
        hazards = torch.sigmoid(logits)
        S = torch.cumprod(1 - hazards, dim=1)
        return hazards, S


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _warm_bn(tm, make_inputs, steps=3):
    """Run a few train-mode forwards so BN running stats are nontrivial."""
    tm.train()
    with torch.no_grad():
        for _ in range(steps):
            tm(*make_inputs())
    tm.eval()


def _head_spec(train_type, bag_loss, multimodal=True):
    return ti.build_spec("mm_attention_mil" if multimodal else "unimodal",
                         pretrained=True, mode="radio_path_omic"
                         if multimodal else "omic",
                         train_type=train_type, bag_loss=bag_loss)


# ---------------------------------------------------------------------------
# stage-4 heads: torch -> flax forward parity (incl. BN running stats)
# ---------------------------------------------------------------------------

def test_unimodal_highway_parity(rng):
    tm = TorchMMUnimodalHighway()
    _warm_bn(tm, lambda: (torch.randn(16, 256),))
    x = rng.normal(size=(6, 256)).astype(np.float32)
    with torch.no_grad():
        _, h_ref, S_ref = tm(torch.tensor(x))
    model = UnimodalPretrained(mode="omic", train_type="highway",
                               bag_loss="nll_surv")
    variables = model.init(KEY, h_omic=jnp.asarray(x))
    spec = _head_spec("highway", "nll_surv", multimodal=False)
    variables = ti.torch_to_variables(spec, tm.state_dict(), variables)
    out = model.apply(variables, h_omic=jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out["hazards"]), h_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["S"]), S_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_multimodal_early_fcnn_parity(rng):
    tm = TorchMMEarlyFcnn()
    _warm_bn(tm, lambda: (torch.randn(16, 256), torch.randn(16, 256),
                          torch.randn(16, 256)))
    hs = [rng.normal(size=(5, 256)).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        _, h_ref, S_ref = tm(*map(torch.tensor, hs))
    model = MultimodalPretrained(mode="radio_path_omic",
                                 train_type="early-fcnn",
                                 bag_loss="nll_surv")
    jhs = dict(h_radio=jnp.asarray(hs[0]), h_path=jnp.asarray(hs[1]),
               h_omic=jnp.asarray(hs[2]))
    variables = model.init(KEY, **jhs)
    spec = _head_spec("early-fcnn", "nll_surv")
    variables = ti.torch_to_variables(spec, tm.state_dict(), variables)
    out = model.apply(variables, **jhs)
    np.testing.assert_allclose(np.asarray(out["hazards"]), h_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["S"]), S_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_multimodal_kronecker_parity(rng):
    tm = TorchMMKronecker()
    tm.eval()
    hs = [rng.normal(size=(5, 256)).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        r_ref, h_ref, S_ref = tm(*map(torch.tensor, hs))
    model = MultimodalPretrained(mode="radio_path_omic",
                                 train_type="kronecker",
                                 bag_loss="nll_surv")
    jhs = dict(h_radio=jnp.asarray(hs[0]), h_path=jnp.asarray(hs[1]),
               h_omic=jnp.asarray(hs[2]))
    variables = model.init(KEY, **jhs)
    spec = _head_spec("kronecker", "nll_surv")
    variables = ti.torch_to_variables(spec, tm.state_dict(), variables)
    out = model.apply(variables, **jhs)
    np.testing.assert_allclose(np.asarray(out["hazards"]), h_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["risk"]).reshape(-1),
                               r_ref.numpy().reshape(-1), rtol=1e-4,
                               atol=1e-5)


def test_multimodal_late_fcnn_cox_parity(rng):
    tm = TorchMMLateFcnnCox()
    _warm_bn(tm, lambda: (torch.randn(16, 256), torch.randn(16, 256),
                          torch.randn(16, 256)))
    hs = [rng.normal(size=(5, 256)).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        r_ref = tm(*map(torch.tensor, hs))
    model = MultimodalPretrained(mode="radio_path_omic",
                                 train_type="late-fcnn",
                                 bag_loss="cox_surv")
    jhs = dict(h_radio=jnp.asarray(hs[0]), h_path=jnp.asarray(hs[1]),
               h_omic=jnp.asarray(hs[2]))
    variables = model.init(KEY, **jhs)
    spec = _head_spec("late-fcnn", "cox_surv")
    variables = ti.torch_to_variables(spec, tm.state_dict(), variables)
    out = model.apply(variables, **jhs)
    np.testing.assert_allclose(np.asarray(out["risk"]).reshape(-1),
                               r_ref.numpy().reshape(-1), rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# trimodal fusion model: torch -> flax forward parity
# ---------------------------------------------------------------------------

def test_mm_attention_mil_parity(rng):
    tm = TorchMMAttentionMIL(input_dim=36)
    tm.eval()
    n_r, n_p = 12, 25
    radio = [rng.normal(size=(n_r, 1024)).astype(np.float32)
             for _ in range(4)]
    radio_cat = np.concatenate(radio, axis=1)
    path = rng.normal(size=(n_p, 1024)).astype(np.float32)
    genomic = rng.normal(size=(36,)).astype(np.float32)
    with torch.no_grad():
        h_ref, S_ref = tm(torch.tensor(radio_cat), torch.tensor(path),
                          torch.tensor(genomic))

    model = MMAttentionMIL(mode="radio_path_omic", n_modalities=4,
                           omic_input_dim=36, fusion="tensor",
                           radio_fusion="concat")
    inputs = dict(radio_bags=jnp.asarray(radio_cat)[None],
                  radio_mask=jnp.ones((1, n_r), jnp.float32),
                  path_bags=jnp.asarray(path)[None],
                  path_mask=jnp.ones((1, n_p), jnp.float32),
                  genomic=jnp.asarray(genomic)[None])
    variables = model.init(KEY, **inputs)
    spec = ti.build_spec("mm_attention_mil", mode="radio_path_omic",
                         fusion="tensor", radio_fusion="concat",
                         n_modalities=4)
    variables = ti.torch_to_variables(spec, tm.state_dict(), variables)
    out = model.apply(variables, **inputs)
    np.testing.assert_allclose(np.asarray(out["hazards"]), h_ref.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["S"]), S_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# flax -> torch: strict load + round-trip through .pt files
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("train_type,bag_loss,torch_cls", [
    ("early-fcnn", "nll_surv", TorchMMEarlyFcnn),
    ("kronecker", "nll_surv", TorchMMKronecker),
    ("late-fcnn", "cox_surv", TorchMMLateFcnnCox),
])
def test_export_strict_loads_into_reference_shape(rng, train_type, bag_loss,
                                                  torch_cls):
    """The exported state_dict must match the reference layout key-for-key
    (load_state_dict(strict=True))."""
    model = MultimodalPretrained(mode="radio_path_omic",
                                 train_type=train_type, bag_loss=bag_loss)
    jhs = {k: jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
           for k in ("h_radio", "h_path", "h_omic")}
    variables = model.init(KEY, **jhs)
    spec = _head_spec(train_type, bag_loss)
    sd = ti.variables_to_torch(spec, variables)
    tm = torch_cls()
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    if bag_loss == "cox_surv":
        with torch.no_grad():
            r_ref = tm(*[torch.tensor(np.asarray(jhs[k]))
                         for k in ("h_radio", "h_path", "h_omic")])
        out = model.apply(variables, **jhs)
        np.testing.assert_allclose(np.asarray(out["risk"]).reshape(-1),
                                   r_ref.numpy().reshape(-1), rtol=1e-4,
                                   atol=1e-5)


def test_mm_attention_mil_export_strict(rng):
    model = MMAttentionMIL(mode="radio_path_omic", n_modalities=4,
                           omic_input_dim=36, fusion="tensor",
                           radio_fusion="concat")
    inputs = dict(radio_bags=jnp.zeros((1, 4, 4096)),
                  radio_mask=jnp.ones((1, 4)),
                  path_bags=jnp.zeros((1, 5, 1024)),
                  path_mask=jnp.ones((1, 5)),
                  genomic=jnp.zeros((1, 36)))
    variables = model.init(KEY, **inputs)
    spec = ti.build_spec("mm_attention_mil", mode="radio_path_omic",
                         fusion="tensor", radio_fusion="concat",
                         n_modalities=4)
    sd = ti.variables_to_torch(spec, variables)
    tm = TorchMMAttentionMIL(input_dim=36)
    tm.load_state_dict(sd, strict=True)


def test_mm_partial_mode_export_strict_fills_inactive_branches(rng):
    """mode='pathomic' export must still strict-load into the reference
    layout: the reference builds attention_net_radio, reduce_dim and
    fc_omic UNCONDITIONALLY (model_mm_attention_mil.py:36-75), so the
    export fills the inactive radio branch with deterministic
    placeholders."""

    class TorchMMPathOmic(tnn.Module):
        def __init__(self, input_dim=36, n_modalities=4, n_classes=4):
            super().__init__()
            self.fc_omic = tnn.Sequential(
                tnn.Sequential(tnn.Linear(input_dim, 256), tnn.SELU(),
                               tnn.AlphaDropout(0.25)),
                tnn.Sequential(tnn.Linear(256, 256), tnn.SELU(),
                               tnn.AlphaDropout(0.25)))
            self.attention_net_radio = tnn.Sequential(
                tnn.Linear(1024, 256), tnn.ReLU(), tnn.Dropout(0.25),
                TorchGatedAttn())
            self.reduce_dim = tnn.Linear(1024 * n_modalities, 1024)
            self.attention_net_WSI = tnn.Sequential(
                tnn.Linear(1024, 256), tnn.ReLU(), tnn.Dropout(0.25),
                TorchGatedAttn())
            self.mm = TorchXlinearFusion(dim=256, scale_dim=16, mmhid1=512,
                                         mmhid2=512, num_modalities=2,
                                         skip=1)
            self.classifier = tnn.Sequential(
                tnn.Linear(512, 256), tnn.ReLU(), tnn.Dropout(0.25),
                tnn.Linear(256, n_classes))

    model = MMAttentionMIL(mode="pathomic", n_modalities=4,
                           omic_input_dim=36, fusion="tensor",
                           radio_fusion="concat")
    inputs = dict(path_bags=jnp.zeros((1, 5, 1024)),
                  path_mask=jnp.ones((1, 5)),
                  genomic=jnp.zeros((1, 36)))
    variables = model.init(KEY, **inputs)
    spec = ti.build_spec("mm_attention_mil", mode="pathomic",
                         fusion="tensor", radio_fusion="concat",
                         n_modalities=4, omic_input_dim=36)
    sd = ti.variables_to_torch(spec, variables)
    tm = TorchMMPathOmic(input_dim=36)
    tm.load_state_dict(sd, strict=True)
    # fillers are deterministic: re-export produces identical bytes
    sd2 = ti.variables_to_torch(spec, variables)
    np.testing.assert_array_equal(
        sd["attention_net_radio.0.weight"].numpy(),
        sd2["attention_net_radio.0.weight"].numpy())
    # and import of the exported file ignores the filler keys
    back = ti.torch_to_variables(spec, sd, variables)
    np.testing.assert_allclose(
        np.asarray(back["params"]["classifier_0"]["kernel"]),
        np.asarray(variables["params"]["classifier_0"]["kernel"]),
        rtol=1e-6)


def test_mm_tensor_radio_fusion_fill_strict(rng):
    """radio_fusion='tensor' with no radio branch in the mode: the
    reference still builds radio_xfusion (model_mm_attention_mil.py:57),
    so the export must fill its full XlinearFusion key set."""

    class TorchMMPathOmicTensorRadio(tnn.Module):
        def __init__(self, input_dim=36, n_classes=4):
            super().__init__()
            self.fc_omic = tnn.Sequential(
                tnn.Sequential(tnn.Linear(input_dim, 256), tnn.SELU(),
                               tnn.AlphaDropout(0.25)),
                tnn.Sequential(tnn.Linear(256, 256), tnn.SELU(),
                               tnn.AlphaDropout(0.25)))
            self.attention_net_radio = tnn.Sequential(
                tnn.Linear(1024, 256), tnn.ReLU(), tnn.Dropout(0.25),
                TorchGatedAttn())
            # the reference builds this with the DEFAULT num_modalities=4
            # (model_mm_attention_mil.py:57)
            self.radio_xfusion = TorchXlinearFusion(
                dim=1024, scale_dim=64, mmhid1=1024, mmhid2=1024,
                num_modalities=4, skip=0)
            self.attention_net_WSI = tnn.Sequential(
                tnn.Linear(1024, 256), tnn.ReLU(), tnn.Dropout(0.25),
                TorchGatedAttn())
            self.mm = TorchXlinearFusion(dim=256, scale_dim=16,
                                         mmhid1=512, mmhid2=512,
                                         num_modalities=2, skip=1)
            self.classifier = tnn.Sequential(
                tnn.Linear(512, 256), tnn.ReLU(), tnn.Dropout(0.25),
                tnn.Linear(256, n_classes))

    model = MMAttentionMIL(mode="pathomic", n_modalities=2,
                           omic_input_dim=36, fusion="tensor",
                           radio_fusion="tensor")
    inputs = dict(path_bags=jnp.zeros((1, 5, 1024)),
                  path_mask=jnp.ones((1, 5)),
                  genomic=jnp.zeros((1, 36)))
    variables = model.init(KEY, **inputs)
    spec = ti.build_spec("mm_attention_mil", mode="pathomic",
                         fusion="tensor", radio_fusion="tensor",
                         n_modalities=2, omic_input_dim=36)
    sd = ti.variables_to_torch(spec, variables)
    tm = TorchMMPathOmicTensorRadio(input_dim=36)
    tm.load_state_dict(sd, strict=True)


def test_mm_tensor_radio_active_nonquad_fills_ref_shape(rng):
    """radio active with radio_fusion='tensor' but n_modalities != 4:
    our flax model builds a 2-block xfusion, while the reference's is
    ALWAYS 4-block (default num_modalities, model_mm_attention_mil.py:57)
    — the export must emit the reference's 4-block placeholder shapes,
    not our 2-block real params."""

    class TorchRadioOmicTensorRadio(tnn.Module):
        def __init__(self, input_dim=36, n_classes=4):
            super().__init__()
            self.fc_omic = tnn.Sequential(
                tnn.Sequential(tnn.Linear(input_dim, 256), tnn.SELU(),
                               tnn.AlphaDropout(0.25)),
                tnn.Sequential(tnn.Linear(256, 256), tnn.SELU(),
                               tnn.AlphaDropout(0.25)))
            self.attention_net_radio = tnn.Sequential(
                tnn.Linear(1024, 256), tnn.ReLU(), tnn.Dropout(0.25),
                TorchGatedAttn())
            self.radio_xfusion = TorchXlinearFusion(
                dim=1024, scale_dim=64, mmhid1=1024, mmhid2=1024,
                num_modalities=4, skip=0)
            self.attention_net_WSI = tnn.Sequential(
                tnn.Linear(1024, 256), tnn.ReLU(), tnn.Dropout(0.25),
                TorchGatedAttn())
            self.mm = TorchXlinearFusion(dim=256, scale_dim=16,
                                         mmhid1=512, mmhid2=512,
                                         num_modalities=2, skip=1)
            self.classifier = tnn.Sequential(
                tnn.Linear(512, 256), tnn.ReLU(), tnn.Dropout(0.25),
                tnn.Linear(256, n_classes))

    model = MMAttentionMIL(mode="radioomic", n_modalities=2,
                           omic_input_dim=36, fusion="tensor",
                           radio_fusion="tensor")
    inputs = dict(radio_bags=jnp.zeros((1, 4, 2048)),
                  radio_mask=jnp.ones((1, 4)),
                  genomic=jnp.zeros((1, 36)))
    variables = model.init(KEY, **inputs)
    spec = ti.build_spec("mm_attention_mil", mode="radioomic",
                         fusion="tensor", radio_fusion="tensor",
                         n_modalities=2, omic_input_dim=36)
    sd = ti.variables_to_torch(spec, variables)
    tm = TorchRadioOmicTensorRadio(input_dim=36)
    tm.load_state_dict(sd, strict=True)


def test_pt_roundtrip_with_spec(tmp_path, rng):
    model = MultimodalPretrained(mode="radio_path_omic",
                                 train_type="early-fcnn",
                                 bag_loss="nll_surv")
    jhs = {k: jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
           for k in ("h_radio", "h_path", "h_omic")}
    variables = model.init(KEY, **jhs)
    out1 = model.apply(variables, **jhs)
    spec = _head_spec("early-fcnn", "nll_surv")
    p = str(tmp_path / "head.pt")
    ti.export_pt(p, spec, variables)
    fresh = model.init(jax.random.PRNGKey(7), **jhs)
    variables2 = ti.import_pt(p, spec, fresh)
    out2 = model.apply(variables2, **jhs)
    np.testing.assert_allclose(np.asarray(out1["risk"]),
                               np.asarray(out2["risk"]), rtol=1e-6)
