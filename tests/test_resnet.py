"""ResNet50-trunc parity: the flax model with a ported torchvision-format
state_dict must reproduce a torch reference implementation of the same
architecture (bottleneck ResNet-50 cut after layer3 + global avg pool)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from multimodalfusion_tpu.models import resnet


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, width, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50Trunc(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for stage, (n, width) in enumerate(zip((3, 4, 6), (64, 128, 256)),
                                           start=1):
            blocks = []
            for i in range(n):
                stride = 2 if (i == 0 and stage > 1) else 1
                ds = None
                if i == 0:
                    ds = tnn.Sequential(
                        tnn.Conv2d(inplanes, width * 4, 1, stride=stride,
                                   bias=False),
                        tnn.BatchNorm2d(width * 4))
                blocks.append(TorchBottleneck(inplanes, width, stride, ds))
                inplanes = width * 4
            setattr(self, f"layer{stage}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchResNet50Trunc()
    # randomize BN running stats so the test exercises the stats port
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def test_port_and_forward_parity(torch_model):
    variables = resnet.port_torch_state_dict(torch_model.state_dict())
    model = resnet.ResNet50Trunc()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    out = model.apply(variables, jnp.asarray(x))
    assert out.shape == (2, 1024)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-3,
                               atol=2e-4)


def test_s2d_stem_equals_plain_stem(torch_model):
    """The space-to-depth stem (models/resnet.py::_Stem, MLPerf TPU
    trick) must produce the same embeddings as the canonical 7x7
    stride-2 conv from the SAME ported torchvision weights."""
    variables = resnet.port_torch_state_dict(torch_model.state_dict())
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 224, 224, 3)).astype(np.float32))
    plain = resnet.ResNet50Trunc().apply(variables, x)
    s2d = resnet.ResNet50Trunc(s2d_stem=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)
    # odd spatial dims can't be space-to-depth'd: falls back cleanly
    xo = jnp.asarray(rng.normal(size=(1, 63, 63, 3)).astype(np.float32))
    plain_o = resnet.ResNet50Trunc().apply(variables, xo)
    s2d_o = resnet.ResNet50Trunc(s2d_stem=True).apply(variables, xo)
    np.testing.assert_allclose(np.asarray(s2d_o), np.asarray(plain_o),
                               rtol=1e-5, atol=1e-6)


def test_random_init_shapes():
    import jax
    model = resnet.ResNet50Trunc()
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 1024)


def test_port_consumes_only_trunc_keys(torch_model):
    sd = dict(torch_model.state_dict())
    # extra torchvision keys (layer4/fc) must be ignored
    sd["layer4.0.conv1.weight"] = torch.zeros(512, 1024, 1, 1)
    sd["fc.weight"] = torch.zeros(1000, 2048)
    variables = resnet.port_torch_state_dict(sd)
    assert "layer4_0" not in variables["params"]


def test_preprocess_images():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(2, 256, 256, 3), dtype=np.uint8)
    out = resnet.preprocess_images(imgs)
    assert out.shape == (2, 224, 224, 3)
    # spot-check one pixel against manual normalize
    crop = imgs[:, 16:240, 16:240, :].astype(np.float32) / 255.0
    ref = (crop - resnet.IMAGENET_MEAN) / resnet.IMAGENET_STD
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
