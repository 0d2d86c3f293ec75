"""Shared building blocks (Flax linen), batched equivalents of the
reference's models/model_modules.py.

Weight initialization parity:
  * generic Linear layers: Xavier-normal kernels, zero bias
    (ref utils/utils.py:217 ``initialize_weights``)
  * SNN blocks: normal(0, 1/sqrt(fan_in)) kernels
    (ref utils/utils.py:228 ``init_max_weights``)
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

xavier_normal = jax.nn.initializers.glorot_normal()
snn_normal = jax.nn.initializers.variance_scaling(1.0, "fan_in", "normal")


class Dense(nn.Dense):
    """nn.Dense with the reference's default init (xavier normal, zero
    bias)."""
    kernel_init: Callable = xavier_normal


# ---------------------------------------------------------------------------
# SELU / AlphaDropout SNN block (ref model_modules.py:64-68).
# ---------------------------------------------------------------------------

# SELU fixed point constants (Klambauer et al. 2017)
_SELU_ALPHA = 1.6732632423543772
_SELU_LAMBDA = 1.0507009873554805
_ALPHA_PRIME = -_SELU_LAMBDA * _SELU_ALPHA  # -1.7580993408473766


class AlphaDropout(nn.Module):
    """Self-normalizing dropout for SELU nets (torch nn.AlphaDropout
    semantics): dropped units are set to alpha' and the output is
    affine-corrected to preserve mean/variance."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        p = self.rate
        q = 1.0 - p
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, q, shape=x.shape)
        a = (q + _ALPHA_PRIME ** 2 * q * p) ** -0.5
        b = -a * _ALPHA_PRIME * p
        return a * jnp.where(keep, x, _ALPHA_PRIME) + b


class SNNBlock(nn.Module):
    """Linear -> SELU -> AlphaDropout (ref SNN_Block, model_modules.py:64)."""
    features: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.features, kernel_init=snn_normal,
                     bias_init=jax.nn.initializers.zeros)(x)
        x = jax.nn.selu(x)
        x = AlphaDropout(self.dropout)(x, deterministic)
        return x


# ---------------------------------------------------------------------------
# Mask-aware BatchNorm + Highway / Residual (ref model_modules.py:5-59).
# ---------------------------------------------------------------------------

class MaskedBatchNorm(nn.Module):
    """torch.nn.BatchNorm1d semantics with a row-validity mask.

    Static-shape batches pad partial batches with invalid rows; plain
    BatchNorm would fold the padding into the batch statistics, so in
    training mode statistics are computed over VALID rows only — exactly
    the statistics torch computes on the reference's genuinely smaller
    ragged final batch (ref nll_models_pretrained.py:23,82-103 BN
    layers).  Normalization uses the biased variance, running_var the
    unbiased one, momentum 0.9 == torch's default 0.1.  Variable names
    match flax nn.BatchNorm (params scale/bias, batch_stats mean/var)
    so checkpoint interop is unchanged."""
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, valid=None, use_running_average: bool = True):
        features = x.shape[-1]
        scale = self.param("scale", jax.nn.initializers.ones, (features,))
        bias = self.param("bias", jax.nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            v = (jnp.ones(x.shape[0], x.dtype) if valid is None
                 else valid.astype(x.dtype))
            n = jnp.maximum(jnp.sum(v), 1.0)
            mean = jnp.sum(x * v[:, None], axis=0) / n
            var = jnp.sum(v[:, None] * (x - mean) ** 2, axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class Highway(nn.Module):
    """BN -> Dropout(0.7) -> N gated highway layers -> BN
    (ref Highway, model_modules.py:5-26)."""
    size: int
    num_layers: int
    f: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x, deterministic: bool = True, valid=None):
        x = MaskedBatchNorm(name="bn1")(x, valid, deterministic)
        x = nn.Dropout(0.7, deterministic=deterministic)(x)
        for i in range(self.num_layers):
            gate = jax.nn.sigmoid(Dense(self.size, name=f"gate_{i}")(x))
            nonlinear = self.f(Dense(self.size, name=f"nonlinear_{i}")(x))
            linear = Dense(self.size, name=f"linear_{i}")(x)
            x = gate * nonlinear + (1.0 - gate) * linear
        x = MaskedBatchNorm(name="bn2")(x, valid, deterministic)
        return x


class ResidualBlock(nn.Module):
    """fc-bn-relu-fc-bn + skip (ref ResidualBlock, model_modules.py:28-49)."""
    size: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True, valid=None):
        residual = x
        out = Dense(self.size)(x)
        # explicit names keep the pre-MaskedBatchNorm checkpoint layout
        out = MaskedBatchNorm(name="BatchNorm_0")(out, valid, deterministic)
        out = jax.nn.relu(out)
        out = Dense(self.size)(out)
        out = MaskedBatchNorm(name="BatchNorm_1")(out, valid, deterministic)
        return jax.nn.relu(out + residual)


class Residual(nn.Module):
    size: int
    n_layers: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True, valid=None):
        for i in range(self.n_layers):
            x = ResidualBlock(self.size)(x, deterministic, valid)
        return x


# ---------------------------------------------------------------------------
# Kronecker bilinear fusion (ref XlinearFusion, model_modules.py:113-178).
# ---------------------------------------------------------------------------

class XlinearFusion(nn.Module):
    """Late fusion by iterated Kronecker (outer) products of gated,
    dimensionality-reduced modality embeddings.

    Batched rewrite of the reference: the reference builds the outer
    products with ``torch.bmm`` and a hard-coded ``torch.cuda.FloatTensor``
    ones-append (model_modules.py:164) — here it is an einsum chain on
    [B, dim+1] vectors, device-agnostic.

    Note: the reference's gate=0 branch is broken as shipped (forward
    indexes ``reduce[i][2]`` which only exists when gated,
    model_modules.py:145-163); here gate=0 cleanly skips the gating.
    """
    dim: int = 256
    scale_dim: int = 16
    num_modalities: int = 4
    mmhid1: int = 256
    mmhid2: int = 256
    dropout_rate: float = 0.25
    skip: bool = True
    gate: bool = True

    @nn.compact
    def __call__(self, v_list: Sequence[jax.Array],
                 deterministic: bool = True):
        assert len(v_list) == self.num_modalities
        dim_og, dim = self.dim, self.dim // self.scale_dim
        v_cat = jnp.concatenate(list(v_list), axis=1)
        o_list = []
        for i, v in enumerate(v_list):
            h = jax.nn.relu(Dense(dim, name=f"reduce_{i}_h")(v))
            if self.gate:
                z = Dense(dim, name=f"reduce_{i}_z")(v_cat)
                h = jax.nn.sigmoid(z) * h
            o = jax.nn.relu(Dense(dim, name=f"reduce_{i}_o")(h))
            o = nn.Dropout(self.dropout_rate,
                           deterministic=deterministic)(o)
            ones = jnp.ones((o.shape[0], 1), o.dtype)
            o_list.append(jnp.concatenate([o, ones], axis=1))

        o_fusion = o_list[0]
        for o in o_list[1:]:
            o_fusion = jnp.einsum("bi,bj->bij", o_fusion, o).reshape(
                o.shape[0], -1)

        out = nn.Dropout(self.dropout_rate,
                         deterministic=deterministic)(o_fusion)
        out = jax.nn.relu(Dense(self.mmhid1, name="encoder1")(out))
        out = nn.Dropout(self.dropout_rate, deterministic=deterministic)(out)
        if self.skip:
            out = jnp.concatenate([out] + list(v_list), axis=1)
        out = jax.nn.relu(Dense(self.mmhid2, name="encoder2")(out))
        out = nn.Dropout(self.dropout_rate, deterministic=deterministic)(out)
        return out
