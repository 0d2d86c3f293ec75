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
# Highway / Residual (ref model_modules.py:5-59).
# ---------------------------------------------------------------------------

class Highway(nn.Module):
    """BN -> Dropout(0.7) -> N gated highway layers -> BN
    (ref Highway, model_modules.py:5-26)."""
    size: int
    num_layers: int
    f: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn1")(x)
        x = nn.Dropout(0.7, deterministic=deterministic)(x)
        for i in range(self.num_layers):
            gate = jax.nn.sigmoid(Dense(self.size, name=f"gate_{i}")(x))
            nonlinear = self.f(Dense(self.size, name=f"nonlinear_{i}")(x))
            linear = Dense(self.size, name=f"linear_{i}")(x)
            x = gate * nonlinear + (1.0 - gate) * linear
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn2")(x)
        return x


class ResidualBlock(nn.Module):
    """fc-bn-relu-fc-bn + skip (ref ResidualBlock, model_modules.py:28-49)."""
    size: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        out = Dense(self.size)(x)
        out = nn.BatchNorm(use_running_average=deterministic, momentum=0.9)(out)
        out = jax.nn.relu(out)
        out = Dense(self.size)(out)
        out = nn.BatchNorm(use_running_average=deterministic, momentum=0.9)(out)
        return jax.nn.relu(out + residual)


class Residual(nn.Module):
    size: int
    n_layers: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.n_layers):
            x = ResidualBlock(self.size)(x, deterministic)
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
