"""Integrated gradients — the jax.grad replacement for the reference's
Captum IntegratedGradients usage (ref create_attributions.py:43-50,
n_steps=20; captum closures in models/*_pretrained.py:200-320).

``integrated_gradients`` works on any scalar-output function of one or
more input arrays: IG_i = (x_i - x0_i) * sum_k w_k grad_i f(x0 + a_k (x-x0)).
The default quadrature is Gauss-Legendre with n_steps nodes — exactly
Captum's IntegratedGradients default (method='gausslegendre'), which is
what the reference runs; 'riemann_middle' is also available.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _quadrature(n_steps: int, method: str):
    """(alphas, weights) on [0, 1] summing attributions as
    sum_k w_k grad(x0 + a_k dx)."""
    if method == "gausslegendre":
        a, w = np.polynomial.legendre.leggauss(n_steps)
        return ((np.asarray(a) + 1.0) / 2.0).astype(np.float32), \
            (np.asarray(w) / 2.0).astype(np.float32)
    if method == "riemann_middle":
        a = (np.arange(1, n_steps + 1) - 0.5) / n_steps
        return a.astype(np.float32), np.full(n_steps, 1.0 / n_steps,
                                             np.float32)
    raise NotImplementedError(method)


def integrated_gradients(fn: Callable, inputs: Sequence[jax.Array],
                         baselines: Sequence[jax.Array] = None,
                         n_steps: int = 20,
                         method: str = "gausslegendre"
                         ) -> Tuple[jax.Array, ...]:
    """IG for a scalar (or batch-of-scalars summed) function over a tuple
    of inputs.  Returns one attribution array per input.

    The interpolation loop is a lax.scan over quadrature nodes — one
    compiled program regardless of n_steps.
    """
    inputs = tuple(jnp.asarray(x) for x in inputs)
    if baselines is None:
        baselines = tuple(jnp.zeros_like(x) for x in inputs)
    else:
        baselines = tuple(jnp.asarray(b) for b in baselines)

    grad_fn = jax.grad(lambda xs: jnp.sum(fn(*xs)))

    alphas, weights = _quadrature(n_steps, method)

    def body(acc, aw):
        alpha, w = aw
        xs = tuple(b + alpha * (x - b)
                   for x, b in zip(inputs, baselines))
        g = grad_fn(xs)
        return tuple(a + w * gi for a, gi in zip(acc, g)), None

    init = tuple(jnp.zeros_like(x) for x in inputs)
    total, _ = jax.lax.scan(body, init,
                            (jnp.asarray(alphas), jnp.asarray(weights)))
    return tuple((x - b) * t
                 for x, b, t in zip(inputs, baselines, total))


def expected_gradients(fn: Callable, x: jax.Array, background: jax.Array,
                       n_samples: int = 200, seed: int = 0) -> jax.Array:
    """SHAP GradientExplainer semantics (expected gradients) — the
    attribution the reference computes for omics
    (create_heatmaps.py:173-175: shap.GradientExplainer(model, train)):

        attr_i = E_{b ~ background, a ~ U(0,1)}
                   [(x_i - b_i) * d f / d x_i (b + a (x - b))]

    ``x`` [B, G] samples, ``background`` [M, G] reference rows (the
    reference passes the TRAIN design matrix).  One lax.scan step per
    Monte-Carlo draw; each step evaluates the whole batch."""
    x = jnp.asarray(x)
    background = jnp.asarray(background)
    grad_fn = jax.grad(lambda xs: jnp.sum(fn(xs)))
    key = jax.random.PRNGKey(seed)
    bidx = jax.random.randint(key, (n_samples, x.shape[0]), 0,
                              background.shape[0])
    alphas = jax.random.uniform(jax.random.fold_in(key, 1),
                                (n_samples, x.shape[0]))

    def body(acc, ba):
        bi, alpha = ba
        b = background[bi]                       # [B, G]
        pt = b + alpha[:, None] * (x - b)
        g = grad_fn(pt)
        return acc + (x - b) * g, None

    init = jnp.zeros_like(x)
    total, _ = jax.lax.scan(body, init, (bidx, alphas))
    return total / n_samples


def modality_attributions(fn: Callable, inputs: Sequence[jax.Array],
                          names: Sequence[str], n_steps: int = 20):
    """Per-modality |IG| sums (ref create_attributions.py:118-160 computes
    sum of |attr| per modality per subject).  Returns {name: [B]}."""
    attrs = integrated_gradients(fn, inputs, n_steps=n_steps)
    out = {}
    for name, a in zip(names, attrs):
        axes = tuple(range(1, a.ndim))
        out[name] = np.asarray(jnp.sum(jnp.abs(a), axis=axes))
    return out


def completeness_gap(fn: Callable, inputs, attrs, baselines=None) -> float:
    """IG sanity check: sum(attr) ~= f(x) - f(x0)."""
    inputs = tuple(jnp.asarray(x) for x in inputs)
    if baselines is None:
        baselines = tuple(jnp.zeros_like(x) for x in inputs)
    fx = float(jnp.sum(fn(*inputs)))
    f0 = float(jnp.sum(fn(*baselines)))
    total = sum(float(jnp.sum(a)) for a in attrs)
    return abs(total - (fx - f0))
