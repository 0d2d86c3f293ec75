"""Integrated gradients — the jax.grad replacement for the reference's
Captum IntegratedGradients usage (ref create_attributions.py:43-50,
n_steps=20; captum closures in models/*_pretrained.py:200-320).

``integrated_gradients`` works on any scalar-output function of one or
more input arrays: IG_i = (x_i - x0_i) * mean_k grad_i f(x0 + a_k (x-x0))
with the midpoint Riemann rule (matching Captum's 'riemann_trapezoid'
default closely enough at n_steps=20 for attribution ranking parity).
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def integrated_gradients(fn: Callable, inputs: Sequence[jax.Array],
                         baselines: Sequence[jax.Array] = None,
                         n_steps: int = 20) -> Tuple[jax.Array, ...]:
    """IG for a scalar (or batch-of-scalars summed) function over a tuple
    of inputs.  Returns one attribution array per input.

    The interpolation loop is a lax.scan over step coefficients — one
    compiled program regardless of n_steps.
    """
    inputs = tuple(jnp.asarray(x) for x in inputs)
    if baselines is None:
        baselines = tuple(jnp.zeros_like(x) for x in inputs)
    else:
        baselines = tuple(jnp.asarray(b) for b in baselines)

    grad_fn = jax.grad(lambda xs: jnp.sum(fn(*xs)))

    alphas = (jnp.arange(1, n_steps + 1, dtype=jnp.float32) - 0.5) / n_steps

    def body(acc, alpha):
        xs = tuple(b + alpha * (x - b)
                   for x, b in zip(inputs, baselines))
        g = grad_fn(xs)
        return tuple(a + gi for a, gi in zip(acc, g)), None

    init = tuple(jnp.zeros_like(x) for x in inputs)
    total, _ = jax.lax.scan(body, init, alphas)
    return tuple((x - b) * t / n_steps
                 for x, b, t in zip(inputs, baselines, total))


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
