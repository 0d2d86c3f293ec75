"""captum.attr shim: a faithful torch implementation of
IntegratedGradients with captum's default Gauss-Legendre quadrature
(method='gausslegendre', the default the reference relies on at
create_attributions.py:96,116 with n_steps=20).

IG_i = (x_i - x0_i) * sum_k w_k * grad_i f(x0 + a_k (x - x0)), with
(a_k, w_k) the n-point Gauss-Legendre rule mapped onto [0, 1] — the
same node/weight construction captum uses
(numpy.polynomial.legendre.leggauss scaled by (a+1)/2, w/2)."""
import numpy as np
import torch


class IntegratedGradients:
    def __init__(self, forward_func):
        self.forward_func = forward_func

    def attribute(self, inputs, baselines=None, n_steps=50,
                  method="gausslegendre"):
        is_tuple = isinstance(inputs, tuple)
        inputs = inputs if is_tuple else (inputs,)
        inputs = tuple(torch.as_tensor(x) for x in inputs)
        if baselines is None:
            baselines = tuple(torch.zeros_like(x) for x in inputs)
        elif not isinstance(baselines, tuple):
            baselines = (baselines,)

        if method == "gausslegendre":
            a, w = np.polynomial.legendre.leggauss(n_steps)
            alphas, weights = (a + 1.0) / 2.0, w / 2.0
        elif method == "riemann_middle":
            alphas = (np.arange(1, n_steps + 1) - 0.5) / n_steps
            weights = np.full(n_steps, 1.0 / n_steps)
        else:
            raise NotImplementedError(method)

        totals = [torch.zeros_like(x) for x in inputs]
        for alpha, wt in zip(alphas, weights):
            scaled = tuple(
                (b + float(alpha) * (x - b)).clone().detach()
                .requires_grad_(True)
                for x, b in zip(inputs, baselines))
            out = self.forward_func(*scaled)
            grads = torch.autograd.grad(torch.sum(out), scaled)
            for t, g in zip(totals, grads):
                t += float(wt) * g
        attrs = tuple((x - b) * t
                      for x, b, t in zip(inputs, baselines, totals))
        return attrs if is_tuple else attrs[0]


class LayerConductance:
    """Imported by the reference but never called in the attribution
    path; kept as a loud stub."""

    def __init__(self, *a, **k):
        raise NotImplementedError(
            "LayerConductance is not part of the shim")


class GradientShap:
    """Imported by ref create_heatmaps.py:31 but only the omic branch
    constructs it (the radio parity path never does)."""

    def __init__(self, *a, **k):
        raise NotImplementedError("GradientShap is not part of the shim")


class NoiseTunnel:
    """Imported by ref utils_ig.py:15 but unused on the parity paths."""

    def __init__(self, *a, **k):
        raise NotImplementedError("NoiseTunnel is not part of the shim")


class _Visualization:
    def __getattr__(self, name):
        raise NotImplementedError(
            f"captum.attr.visualization.{name} is not part of the shim")


visualization = _Visualization()
