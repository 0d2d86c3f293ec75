"""Train-step parity vs the reference's torch semantics: identical
initial weights, identical batch, one Adam step with weight decay ->
parameters must match to float32 tolerance.

This is the strongest available stand-in for the c-index-parity north
star without the reference's GPU/data: it proves loss formulas,
gradients, and optimizer updates coincide step-for-step."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp
import optax

from multimodalfusion_tpu import losses
from multimodalfusion_tpu.models import MaxNet
from multimodalfusion_tpu.utils import torch_interop as ti

LR, WD = 1e-3, 1e-5


class TorchMaxNetCox(tnn.Module):
    """Reference MaxNet with cox head (model_genomic.py, eval-mode
    forward: SELU blocks without alpha dropout)."""

    def __init__(self, input_dim):
        super().__init__()
        self.fc_omic = tnn.Sequential(
            tnn.Sequential(tnn.Linear(input_dim, 256), tnn.SELU()),
            tnn.Sequential(tnn.Linear(256, 256), tnn.SELU()))
        self.classifier = tnn.Linear(256, 1)

    def forward(self, x):
        return self.classifier(self.fc_omic(x)).squeeze(-1)


def torch_cox_loss(risks, times, c):
    n = len(times)
    R = torch.tensor((times.numpy()[None, :] >= times.numpy()[:, None])
                     .astype(np.float32))
    theta = risks.reshape(-1)
    return -torch.mean(
        (theta - torch.log(torch.sum(torch.exp(theta) * R, dim=1)))
        * (1 - c))


@pytest.mark.parametrize("n_steps", [1, 5])
def test_adam_step_parity_maxnet_cox(rng, n_steps):
    G, B = 24, 16
    x = rng.normal(size=(B, G)).astype(np.float32)
    t = rng.uniform(1, 100, B).astype(np.float32)
    c = rng.integers(0, 2, B).astype(np.float32)

    # ---- torch side (reference semantics) -----------------------------
    torch.manual_seed(0)
    tm = TorchMaxNetCox(G)
    tm.eval()  # no alpha dropout: deterministic gradients
    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)
    for _ in range(n_steps):
        opt.zero_grad()
        risks = tm(torch.tensor(x))
        loss = torch_cox_loss(risks, torch.tensor(t), torch.tensor(c))
        loss.backward()
        opt.step()
    torch_loss = float(loss)

    # ---- jax side: same init via interop, same optimizer semantics ----
    model = MaxNet(bag_loss="cox_surv", n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # torch state_dict of the *initial* weights
    torch.manual_seed(0)
    tm0 = TorchMaxNetCox(G)
    params = ti.torch_to_flax("max_net", tm0.state_dict(),
                              variables["params"])
    tx = optax.chain(optax.add_decayed_weights(WD),
                     optax.scale_by_adam(),
                     optax.scale(-LR))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, jnp.asarray(x),
                              deterministic=True)
            return losses.cox_loss(out["risk"], jnp.asarray(t),
                                   jnp.asarray(c))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(n_steps):
        params, opt_state, jloss = step(params, opt_state)

    np.testing.assert_allclose(float(jloss), torch_loss, rtol=2e-4)
    ours = ti.flax_to_torch("max_net", params)
    theirs = tm.state_dict()
    for k in theirs:
        # atol 1e-4 = 10% of a single lr-sized Adam update; needed for
        # near-zero-gradient directions (the Cox bias gradient almost
        # cancels, making its update eps/noise-dominated)
        np.testing.assert_allclose(
            ours[k].numpy(), theirs[k].numpy(), rtol=3e-3, atol=1e-4,
            err_msg=f"param {k} diverged after {n_steps} Adam steps")


def test_nll_training_risk_parity(rng):
    """One nll_surv step: risk outputs after the update match torch."""
    G, B, K = 12, 10, 4
    x = rng.normal(size=(B, G)).astype(np.float32)
    Y = rng.integers(0, K, B)
    c = rng.integers(0, 2, B).astype(np.float32)

    class TorchMaxNetNLL(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc_omic = tnn.Sequential(
                tnn.Sequential(tnn.Linear(G, 256), tnn.SELU()),
                tnn.Sequential(tnn.Linear(256, 256), tnn.SELU()))
            self.classifier = tnn.Linear(256, K)

        def forward(self, x):
            logits = self.classifier(self.fc_omic(x))
            hazards = torch.sigmoid(logits)
            S = torch.cumprod(1 - hazards, dim=1)
            return hazards, S

    def torch_nll(hazards, S, Y, c, alpha=0.15, eps=1e-7):
        Yv = torch.tensor(Y).view(-1, 1)
        cv = torch.tensor(c).view(-1, 1)
        S_pad = torch.cat([torch.ones_like(cv), S], 1)
        unc = -(1 - cv) * (
            torch.log(torch.gather(S_pad, 1, Yv).clamp(min=eps))
            + torch.log(torch.gather(hazards, 1, Yv).clamp(min=eps)))
        cen = -cv * torch.log(
            torch.gather(S_pad, 1, Yv + 1).clamp(min=eps))
        return ((1 - alpha) * (cen + unc) + alpha * unc).mean()

    torch.manual_seed(1)
    tm = TorchMaxNetNLL()
    tm.eval()
    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)
    h_t, S_t = tm(torch.tensor(x))
    torch_nll(h_t, S_t, Y, c).backward()
    opt.step()
    with torch.no_grad():
        h_after, S_after = tm(torch.tensor(x))
        risk_after_torch = -S_after.sum(1).numpy()

    model = MaxNet(bag_loss="nll_surv", n_classes=K)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    torch.manual_seed(1)
    tm0 = TorchMaxNetNLL()
    params = ti.torch_to_flax("max_net", tm0.state_dict(),
                              variables["params"])
    tx = optax.chain(optax.add_decayed_weights(WD),
                     optax.scale_by_adam(), optax.scale(-LR))
    opt_state = tx.init(params)

    def loss_fn(p):
        out = model.apply({"params": p}, jnp.asarray(x),
                          deterministic=True)
        return losses.nll_loss(out["hazards"], out["S"], jnp.asarray(Y),
                               jnp.asarray(c), alpha=0.15)
    grads = jax.grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    out = model.apply({"params": params}, jnp.asarray(x),
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out["risk"]), risk_after_torch,
                               rtol=1e-3, atol=1e-5)
