"""Golden tests: JAX losses vs a direct torch re-implementation of the
reference formulas (/root/reference/utils/loss_utils.py — reimplemented
here from the published equations, not copied)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from multimodalfusion_tpu import losses


def torch_nll(hazards, S, Y, c, alpha, eps=1e-7):
    B = len(Y)
    Y = Y.view(B, 1)
    c = c.view(B, 1).float()
    if S is None:
        S = torch.cumprod(1 - hazards, dim=1)
    S_pad = torch.cat([torch.ones_like(c), S], 1)
    unc = -(1 - c) * (torch.log(torch.gather(S_pad, 1, Y).clamp(min=eps))
                      + torch.log(torch.gather(hazards, 1, Y).clamp(min=eps)))
    cen = -c * torch.log(torch.gather(S_pad, 1, Y + 1).clamp(min=eps))
    return ((1 - alpha) * (cen + unc) + alpha * unc).mean()


def torch_ce(hazards, S, Y, c, alpha, eps=1e-7):
    B = len(Y)
    Y = Y.view(B, 1)
    c = c.view(B, 1).float()
    if S is None:
        S = torch.cumprod(1 - hazards, dim=1)
    S_pad = torch.cat([torch.ones_like(c), S], 1)
    reg = -(1 - c) * (torch.log(torch.gather(S_pad, 1, Y) + eps)
                      + torch.log(torch.gather(hazards, 1, Y).clamp(min=eps)))
    ce_l = (-c * torch.log(torch.gather(S, 1, Y).clamp(min=eps))
            - (1 - c) * torch.log(1 - torch.gather(S, 1, Y).clamp(min=eps)))
    return ((1 - alpha) * ce_l + alpha * reg).mean()


def torch_cox(risks, times, c):
    n = len(times)
    R = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            R[i, j] = float(times[j] >= times[i])
    R = torch.tensor(R, dtype=torch.float32)
    theta = risks.reshape(-1)
    exp_theta = torch.exp(theta)
    return -torch.mean(
        (theta - torch.log(torch.sum(exp_theta * R, dim=1))) * (1 - c))


def torch_ranking(risks, times, c, phi="sigmoid", reduction="mean"):
    from itertools import combinations
    events = 1 - c
    more, less = [], []
    for a, b in combinations(range(len(times)), 2):
        if times[a] < times[b] and events[a]:
            more.append(risks[a]); less.append(risks[b])
        elif times[b] < times[a] and events[b]:
            more.append(risks[b]); less.append(risks[a])
    if not less:
        return torch.zeros(1)
    r = torch.stack(more) - torch.stack(less)
    vals = torch.sigmoid(r) if phi == "sigmoid" else torch.relu(r)
    return -vals.mean() if reduction == "mean" else -vals.sum()


def make_batch(rng, B=6, K=4):
    hazards = rng.uniform(0.05, 0.9, size=(B, K)).astype(np.float32)
    S = np.cumprod(1 - hazards, axis=1).astype(np.float32)
    Y = rng.integers(0, K, size=B)
    c = rng.integers(0, 2, size=B).astype(np.float32)
    t = rng.uniform(1, 100, size=B).astype(np.float32)
    risks = rng.normal(size=B).astype(np.float32)
    return hazards, S, Y, c, t, risks


@pytest.mark.parametrize("alpha", [0.0, 0.15, 0.4])
def test_nll_matches_torch(rng, alpha):
    hazards, S, Y, c, t, risks = make_batch(rng)
    ours = losses.nll_loss(jnp.array(hazards), jnp.array(S),
                           jnp.array(Y), jnp.array(c), alpha=alpha)
    ref = torch_nll(torch.tensor(hazards), torch.tensor(S),
                    torch.tensor(Y), torch.tensor(c), alpha)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_nll_none_survival(rng):
    hazards, S, Y, c, t, risks = make_batch(rng)
    ours = losses.nll_loss(jnp.array(hazards), None, jnp.array(Y),
                           jnp.array(c), alpha=0.15)
    ref = torch_nll(torch.tensor(hazards), None, torch.tensor(Y),
                    torch.tensor(c), 0.15)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.parametrize("alpha", [0.0, 0.15])
def test_ce_matches_torch(rng, alpha):
    hazards, S, Y, c, t, risks = make_batch(rng)
    ours = losses.ce_loss(jnp.array(hazards), jnp.array(S), jnp.array(Y),
                          jnp.array(c), alpha=alpha)
    ref = torch_ce(torch.tensor(hazards), torch.tensor(S), torch.tensor(Y),
                   torch.tensor(c), alpha)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_cox_matches_torch(rng):
    hazards, S, Y, c, t, risks = make_batch(rng, B=8)
    ours = losses.cox_loss(jnp.array(risks), jnp.array(t), jnp.array(c))
    ref = torch_cox(torch.tensor(risks), t, torch.tensor(c))
    np.testing.assert_allclose(float(ours), float(ref), rtol=5e-5)


def test_cox_with_ties(rng):
    risks = np.array([0.1, -0.4, 0.3, 0.3], np.float32)
    t = np.array([5.0, 5.0, 2.0, 8.0], np.float32)
    c = np.array([0, 1, 0, 0], np.float32)
    ours = losses.cox_loss(jnp.array(risks), jnp.array(t), jnp.array(c))
    ref = torch_cox(torch.tensor(risks), t, torch.tensor(c))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.parametrize("phi", ["sigmoid", "relu"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_ranking_matches_torch(rng, phi, reduction):
    hazards, S, Y, c, t, risks = make_batch(rng, B=7)
    ours = losses.ranking_loss(jnp.array(risks), jnp.array(t), jnp.array(c),
                               phi=phi, reduction=reduction)
    ref = torch_ranking(torch.tensor(risks), t, c, phi, reduction)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-7)


def test_ranking_no_comparable_pairs():
    # everyone censored -> no pairs -> 0 (ref loss_utils.py:84-85)
    risks = jnp.array([0.5, -0.2, 0.1])
    t = jnp.array([1.0, 2.0, 3.0])
    c = jnp.array([1.0, 1.0, 1.0])
    assert float(losses.ranking_loss(risks, t, c)) == 0.0


def test_ranking_nll_combination(rng):
    hazards, S, Y, c, t, risks = make_batch(rng, B=6)
    ours = losses.ranking_nll_loss(jnp.array(hazards), jnp.array(risks),
                                   jnp.array(S), jnp.array(Y), jnp.array(c),
                                   alpha=0.15, nll_ratio=0.2)
    # reference quirk: ranking uses Y as times (loss_utils.py:159)
    ref = (torch_ranking(torch.tensor(risks), Y.astype(np.float32), c)
           + 0.2 * torch_nll(torch.tensor(hazards), torch.tensor(S),
                             torch.tensor(Y), torch.tensor(c), 0.15))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_valid_mask_equals_subset(rng):
    """Loss over padded batch with valid mask == loss over the subset."""
    hazards, S, Y, c, t, risks = make_batch(rng, B=8)
    valid = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    sub = slice(0, 5)
    for name in ["nll_surv", "ce_surv", "cox_surv", "ranking_surv"]:
        spec = losses.LossSpec(name, alpha=0.15)
        full = spec.apply(hazards=jnp.array(hazards), S=jnp.array(S),
                          risks=jnp.array(risks), Y=jnp.array(Y),
                          times=jnp.array(t), c=jnp.array(c),
                          valid=jnp.array(valid))
        part = spec.apply(hazards=jnp.array(hazards[sub]), S=jnp.array(S[sub]),
                          risks=jnp.array(risks[sub]), Y=jnp.array(Y[sub]),
                          times=jnp.array(t[sub]), c=jnp.array(c[sub]))
        np.testing.assert_allclose(float(full), float(part), rtol=1e-5,
                                   err_msg=name)


def test_l1_reg():
    params = {"a": jnp.array([1.0, -2.0]), "b": {"w": jnp.array([[3.0]])}}
    assert float(losses.l1_reg(params)) == 6.0
    assert float(losses.l1_reg_subtree(params, ("b",))) == 3.0


def test_cox_padded_extreme_risk_is_ignored(rng):
    """A huge risk value in a padded (valid=0) row must not corrupt the
    masked Cox loss (regression: unmasked max-shift underflow)."""
    risks = np.array([0.1, -0.4, 0.3, 0.2, -0.1, 0.5], np.float32)
    t = rng.uniform(1, 50, 6).astype(np.float32)
    c = np.zeros(6, np.float32)
    base = losses.cox_loss(jnp.array(risks), jnp.array(t), jnp.array(c))
    padded_r = np.concatenate([risks, [100.0, -100.0]]).astype(np.float32)
    padded_t = np.concatenate([t, [1.0, 2.0]]).astype(np.float32)
    padded_c = np.concatenate([c, [0.0, 0.0]]).astype(np.float32)
    valid = np.array([1] * 6 + [0, 0], np.float32)
    padded = losses.cox_loss(jnp.array(padded_r), jnp.array(padded_t),
                             jnp.array(padded_c), valid=jnp.array(valid))
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-5)
