"""multimodal-dropout: branch params freeze when the batch lacks that
modality (ref core_utils_pretrained.py:161-177 semantics)."""
import numpy as np

import jax
import jax.numpy as jnp

from multimodalfusion_tpu.engine.train import (TrainConfig, build_model,
                                               make_optimizer, make_steps,
                                               model_inputs)


def _leaf_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(getattr(p, "key", p)) for p in path): leaf
            for path, leaf in flat}


def test_missing_radio_freezes_radio_branch(rng):
    cfg = TrainConfig(model_type="mm_attention_mil",
                      mode="radio_path_omic",
                      train_type="multimodal-dropout",
                      bag_loss="nll_surv", batch_size=4, pretrained=True)
    model = build_model(cfg)
    assert model.train_type == "late-fcnn"
    tx = make_optimizer(cfg)
    train_step, _ = make_steps(cfg, model, tx)
    B = 4
    batch = {
        "h_radio": np.zeros((B, 256), np.float32),      # missing
        "h_path": rng.normal(size=(B, 256)).astype(np.float32),
        "h_omic": rng.normal(size=(B, 256)).astype(np.float32),
        "Y": rng.integers(0, 4, B).astype(np.int32),
        "t": rng.uniform(1, 50, B).astype(np.float32),
        "c": np.zeros(B, np.float32),
        "valid": np.ones(B, np.float32),
    }
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = dict(model.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                deterministic=True,
                                **model_inputs(cfg, jbatch)))
    opt_state = tx.init(variables["params"])
    before = {k: np.asarray(v).copy()
              for k, v in _leaf_paths(variables["params"]).items()}
    new_vars, _, out = train_step(variables, opt_state, jbatch,
                                  jax.random.PRNGKey(2))

    after = _leaf_paths(new_vars["params"])
    changed_radio = changed_other = 0
    for k in before:
        same = np.allclose(np.asarray(before[k]), np.asarray(after[k]))
        if "MRI" in k:
            assert same, f"radio branch param {k} changed"
            changed_radio += 0 if same else 1
        elif "WSI" in k or "omic" in k:
            changed_other += 0 if same else 1
    assert changed_other > 0  # present branches keep training


def test_all_present_trains_everything(rng):
    cfg = TrainConfig(model_type="mm_attention_mil",
                      mode="radio_path_omic",
                      train_type="multimodal-dropout",
                      bag_loss="nll_surv", batch_size=4, pretrained=True)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    train_step, _ = make_steps(cfg, model, tx)
    B = 4
    batch = {f"h_{m}": rng.normal(size=(B, 256)).astype(np.float32)
             for m in ("radio", "path", "omic")}
    batch.update({"Y": rng.integers(0, 4, B).astype(np.int32),
                  "t": rng.uniform(1, 50, B).astype(np.float32),
                  "c": np.zeros(B, np.float32),
                  "valid": np.ones(B, np.float32)})
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = dict(model.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                deterministic=True,
                                **model_inputs(cfg, jbatch)))
    opt_state = tx.init(variables["params"])
    before = {k: np.asarray(v).copy()
              for k, v in _leaf_paths(variables["params"]).items()}
    new_vars, _, _ = train_step(variables, opt_state, jbatch,
                                jax.random.PRNGKey(2))
    after = _leaf_paths(new_vars["params"])
    n_changed = sum(
        0 if np.allclose(np.asarray(before[k]), np.asarray(after[k]))
        else 1 for k in before)
    assert n_changed >= len(before) - 2  # BN-free head: nearly all move

def test_missing_radio_freezes_adam_moments(rng):
    """torch's requires_grad freeze leaves the frozen branch's Adam
    state untouched; the optax path must match — zeroed grads alone
    would still decay mu/nu and absorb the weight-decay term
    (ref core_utils_pretrained.py:161-177 semantics)."""
    cfg = TrainConfig(model_type="mm_attention_mil",
                      mode="radio_path_omic",
                      train_type="multimodal-dropout",
                      bag_loss="nll_surv", batch_size=4, pretrained=True,
                      reg=1e-3)  # nonzero decay: the polluting term
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    train_step, _ = make_steps(cfg, model, tx)
    B = 4
    batch = {
        "h_radio": np.zeros((B, 256), np.float32),      # missing
        "h_path": rng.normal(size=(B, 256)).astype(np.float32),
        "h_omic": rng.normal(size=(B, 256)).astype(np.float32),
        "Y": rng.integers(0, 4, B).astype(np.int32),
        "t": rng.uniform(1, 50, B).astype(np.float32),
        "c": np.zeros(B, np.float32),
        "valid": np.ones(B, np.float32),
    }
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = dict(model.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)},
                                deterministic=True,
                                **model_inputs(cfg, jbatch)))
    opt_state = tx.init(variables["params"])
    # one warm step with everything present so the moments are nonzero
    full = dict(jbatch)
    full["h_radio"] = jnp.asarray(
        rng.normal(size=(B, 256)).astype(np.float32))
    variables, opt_state, _ = train_step(variables, opt_state, full,
                                         jax.random.PRNGKey(2))
    adam0 = opt_state[1]
    mu0 = _leaf_paths(adam0.mu)
    nu0 = _leaf_paths(adam0.nu)
    assert any(np.any(np.asarray(v) != 0) for k, v in mu0.items()
               if "MRI" in k)
    mu0 = {k: np.asarray(v).copy() for k, v in mu0.items()}
    nu0 = {k: np.asarray(v).copy() for k, v in nu0.items()}
    # frozen step: radio absent
    _, opt_state2, _ = train_step(variables, opt_state, jbatch,
                                  jax.random.PRNGKey(3))
    adam1 = opt_state2[1]
    mu1 = _leaf_paths(adam1.mu)
    nu1 = _leaf_paths(adam1.nu)
    froze = moved = 0
    for k in mu0:
        same = (np.array_equal(mu0[k], np.asarray(mu1[k]))
                and np.array_equal(nu0[k], np.asarray(nu1[k])))
        if "MRI" in k:
            assert same, f"frozen-branch Adam moment {k} moved"
            froze += 1
        elif "WSI" in k or "omic" in k:
            moved += 0 if same else 1
    assert froze > 0 and moved > 0
