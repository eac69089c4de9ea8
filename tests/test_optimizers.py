"""Optimizer-semantics parity vs torch (the reference's optimizers,
train.py:331-351): SGD+nesterov+wd, Adam (L2-in-gradient, not AdamW),
RMSprop with momentum."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepfluoro_tpu.train import TrainConfig  # noqa: E402
from deepfluoro_tpu.train.step import make_optimizer  # noqa: E402


def _run_jax(cfg, w0, grads, lr):
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        state = state._replace(
            hyperparams={**state.hyperparams, "learning_rate": jnp.asarray(lr, jnp.float32)}
        )
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return np.asarray(params["w"])


def _run_torch(make_opt, w0, grads, wd):
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = make_opt([w])
    for g in grads:
        opt.zero_grad()
        w.grad = torch.from_numpy(g.copy())
        opt.step()
    return w.detach().numpy()


@pytest.fixture
def problem(rng):
    w0 = rng.random(16).astype(np.float32)
    grads = [rng.normal(0, 0.1, 16).astype(np.float32) for _ in range(5)]
    return w0, grads


def test_sgd_nesterov_wd_matches_torch(problem):
    w0, grads = problem
    lr, mom, wd = 0.1, 0.9, 1e-3
    cfg = TrainConfig(optim_type="sgd", init_lr=lr, momentum=mom, nesterov=True, wgt_decay=wd)
    got = _run_jax(cfg, w0, grads, lr)
    want = _run_torch(
        lambda ps: torch.optim.SGD(ps, lr=lr, momentum=mom, nesterov=True, weight_decay=wd),
        w0, grads, wd,
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_plain_sgd_matches_torch(problem):
    w0, grads = problem
    lr = 0.05
    cfg = TrainConfig(optim_type="sgd", init_lr=lr, momentum=0.0, nesterov=False, wgt_decay=0.0)
    got = _run_jax(cfg, w0, grads, lr)
    want = _run_torch(lambda ps: torch.optim.SGD(ps, lr=lr), w0, grads, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_adam_matches_torch(problem):
    w0, grads = problem
    lr, wd = 1e-3, 1e-4
    cfg = TrainConfig(optim_type="adam", init_lr=lr, wgt_decay=wd, lr_sched_meth="none")
    got = _run_jax(cfg, w0, grads, lr)
    want = _run_torch(
        lambda ps: torch.optim.Adam(ps, lr=lr, weight_decay=wd), w0, grads, wd
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rmsprop_matches_torch(problem):
    w0, grads = problem
    lr, mom, wd = 1e-3, 0.9, 1e-4
    cfg = TrainConfig(
        optim_type="rmsprop", init_lr=lr, momentum=mom, wgt_decay=wd, lr_sched_meth="none"
    )
    got = _run_jax(cfg, w0, grads, lr)
    want = _run_torch(
        lambda ps: torch.optim.RMSprop(ps, lr=lr, momentum=mom, weight_decay=wd),
        w0, grads, wd,
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
