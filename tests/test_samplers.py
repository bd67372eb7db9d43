"""Sampler unit tests: Gibbs posterior moments, HMC energy conservation,
acceptance codes, mask invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models import params as P
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.samplers import gibbs
from rs_bann_tpu.samplers.hmc import make_hmc_step
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg


def test_ridge_posterior_moments():
    """Gamma(k + n/2, 2s/(2+s*ssq)) — check mean/var over many draws."""
    key = jax.random.key(0)
    k, s, ssq, n = 2.0, 3.0, 4.0, 10.0
    draws = gibbs.ridge_precision_posterior(
        key, k, s, jnp.full((200_000,), ssq), n
    )
    shape = k + n / 2
    scale = 2 * s / (2 + s * ssq)
    assert float(jnp.mean(draws)) == pytest.approx(shape * scale, rel=0.01)
    assert float(jnp.var(draws)) == pytest.approx(shape * scale**2, rel=0.03)


def test_lasso_posterior_moments():
    key = jax.random.key(1)
    k, s, l1, n = 1.5, 2.0, 3.0, 7.0
    draws = gibbs.lasso_precision_posterior(key, k, s, jnp.full((200_000,), l1), n)
    shape = k + n
    scale = s / (1 + s * l1)
    assert float(jnp.mean(draws)) == pytest.approx(shape * scale, rel=0.01)


def test_error_precision_posterior_conjugacy():
    """Draws from the residual posterior concentrate near 1/var(residual) for
    vague priors and large n."""
    key = jax.random.key(2)
    rng = np.random.default_rng(0)
    res = jnp.asarray(rng.normal(0, 2.0, 4000).astype(np.float32))
    hyper = D.Hyperparameters()
    draws = jnp.stack(
        [
            gibbs.error_precision_posterior(k, hyper, res)
            for k in jax.random.split(key, 50)
        ]
    )
    assert float(jnp.mean(draws)) == pytest.approx(0.25, rel=0.1)


def _setup_branch(model_type="ridge_base", seed=0, n=64):
    arch = NetArch(m=(6,), h=(4,), s=(4,), depth=0)
    state, _ = init_net(arch, model_type, InitCfg(seed=seed))
    rng = np.random.default_rng(seed)
    x = np.zeros((n, arch.m_pad), np.float32)
    x[:, : arch.m[0]] = rng.standard_normal((n, arch.m[0]))
    y = rng.standard_normal(n).astype(np.float32)
    w = tuple(w[0] for w in state.params.weights)
    b = tuple(b[0] for b in state.params.biases)
    wp = tuple(a[0] for a in state.precisions.weights)
    bp = tuple(a[0] for a in state.precisions.biases)
    mw = tuple(m[0] for m in P.weight_masks(arch))
    mb = tuple(m[0] for m in P.bias_masks(arch))
    return arch, w, b, wp, bp, mw, mb, jnp.asarray(x), jnp.asarray(y)


def test_hmc_small_step_high_acceptance():
    """With tiny uniform step sizes the Hamiltonian is nearly conserved and
    acceptance should be ~100%."""
    arch, w, b, wp, bp, mw, mb, x, y = _setup_branch()
    cfg = MCMCCfg(
        hmc_integration_length=20,
        hmc_step_size_mode="uniform",
        hmc_step_size_factor=1e-3,
    )
    hmc = jax.jit(make_hmc_step("ridge_base", "tanh", cfg))
    codes = []
    for k in jax.random.split(jax.random.key(0), 20):
        res = hmc(k, w, b, wp, bp, jnp.asarray(1.0), x, y, mw, mb, jnp.asarray(34.0))
        codes.append(int(res.code))
    assert np.mean(np.array(codes) == 0) > 0.9


def test_hmc_huge_step_early_rejects_and_restores():
    arch, w, b, wp, bp, mw, mb, x, y = _setup_branch()
    cfg = MCMCCfg(
        hmc_integration_length=20,
        hmc_step_size_mode="uniform",
        hmc_step_size_factor=10.0,
    )
    hmc = jax.jit(make_hmc_step("ridge_base", "tanh", cfg))
    res = hmc(
        jax.random.key(1), w, b, wp, bp, jnp.asarray(1.0), x, y, mw, mb,
        jnp.asarray(34.0),
    )
    assert int(res.code) == 2  # rejected early
    for wi, wo in zip(res.weights, w):
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(wo))


def test_hmc_padding_stays_zero():
    arch, w, b, wp, bp, mw, mb, x, y = _setup_branch()
    cfg = MCMCCfg(hmc_integration_length=10, hmc_step_size_mode="izmailov")
    hmc = jax.jit(make_hmc_step("ridge_base", "tanh", cfg))
    res = hmc(
        jax.random.key(3), w, b, wp, bp, jnp.asarray(1.0), x, y, mw, mb,
        jnp.asarray(34.0),
    )
    for wi, m in zip(res.weights, mw):
        np.testing.assert_array_equal(np.asarray(wi * (1 - m)), 0.0)
    for bi, m in zip(res.biases, mb):
        np.testing.assert_array_equal(np.asarray(bi * (1 - m)), 0.0)


@pytest.mark.parametrize("mode", ["uniform", "random", "std_scaled", "izmailov"])
@pytest.mark.parametrize("model_type", ["ridge_base", "lasso_ard", "std_normal"])
def test_step_size_modes_run(mode, model_type):
    arch, w, b, wp, bp, mw, mb, x, y = _setup_branch(model_type)
    cfg = MCMCCfg(hmc_integration_length=5, hmc_step_size_mode=mode)
    hmc = jax.jit(make_hmc_step(model_type, "tanh", cfg))
    res = hmc(
        jax.random.key(4), w, b, wp, bp, jnp.asarray(1.0), x, y, mw, mb,
        jnp.asarray(34.0),
    )
    assert int(res.code) in (0, 1, 2)
    assert np.all(np.isfinite(np.asarray(res.y_pred)))
