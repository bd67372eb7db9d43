"""Step-size scheme formulas against hand-computed values
(ridge_base.rs:82-115 izmailov, lasso_base.rs:84-117, branch_sampler.rs:
654-732 random/uniform)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from rs_bann_tpu.samplers.hmc import step_sizes
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg


def _branch():
    weights = (jnp.zeros((3, 2)), jnp.zeros((2, 1)))
    biases = (jnp.zeros(2),)
    wp = (jnp.full((1, 1), 4.0), jnp.full((1, 1), 9.0))
    bp = (jnp.full((1,), 16.0),)
    return weights, biases, wp, bp


def test_izmailov_ridge():
    w, b, wp, bp = _branch()
    cfg = MCMCCfg(hmc_integration_length=10, hmc_step_size_factor=2.0,
                  hmc_step_size_mode="izmailov")
    ew, eb = step_sizes(jax.random.key(0), "ridge_base", cfg, w, b, wp, bp, 10.0)
    # factor * pi / (2 sqrt(lam) L)
    np.testing.assert_allclose(np.asarray(ew[0]), 2.0 * math.pi / (2 * 2 * 10), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ew[1]), 2.0 * math.pi / (2 * 3 * 10), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(eb[0]), 2.0 * math.pi / (2 * 4 * 10), rtol=1e-6)


def test_izmailov_lasso():
    w, b, wp, bp = _branch()
    cfg = MCMCCfg(hmc_integration_length=10, hmc_step_size_factor=2.0,
                  hmc_step_size_mode="izmailov")
    ew, eb = step_sizes(jax.random.key(0), "lasso_base", cfg, w, b, wp, bp, 10.0)
    # factor / (4 lam L) for weights; pi formula for biases
    np.testing.assert_allclose(np.asarray(ew[0]), 2.0 / (4 * 4.0 * 10), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(eb[0]), 2.0 * math.pi / (2 * 4 * 10), rtol=1e-6)


def test_std_scaled_and_uniform():
    w, b, wp, bp = _branch()
    cfg = MCMCCfg(hmc_step_size_mode="std_scaled", hmc_step_size_factor=0.5)
    ew, _ = step_sizes(jax.random.key(0), "ridge_base", cfg, w, b, wp, bp, 10.0)
    np.testing.assert_allclose(np.asarray(ew[0]), 0.5 / 2.0, rtol=1e-6)
    cfg = MCMCCfg(hmc_step_size_mode="uniform", hmc_step_size_factor=0.3)
    ew, eb = step_sizes(jax.random.key(0), "ridge_base", cfg, w, b, wp, bp, 10.0)
    np.testing.assert_allclose(np.asarray(ew[0]), 0.3)
    np.testing.assert_allclose(np.asarray(eb[0]), 0.3)


def test_random_bounds():
    w, b, wp, bp = _branch()
    cfg = MCMCCfg(hmc_step_size_mode="random", hmc_step_size_factor=1.0)
    ew, eb = step_sizes(jax.random.key(3), "ridge_base", cfg, w, b, wp, bp, 16.0)
    cap = 16.0 ** -0.25  # n_params^(-1/4) * factor
    for e in list(ew) + list(eb):
        assert np.all(np.asarray(e) >= 0) and np.all(np.asarray(e) <= cap)


def test_dual_averaging_overrides_std_normal_factor():
    """std_normal's izmailov ignores the cfg factor, but a runtime step
    factor (adaptation) must take effect."""
    w, b, wp, bp = _branch()
    cfg = MCMCCfg(hmc_integration_length=10, hmc_step_size_factor=2.0,
                  hmc_step_size_mode="izmailov")
    ew_static, _ = step_sizes(jax.random.key(0), "std_normal", cfg, w, b, wp, bp, 10.0)
    np.testing.assert_allclose(np.asarray(ew_static[0]), math.pi / (2 * 2 * 10), rtol=1e-6)
    cfg_da = MCMCCfg(hmc_integration_length=10, hmc_step_size_mode="dual_averaging")
    ew_da, _ = step_sizes(
        jax.random.key(0), "std_normal", cfg_da, w, b, wp, bp, 10.0,
        step_factor=jnp.asarray(3.0),
    )
    np.testing.assert_allclose(np.asarray(ew_da[0]), 3.0 * math.pi / (2 * 2 * 10), rtol=1e-6)
