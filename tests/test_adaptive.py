"""Dual-averaging step-size adaptation tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.data import stack_standardized
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
from rs_bann_tpu.train import train


def _sim(arch, seed=7, n=300, h2=0.7):
    rng = np.random.default_rng(seed)
    ts, _ = init_net(
        arch, "ridge_base", InitCfg(init_gamma_shape=3.0, init_gamma_scale=1.0, seed=seed)
    )
    tn = Net("ridge_base", arch, D.Hyperparameters(), ts)
    m_tot = sum(arch.m)
    X = rng.binomial(2, rng.uniform(0.1, 0.5, m_tot), size=(n, m_tot)).astype(np.float32)
    cols, off = [], 0
    for g in range(arch.num_branches):
        cols.append(X[:, off : off + arch.m[g]])
        off += arch.m[g]
    d = stack_standardized(arch, cols, np.zeros(n))
    gv = np.asarray(tn.predict(d.X))
    y = gv + rng.normal(0, np.sqrt(gv.var() * (1 / h2 - 1)), n)
    return d._replace(y=jnp.asarray(y.astype(np.float32)))


@pytest.mark.slow
def test_adaptation_moves_step_size_and_freezes_after_burnin(tmp_path):
    arch = NetArch(m=(10,), h=(5,), s=(5,), depth=0)
    data = _sim(arch)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=1, burn_in=10, hmc_integration_length=30,
        hmc_step_size_mode="dual_averaging", hmc_step_size_factor=1.0, seed=3,
    )
    sweep = jax.jit(net.make_sweep(cfg))
    carry = net.init_carry(data.X, data.y, jax.random.key(3), 1.0)
    assert float(carry.da_log_eps[0]) == 0.0
    for _ in range(10):
        carry, _ = sweep(carry, data.X, data.y)
    adapted = float(carry.da_log_eps_bar[0])
    assert adapted != 0.0
    # past burn-in: frozen
    for _ in range(3):
        carry, _ = sweep(carry, data.X, data.y)
    assert float(carry.da_log_eps_bar[0]) == adapted


@pytest.mark.slow
def test_adaptive_beats_or_matches_static_acceptance(tmp_path):
    arch = NetArch(m=(10, 10), h=(5, 5), s=(5, 5), depth=0)
    data = _sim(arch)
    rates = {}
    for mode in ("izmailov", "dual_averaging"):
        state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
        net = Net("ridge_base", arch, D.Hyperparameters(), state)
        cfg = MCMCCfg(
            chain_length=40, burn_in=40, hmc_integration_length=50,
            hmc_step_size_mode=mode, outpath=str(tmp_path / mode), seed=3,
        )
        _, stats = train(net, data, cfg, verbose=False)
        rates[mode] = stats.acceptance_rate()
    assert rates["dual_averaging"] >= rates["izmailov"] - 0.05, rates
    assert rates["dual_averaging"] > 0.3, rates
