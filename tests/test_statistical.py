"""Statistical validation of the samplers.

1. The block-parallel update mode must target the same posterior as the
   reference-exact sequential mode (SURVEY.md §7 hard part #1): compare
   posterior summaries of identifiable quantities within Monte Carlo error.
2. Posterior recovery: on simulated data, posterior-mean predictions must
   approach the heritability-implied accuracy ceiling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.data import stack_standardized
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
from rs_bann_tpu.vis import ess


def _sim(arch, seed, n, h2):
    rng = np.random.default_rng(seed)
    ts, _ = init_net(
        arch, "ridge_base", InitCfg(init_gamma_shape=3.0, init_gamma_scale=0.5, seed=seed)
    )
    tn = Net("ridge_base", arch, D.Hyperparameters(), ts)
    m_tot = sum(arch.m)
    X = rng.binomial(2, rng.uniform(0.2, 0.5, m_tot), size=(n, m_tot)).astype(np.float32)
    cols, off = [], 0
    for g in range(arch.num_branches):
        cols.append(X[:, off : off + arch.m[g]])
        off += arch.m[g]
    d = stack_standardized(arch, cols, np.zeros(n))
    gv = np.asarray(tn.predict(d.X))
    y = gv + rng.normal(0, np.sqrt(gv.var() * (1 / h2 - 1)), n)
    return d._replace(y=jnp.asarray(y.astype(np.float32)))


def _run_chain(data, arch, cfg, n_keep):
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=9))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    from rs_bann_tpu.train import prepare_state_for_training

    prepare_state_for_training(net, None)
    sweep = jax.jit(net.make_sweep(cfg))
    carry = net.init_carry(data.X, data.y, jax.random.key(cfg.seed), 1.0)
    mses, errs = [], []
    total = cfg.burn_in + n_keep
    for i in range(total):
        carry, stats = sweep(carry, data.X, data.y)
        if i >= cfg.burn_in:
            mses.append(float(stats.mse_train))
            errs.append(float(carry.state.precisions.error))
    return np.array(mses), np.array(errs)


@pytest.mark.slow
def test_parallel_matches_sequential_posterior():
    """Posterior means of mse_train and the error precision agree between
    the two update schedules within combined Monte Carlo error."""
    arch = NetArch(m=(6, 6), h=(3, 3), s=(3, 3), depth=0)
    data = _sim(arch, seed=11, n=250, h2=0.6)
    keep = 150
    res = {}
    for mode in ("sequential", "parallel"):
        cfg = MCMCCfg(
            chain_length=1, burn_in=60, hmc_integration_length=30,
            hmc_step_size_mode="dual_averaging", seed=4, update_mode=mode,
        )
        res[mode] = _run_chain(data, arch, cfg, keep)

    for ix, name in ((0, "mse"), (1, "error_precision")):
        a, b = res["sequential"][ix], res["parallel"][ix]
        se = np.sqrt(
            a.var() / max(ess(a), 1.0) + b.var() / max(ess(b), 1.0)
        )
        diff = abs(a.mean() - b.mean())
        assert diff < max(4 * se, 0.08 * abs(a.mean())), (
            f"{name}: |{a.mean():.4f} - {b.mean():.4f}| = {diff:.4f} "
            f"vs 4*SE = {4 * se:.4f}"
        )


@pytest.mark.slow
def test_posterior_recovery_approaches_h2_ceiling(tmp_path):
    """Posterior-mean prediction r² on train data should land in the
    vicinity of h² (m << n so shrinkage is mild)."""
    from rs_bann_tpu.train import train

    arch = NetArch(m=(8,), h=(4,), s=(4,), depth=0)
    data = _sim(arch, seed=3, n=500, h2=0.7)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=120, burn_in=60, hmc_integration_length=50,
        hmc_step_size_mode="dual_averaging", outpath=str(tmp_path), seed=5,
    )
    net, stats = train(net, data, cfg, verbose=False)
    import os

    from rs_bann_tpu.vis import posterior_predictions

    preds = posterior_predictions(os.path.join(str(tmp_path), "models"), data.X)
    pm = preds.mean(axis=0)
    r2 = np.corrcoef(pm, np.asarray(data.y))[0, 1] ** 2
    assert r2 > 0.45, f"train r2 {r2} far below h2=0.7 ceiling"


def test_split_rhat():
    from rs_bann_tpu.vis import multichain_diagnostics, split_rhat

    rng = np.random.default_rng(0)
    same = rng.standard_normal((4, 400))
    assert abs(split_rhat(same) - 1.0) < 0.05
    shifted = same + np.array([0.0, 0.0, 5.0, 5.0])[:, None]
    assert split_rhat(shifted) > 1.5
    d = multichain_diagnostics(same)
    assert d["ess_total"] > 800


@pytest.mark.slow
def test_ard_identifies_effective_markers(tmp_path):
    """With an ARD prior, markers carrying signal should end with larger
    posterior input-weight magnitude than null markers."""
    from rs_bann_tpu.train import train

    m = 12
    arch = NetArch(m=(m,), h=(4,), s=(4,), depth=0)
    rng = np.random.default_rng(2)
    X = rng.binomial(2, 0.4, size=(400, m)).astype(np.float32)
    d = stack_standardized(arch, [X], np.zeros(400))
    # linear truth: only markers 2 and 7 matter
    beta = np.zeros(m); beta[2], beta[7] = 1.0, -1.0
    Xs = np.asarray(d.X[0])[:, :m]
    g = Xs @ beta
    y = g + rng.normal(0, np.sqrt(g.var() * 0.4), 400)
    d = d._replace(y=jnp.asarray(y.astype(np.float32)))

    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=1))
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=80, burn_in=40, hmc_integration_length=40,
        hmc_step_size_mode="dual_averaging", outpath=str(tmp_path), seed=4,
    )
    net, _ = train(net, d, cfg, verbose=False)
    w0 = np.abs(np.asarray(net.state.params.weights[0][0]))[:m]  # [m, h_pad]
    strength = w0.sum(axis=1)
    top2 = set(np.argsort(strength)[-2:])
    assert top2 == {2, 7}, f"top markers {top2}, strengths {strength.round(2)}"


@pytest.mark.slow
def test_depth_two_network_trains(tmp_path):
    from rs_bann_tpu.train import train

    arch = NetArch(m=(8, 8), h=(4, 4), s=(3, 3), depth=2)
    assert arch.num_layers == 4
    data = _sim(arch, seed=6, n=250, h2=0.8)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=15, burn_in=10, hmc_integration_length=30,
        hmc_step_size_mode="dual_averaging", outpath=str(tmp_path), seed=2,
    )
    net, stats = train(net, data, cfg, verbose=False)
    assert np.isfinite(stats.lpd[-1])
    assert stats.mse_train[-1] < stats.mse_train[0]
    # activations expose all four layers
    acts = net.activations(data.X)
    assert len(acts[0]) == 4
