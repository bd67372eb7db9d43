"""Two-component ARD row-prior mixture (cfg.ss_rows): per-marker selection
for nonlinear branches (net._row_mixture_z)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.data import stack_standardized
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net, _row_mixture_z
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
from rs_bann_tpu.train import train


def test_row_mixture_probability_matches_quadrature():
    """Empirical P(z=1 | w) must match the mixture posterior computed with
    the slab marginal obtained by NUMERICAL integration of
    int N(w; 0, 1/lam I) Gamma(lam; k, theta) dlam — independent of the
    closed-form multivariate-t expression used in the implementation."""
    rng = np.random.default_rng(0)
    c, shape, scale, pi, lam_spike = 4, 0.5, 2.0, 0.3, 100.0
    w_rows = np.stack([
        rng.standard_normal(c) * 0.6,         # clearly slab-scale
        rng.standard_normal(c) * 0.05,        # spike-scale
        rng.standard_normal(c) * 0.2,         # ambiguous
    ]).astype(np.float32)

    # quadrature slab marginal per row
    lam_grid = np.linspace(1e-6, 400.0, 400_001)
    ga = (
        lam_grid ** (shape - 1.0)
        * np.exp(-lam_grid / scale)
        / (scale ** shape)
        / float(np.exp(jax.scipy.special.gammaln(shape)))
    )
    p_true = []
    for w in w_rows:
        ssq = float(w @ w)
        norm = (lam_grid / (2 * np.pi)) ** (c / 2) * np.exp(
            -lam_grid * ssq / 2.0
        )
        p_slab = np.trapezoid(norm * ga, lam_grid)
        p_spike = (lam_spike / (2 * np.pi)) ** (c / 2) * np.exp(
            -lam_spike * ssq / 2.0
        )
        p_true.append(pi * p_slab / (pi * p_slab + (1 - pi) * p_spike))

    keys = jax.random.split(jax.random.key(1), 4000)
    zs = jax.vmap(
        lambda k: _row_mixture_z(
            k, jnp.asarray(w_rows), float(c), shape, scale, pi, lam_spike,
            jnp.ones(3), False,
        )
    )(keys)
    emp = np.asarray(zs).mean(axis=0)
    np.testing.assert_allclose(emp, p_true, atol=0.03)


@pytest.mark.parametrize("mode", ["sequential", "parallel", "hybrid"])
def test_ss_rows_runs_all_modes(mode, tmp_path):
    rng = np.random.default_rng(0)
    G, m, n = 4, 6, 120
    arch = NetArch.uniform(G, m, 3, 1, 3, activation="tanh")
    cols = [rng.standard_normal((n, m)).astype(np.float32) for _ in range(G)]
    y = rng.standard_normal(n).astype(np.float32)
    ds = stack_standardized(arch, cols, y)
    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=1))
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=6, burn_in=3, hmc_integration_length=5,
        update_mode=mode, block_size=2, ss_rows=True, ssr_warmup=2,
        outpath=str(tmp_path), seed=0,
    )
    net, stats = train(net, ds, cfg, verbose=False)
    assert np.isfinite(stats.mse_train).all()
    import json, os

    ip = json.load(open(os.path.join(str(tmp_path), "inclusion_probs")))
    pm = np.concatenate([np.asarray(r) for r in ip["pip_markers"]])
    assert pm.shape == (G * m,)
    assert np.all((pm >= 0) & (pm <= 1))


@pytest.mark.slow
def test_ss_rows_selects_causal_markers_nonlinear():
    """tanh depth-1 branches, 2 of 8 markers per branch causal: causal rows
    must end with clearly higher PIPs than null rows."""
    rng = np.random.default_rng(3)
    G, m, n = 4, 8, 1200
    arch = NetArch.uniform(G, m, 4, 1, 4, activation="tanh")
    cols = [rng.standard_normal((n, m)).astype(np.float32) for _ in range(G)]
    causal = [np.array([0, 3]) for _ in range(G)]
    g_val = sum(
        np.tanh(c[:, cz] @ rng.standard_normal((2, 1)) * 0.9)[:, 0]
        for c, cz in zip(cols, causal)
    )
    noise = rng.standard_normal(n).astype(np.float32) * np.sqrt(
        max(g_val.var(), 1e-6) * (1 / 0.7 - 1)
    )
    y = g_val + noise
    y = ((y - y.mean()) / y.std()).astype(np.float32)
    ds = stack_standardized(arch, cols, y)
    state, _ = init_net(
        arch, "ridge_ard",
        InitCfg(seed=1, init_gamma_shape=3.0, init_gamma_scale=1.0),
    )
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=200, burn_in=100, hmc_integration_length=20,
        update_mode="hybrid", block_size=2, ss_rows=True, ssr_warmup=50,
        ssr_spike=1e4, hmc_step_size_mode="dual_averaging",
        outpath="/tmp/ssr_sel", seed=0,
    )
    net, stats = train(net, ds, cfg, verbose=False)
    import json

    ip = json.load(open("/tmp/ssr_sel/inclusion_probs"))
    pips = [np.asarray(r) for r in ip["pip_markers"]]
    causal_pip = np.mean([p[cz].mean() for p, cz in zip(pips, causal)])
    null_pip = np.mean([
        np.delete(p, cz).mean() for p, cz in zip(pips, causal)
    ])
    assert causal_pip > null_pip + 0.2, (causal_pip, null_pip)