"""Posterior-analysis loaders and summaries (the py-vis equivalent)."""

import json
import os

import numpy as np
import pytest

from rs_bann_tpu import vis
from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
from rs_bann_tpu.sim import simulate_xy
from rs_bann_tpu.train import train


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    td = tmp_path_factory.mktemp("visrun")
    sim = simulate_xy(
        str(td), "ridge_base", "tanh", 6, 2, 120, 3, 0,
        heritability=0.7, seed=4,
    )
    dtr = sim.gen_train.to_stacked(sim.arch, sim.y_train)
    state, _ = init_net(sim.arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", sim.arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=8, burn_in=4, hmc_integration_length=15,
        outpath=str(td / "run"), seed=2, trace=True,
    )
    net, stats = train(net, dtr, cfg, verbose=False)
    return sim, td / "run", dtr


def test_loaders(run):
    sim, outdir, _ = run
    st = vis.load_training_stats(outdir)
    assert len(st["mse_train"]) == 9  # initial + 8 iterations
    hp = vis.load_hyperparams(outdir)
    assert len(hp["branch_hyperparams"]) == 2
    trace = vis.load_trace(outdir)
    assert len(trace) == 9
    mat = vis.trace_param_matrix(trace, 0)
    assert mat.shape == (9, sim.arch.num_params_branch(0))
    prec = vis.trace_precision_matrix(trace, 0)
    assert np.all(prec > 0)


def test_posterior_mean_vs_truth(run):
    sim, outdir, _ = run
    true_params = vis.load_true_params(sim.outdir)
    trace = vis.load_trace(outdir)
    summary = vis.posterior_mean_vs_truth(trace, true_params, burn_in=4)
    assert set(summary) == {0, 1}
    assert np.isfinite(summary[0]["rmse"])


def test_posterior_predictions_and_plots(run, tmp_path):
    sim, outdir, dtr = run
    preds = vis.posterior_predictions(os.path.join(outdir, "models"), dtr.X)
    assert preds.shape == (5, 120)  # cl 8, burn-in 4 -> samples 4..8
    try:
        import matplotlib  # noqa
    except ImportError:
        pytest.skip("matplotlib unavailable")
    vis.plot_training_stats(outdir, save_to=str(tmp_path / "stats.png"))
    trace = vis.load_trace(outdir)
    vis.plot_posterior_means(
        trace, vis.load_true_params(sim.outdir),
        save_to=str(tmp_path / "pm.png"),
    )
    assert (tmp_path / "stats.png").stat().st_size > 0


def test_expected_r2_formulas():
    assert vis.expected_r2(20, 1000, 0.8) == pytest.approx(40 / 41)
    # corrected quadratic k·x² − (1+k)·x + h² = 0, k = m/(n+h²): hand-
    # computed minus root for (20, 1000, 0.8) is x₁ = 0.7967640 (r = √x₁);
    # the upstream expression NaNs here (vis.expected_r2 docstring)
    w = vis.expected_r2(20, 1000, 0.8, formula="wray")
    assert len(w) == 2
    assert np.all(np.isfinite(w))
    assert w[0] ** 2 == pytest.approx(0.7967640, abs=1e-6)
    # n → ∞ limit of the physical root is h²
    w_inf = vis.expected_r2(20, 10**8, 0.8, formula="wray")
    assert w_inf[0] ** 2 == pytest.approx(0.8, abs=1e-6)


@pytest.mark.slow
def test_trajectory_and_grad_check_plots(tmp_path):
    """plot_trajectory / plot_grad_check render from a --num-grad-traj run
    (py-vis/vis.py parity: trajectory + gradient-check diff plots)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.data import StackedData
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
    from rs_bann_tpu.train import train
    from rs_bann_tpu.vis import plot_grad_check, plot_trajectory

    arch = NetArch.uniform(2, 4, 2, 0, 2)
    rng = np.random.default_rng(0)
    X = np.zeros((2, 40, arch.m_pad), np.float32)
    X[:, :, :4] = rng.standard_normal((2, 40, 4), dtype=np.float32)
    y = rng.standard_normal(40).astype(np.float32)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=2, burn_in=1, hmc_integration_length=4,
        trajectories=True, num_grad_traj=True,
        outpath=str(tmp_path), seed=0,
    )
    train(net, StackedData(jnp.asarray(X), jnp.asarray(y)), cfg, verbose=False)
    fig = plot_trajectory(str(tmp_path), 0, save_to=str(tmp_path / "traj.png"))
    assert (tmp_path / "traj.png").exists()
    fig2 = plot_grad_check(str(tmp_path), save_to=str(tmp_path / "gc.png"))
    assert (tmp_path / "gc.png").exists()


# ------------------------- reference plot-zoo parity (vis.py:385-970)


@pytest.fixture(scope="module")
def linear_run(tmp_path_factory):
    """Linear sim + train with trace/test/effect-sizes: the artifact set the
    reference's remaining diagnostic plots consume."""
    td = tmp_path_factory.mktemp("visrun_lm")
    sim = simulate_xy(
        str(td), "linear", "identity", 5, 2, 100, 0, 0,
        heritability=0.8, num_effective=3, json_data=True, seed=11,
    )
    arch = NetArch.uniform(2, 5, 3, 0, 3, activation="tanh")
    dtr = sim.gen_train.to_stacked(arch, sim.y_train)
    dte = sim.gen_test.to_stacked(arch, sim.y_test)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=6, burn_in=2, hmc_integration_length=10,
        outpath=str(td / "run"), seed=2, trace=True, effect_sizes=True,
    )
    net, _ = train(net, dtr, cfg, test_data=dte, verbose=False)
    return sim, td / "run", dtr, dte


def test_trace_layer_slices(run):
    sim, outdir, _ = run
    trace = vis.load_trace(outdir)
    L = sim.arch.num_layers
    for lix in range(L):
        w = vis.trace_layer_weights(trace, 0, lix)
        wp = vis.trace_layer_weight_precisions(trace, 0, lix)
        assert w.shape[0] == len(trace) and wp.shape[0] == len(trace)
    lam_e = vis.trace_error_precision(trace)
    assert lam_e.shape == (len(trace),) and np.all(lam_e > 0)


def test_baseline_regressors():
    rng = np.random.default_rng(0)
    x_tr = rng.standard_normal((80, 5))
    beta = np.asarray([1.0, -2.0, 0.5, 0.0, 0.0])
    y_tr = x_tr @ beta + 0.1 * rng.standard_normal(80)
    x_te = rng.standard_normal((40, 5))
    y_te = x_te @ beta + 0.1 * rng.standard_normal(40)
    r_tr, r_te = vis.ridge_r2(x_tr, y_tr, x_te, y_te, alpha=1.0)
    assert 0.9 < r_tr <= 1.0 and 0.9 < r_te <= 1.0
    m_tr, m_te = vis.ridge_mse(x_tr, y_tr, x_te, y_te)
    assert m_tr < 0.1 and m_te < 0.1
    l_tr, l_te = vis.linreg_r2(x_tr, y_tr, x_te, y_te)
    assert l_te > 0.9
    # primal and dual ridge agree
    d_tr, d_te = vis.ridge_r2(x_tr[:4], y_tr[:4], x_te, y_te)  # n < m: dual
    assert np.isfinite(d_te)


def test_run_overview_plots(linear_run, tmp_path):
    pytest.importorskip("matplotlib")
    sim, rundir, dtr, dte = linear_run
    ridge_data = (
        np.hstack([np.asarray(dtr.X[g]) for g in range(2)]),
        np.asarray(dtr.y),
        np.hstack([np.asarray(dte.X[g]) for g in range(2)]),
        np.asarray(dte.y),
    )
    vis.plot_perf_r2(rundir, sim.outdir, burn_in=2, ridge_data=ridge_data,
                     save_to=str(tmp_path / "perf_r2.png"))
    vis.plot_r2_lpd(rundir, sim.outdir, ridge_data=ridge_data,
                    save_to=str(tmp_path / "r2_lpd.png"))
    vis.plot_perf(rundir, sim.outdir, burn_in=2, ridge_data=ridge_data,
                  save_to=str(tmp_path / "perf.png"))
    for f in ("perf_r2.png", "r2_lpd.png", "perf.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_genetic_value_plot(linear_run, tmp_path):
    pytest.importorskip("matplotlib")
    sim, rundir, dtr, dte = linear_run
    g_tr, g_te = vis.load_genetic_values(sim.outdir)
    assert g_tr.shape == (100,) and g_te.shape == (100,)
    preds_tr = vis.posterior_predictions(os.path.join(rundir, "models"), dtr.X)
    preds_te = vis.posterior_predictions(os.path.join(rundir, "models"), dte.X)
    np.savetxt(tmp_path / "train_pred.csv", preds_tr, delimiter=",")
    np.savetxt(tmp_path / "test_pred.csv", preds_te, delimiter=",")
    vis.plot_perf_r2_genetic_value(
        rundir, sim.outdir, tmp_path / "train_pred.csv",
        tmp_path / "test_pred.csv", save_to=str(tmp_path / "gv.png"),
    )
    assert (tmp_path / "gv.png").stat().st_size > 0


def test_branch_state_and_trace_plots(run, tmp_path):
    pytest.importorskip("matplotlib")
    sim, outdir, _ = run
    trace = vis.load_trace(outdir)
    true_params = vis.load_true_params(sim.outdir)
    vis.plot_branch_state(trace, true_params, state_ix=-1,
                          save_to=str(tmp_path / "state.png"))
    vis.plot_branch_trace(trace, save_to=str(tmp_path / "btrace.png"))
    assert (tmp_path / "state.png").stat().st_size > 0
    assert (tmp_path / "btrace.png").stat().st_size > 0


def test_est_effect_sizes_plot(linear_run, tmp_path):
    pytest.importorskip("matplotlib")
    sim, rundir, _, _ = linear_run
    eff = vis.load_lm_true_effects(sim.outdir)
    assert eff.shape == (10,)
    vis.plot_est_effect_sizes(rundir, sim.outdir, burn_in=2,
                              save_to=str(tmp_path / "eff.png"))
    assert (tmp_path / "eff.png").stat().st_size > 0


def test_posterior_predictions_pools_chain_subdirs(tmp_path):
    """Multi-chain runs save models/chain<k>/<ix>.npz; posterior_predictions
    must pool them (the multi-chain consensus predictor) instead of failing
    on the empty top level (r3 battery clus-4chain regression)."""
    import numpy as np

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.vis import posterior_predictions

    arch = NetArch.uniform(2, 4, 3, 0, 3)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    X = np.zeros((2, 16, arch.m_pad), np.float32)
    X[:, :, :4] = rng.standard_normal((2, 16, 4))
    mdir = tmp_path / "models"
    for c in range(2):
        d = mdir / f"chain{c}"
        d.mkdir(parents=True)
        for ix in range(3):
            net.save(str(d / f"{ix}.npz"), state)
    preds = posterior_predictions(str(mdir), X)
    assert preds.shape == (6, 16)
    # identical states -> identical predictions across the pooled samples
    assert np.allclose(preds, preds[0])
