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
    w = vis.expected_r2(20, 1000, 0.8, formula="wray")
    assert len(w) == 2


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
