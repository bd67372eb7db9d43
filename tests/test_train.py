"""End-to-end training tests: seeded sim -> train -> predictive r².

This closes the reference's biggest test gap (SURVEY.md §4: no end-to-end
Net::train test exists upstream).
"""

import os

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
from rs_bann_tpu.train import train


def simulate(arch, model_type, h2, seed=7, n=600):
    rng = np.random.default_rng(seed)
    true_state, _ = init_net(
        arch, model_type, InitCfg(init_gamma_shape=3.0, init_gamma_scale=1.0, seed=seed)
    )
    true_net = Net(model_type, arch, D.Hyperparameters(), true_state)
    m_tot = sum(arch.m)
    maf = rng.uniform(0.05, 0.5, size=m_tot)
    cols_tr, cols_te, off = [], [], 0
    Xtr = rng.binomial(2, maf, size=(n, m_tot)).astype(np.float32)
    Xte = rng.binomial(2, maf, size=(n, m_tot)).astype(np.float32)
    for g in range(arch.num_branches):
        cols_tr.append(Xtr[:, off : off + arch.m[g]])
        cols_te.append(Xte[:, off : off + arch.m[g]])
        off += arch.m[g]
    dtr = stack_standardized(arch, cols_tr, np.zeros(n))
    dte = stack_standardized(arch, cols_te, np.zeros(n))
    g_tr = np.asarray(true_net.predict(dtr.X))
    g_te = np.asarray(true_net.predict(dte.X))
    y_tr = g_tr + rng.normal(0, np.sqrt(g_tr.var() * (1 / h2 - 1)), n)
    y_te = g_te + rng.normal(0, np.sqrt(g_te.var() * (1 / h2 - 1)), n)
    return (
        dtr._replace(y=jnp.asarray(y_tr.astype(np.float32))),
        dte._replace(y=jnp.asarray(y_te.astype(np.float32))),
    )


@pytest.mark.slow
@pytest.mark.parametrize("update_mode", ["sequential", "parallel"])
def test_train_multibranch_r2(tmp_path, update_mode):
    arch = NetArch(m=(10, 10, 10), h=(5, 5, 5), s=(5, 5, 5), depth=0)
    dtr, dte = simulate(arch, "ridge_base", h2=0.8)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=40,
        burn_in=20,
        hmc_integration_length=100,
        hmc_step_size_mode="izmailov",
        outpath=str(tmp_path / update_mode),
        seed=3,
        update_mode=update_mode,
    )
    net, stats = train(net, dtr, cfg, test_data=dte, verbose=False)
    yhat = np.asarray(net.predict(dte.X))
    r2 = np.corrcoef(yhat, np.asarray(dte.y))[0, 1] ** 2
    assert r2 > 0.25, f"test r2 too low: {r2}"
    assert stats.mse_train[-1] < stats.mse_train[0]
    # posterior samples saved
    models = os.listdir(cfg.models_path())
    assert len(models) == cfg.chain_length - cfg.burn_in + 1


@pytest.mark.slow
def test_train_is_reproducible(tmp_path):
    arch = NetArch(m=(8,), h=(4,), s=(4,), depth=0)
    dtr, dte = simulate(arch, "ridge_base", h2=0.6, n=200)
    outs = []
    for rep in range(2):
        state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
        net = Net("ridge_base", arch, D.Hyperparameters(), state)
        cfg = MCMCCfg(
            chain_length=5,
            burn_in=5,
            hmc_integration_length=30,
            outpath=str(tmp_path / f"rep{rep}"),
            seed=9,
        )
        net, _ = train(net, dtr, cfg, verbose=False)
        outs.append(np.asarray(net.predict(dte.X)))
    np.testing.assert_array_equal(outs[0], outs[1])


@pytest.mark.slow
def test_multichain(tmp_path):
    arch = NetArch(m=(8,), h=(4,), s=(4,), depth=0)
    dtr, _ = simulate(arch, "ridge_base", h2=0.6, n=200)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=4,
        burn_in=2,
        hmc_integration_length=20,
        outpath=str(tmp_path),
        seed=9,
        num_chains=3,
    )
    net, stats = train(net, dtr, cfg, verbose=False)
    assert stats.num_samples == 4 * 3  # 4 sweeps x 1 branch x 3 chains
    assert os.path.isdir(os.path.join(cfg.models_path(), "chain2"))


@pytest.mark.parametrize(
    "model_type", ["ridge_ard", "lasso_base", "lasso_ard", "std_normal"]
)
@pytest.mark.slow
def test_all_families_train(tmp_path, model_type):
    arch = NetArch(m=(6, 6), h=(3, 3), s=(3, 3), depth=1)
    dtr, _ = simulate(arch, model_type, h2=0.7, n=200)
    state, _ = init_net(arch, model_type, InitCfg(seed=1))
    net = Net(model_type, arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=5,
        burn_in=5,
        hmc_integration_length=20,
        outpath=str(tmp_path / model_type),
        seed=2,
    )
    net, stats = train(net, dtr, cfg, verbose=False)
    assert np.isfinite(stats.mse_train[-1])
    assert np.isfinite(stats.lpd[-1])


def test_save_load_round_trip(tmp_path):
    arch = NetArch(m=(6, 4), h=(3, 2), s=(3, 2), depth=1)
    state, _ = init_net(arch, "lasso_ard", InitCfg(seed=4))
    net = Net("lasso_ard", arch, D.Hyperparameters(1.0, 2.0, 3.0, 4.0, 5.0, 6.0), state)
    p = str(tmp_path / "model.npz")
    net.save(p)
    net2 = Net.load(p)
    assert net2.model_type == "lasso_ard"
    assert net2.arch == arch
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((2, 50, arch.m_pad)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(net.predict(X)), np.asarray(net2.predict(X)), rtol=1e-6
    )


@pytest.mark.slow
def test_joint_hmc_runs(tmp_path):
    arch = NetArch(m=(6,), h=(3,), s=(3,), depth=0)
    dtr, _ = simulate(arch, "ridge_base", h2=0.7, n=150)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=5, burn_in=5, hmc_integration_length=10,
        outpath=str(tmp_path), seed=2, joint_hmc=True,
        hmc_step_size_factor=0.01,
    )
    net, stats = train(net, dtr, cfg, verbose=False)
    assert np.isfinite(stats.lpd[-1])
    assert float(net.state.precisions.error) > 0


@pytest.mark.slow
@pytest.mark.parametrize("update_mode", ["parallel", "hybrid"])
def test_joint_hmc_parallel_modes(tmp_path, update_mode):
    """Joint HMC under the parallel/hybrid schedules: local precisions move
    in-HMC, the shared scalars by per-sweep/per-block conjugate Gibbs."""
    arch = NetArch(m=(6, 6), h=(3, 3), s=(3, 3), depth=0)
    dtr, _ = simulate(arch, "ridge_base", h2=0.7, n=150)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=8, burn_in=8, hmc_integration_length=10,
        outpath=str(tmp_path), seed=2, joint_hmc=True,
        hmc_step_size_factor=0.002, update_mode=update_mode, block_size=1,
    )
    net, stats = train(net, dtr, cfg, verbose=False)
    assert np.isfinite(stats.lpd[-1])
    assert float(net.state.precisions.error) > 0
    # local precisions must have moved away from their init (HMC coordinates)
    wp0 = np.asarray(init_net(arch, "ridge_base", InitCfg(seed=1))[0].precisions.weights[0])
    assert not np.allclose(np.asarray(net.state.precisions.weights[0]), wp0)


@pytest.mark.slow
def test_joint_hmc_trajectories(tmp_path):
    """Joint mode records per-leapfrog-step trajectories incl. the precision
    series (the reference records trajectories in hmc_step_joint too)."""
    import json

    arch = NetArch(m=(5,), h=(3,), s=(3,), depth=0)
    dtr, _ = simulate(arch, "ridge_base", h2=0.7, n=100)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    L = 7
    cfg = MCMCCfg(
        chain_length=3, burn_in=3, hmc_integration_length=L,
        outpath=str(tmp_path), seed=2, joint_hmc=True, trajectories=True,
        hmc_step_size_factor=0.01,
    )
    net, _ = train(net, dtr, cfg, verbose=False)
    lines = [json.loads(l) for l in open(os.path.join(str(tmp_path), "traj"))]
    assert len(lines) == 3  # one per branch update
    rec = lines[0]
    assert len(rec["hamiltonian"]) == L + 1
    assert len(rec["params"]) == L
    assert len(rec["precisions"]) == L
    # per step: 2 weight precisions + 1 bias precision + error precision
    assert len(rec["precisions"][0]) == 4
    assert np.isfinite(rec["precisions"][0]).all()
    assert np.isfinite(rec["hamiltonian"]).all()


def test_gradient_descent_mode(tmp_path):
    arch = NetArch(m=(6,), h=(3,), s=(3,), depth=0)
    dtr, _ = simulate(arch, "ridge_base", h2=0.9, n=150)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=5, burn_in=5, hmc_integration_length=10,
        outpath=str(tmp_path), seed=2, gradient_descent=True,
        hmc_step_size_factor=1e-4,
    )
    net, stats = train(net, dtr, cfg, verbose=False)
    assert stats.mse_train[-1] < stats.mse_train[0]


@pytest.mark.slow
def test_sweep_batching_is_exact(tmp_path):
    """K sweeps per compiled call (lax.scan) must reproduce the K=1 path
    bit-for-bit: same seeds, same saved samples, same stats."""
    arch = NetArch(m=(8,), h=(4,), s=(4,), depth=0)
    dtr, dte = simulate(arch, "ridge_base", h2=0.6, n=200)
    outs = []
    for K in (1, 4):
        state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
        net = Net("ridge_base", arch, D.Hyperparameters(), state)
        cfg = MCMCCfg(
            chain_length=6, burn_in=3, hmc_integration_length=20,
            outpath=str(tmp_path / f"K{K}"), seed=9, sweeps_per_call=K,
        )
        net, stats = train(net, dtr, cfg, test_data=dte, verbose=False)
        outs.append((np.asarray(net.predict(dte.X)), stats.mse_train, stats.mse_test))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-6)


@pytest.mark.slow
def test_checkpoint_resume_is_exact(tmp_path):
    """Interrupt at iteration k, resume from checkpoint: identical final
    state and stats as an uninterrupted run (incl. the RNG stream)."""
    arch = NetArch(m=(8,), h=(4,), s=(4,), depth=0)
    dtr, dte = simulate(arch, "ridge_base", h2=0.6, n=200)

    def fresh():
        state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
        return Net("ridge_base", arch, D.Hyperparameters(), state)

    cfg_full = MCMCCfg(
        chain_length=8, burn_in=4, hmc_integration_length=20,
        outpath=str(tmp_path / "full"), seed=9, sweeps_per_call=2,
    )
    net_full, stats_full = train(fresh(), dtr, cfg_full, verbose=False)

    cfg_a = MCMCCfg(
        chain_length=4, burn_in=4, hmc_integration_length=20,
        outpath=str(tmp_path / "resume"), seed=9, sweeps_per_call=2,
    )
    train(fresh(), dtr, cfg_a, verbose=False, checkpoint_interval=2)
    cfg_b = MCMCCfg(
        chain_length=8, burn_in=4, hmc_integration_length=20,
        outpath=str(tmp_path / "resume"), seed=9, sweeps_per_call=2,
    )
    net_res, stats_res = train(
        fresh(), dtr, cfg_b, verbose=False,
        resume_from=str(tmp_path / "resume" / "checkpoint.npz"),
    )
    np.testing.assert_array_equal(
        np.asarray(net_full.predict(dte.X)), np.asarray(net_res.predict(dte.X))
    )
    np.testing.assert_allclose(stats_full.mse_train, stats_res.mse_train, rtol=1e-6)


@pytest.mark.slow
def test_hybrid_update_mode(tmp_path):
    arch = NetArch(m=(6,) * 8, h=(3,) * 8, s=(3,) * 8, depth=0)
    dtr, dte = simulate(arch, "ridge_base", h2=0.7, n=250)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=20, burn_in=10, hmc_integration_length=30,
        hmc_step_size_mode="dual_averaging", outpath=str(tmp_path),
        seed=3, update_mode="hybrid", block_size=4,
    )
    net, stats = train(net, dtr, cfg, test_data=dte, verbose=False)
    assert np.isfinite(stats.lpd[-1])
    assert stats.mse_train[-1] < stats.mse_train[0]
    assert stats.num_samples == 20 * 8  # every branch updated every sweep


@pytest.mark.slow
def test_gd_warmup(tmp_path):
    arch = NetArch(m=(8,), h=(4,), s=(4,), depth=0)
    dtr, dte = simulate(arch, "ridge_base", h2=0.7, n=200)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=5, burn_in=3, hmc_integration_length=20,
        outpath=str(tmp_path), seed=9, gd_warmup=5,
    )
    net, stats = train(net, dtr, cfg, test_data=dte, verbose=False)
    # the warm start should land sampling at an already-low training mse
    assert stats.mse_train[0] < np.var(np.asarray(dtr.y))
    assert stats.num_samples == 5  # warmup sweeps are not counted as samples


def test_branch_map_sequential_path_matches_vmap():
    """predict/branch_r2s fall back to lax.map over branches for huge n
    (UKB-scale OOM guard); both paths must agree (up to f32 summation
    order) for dense and packed inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.density import PackedX
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.ops.packed_matmul import pack_strided

    arch = NetArch.uniform(3, 8, 4, 1, 4)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    X = jnp.asarray(
        np.pad(
            rng.standard_normal((3, 50, 8)).astype(np.float32),
            ((0, 0), (0, 0), (0, arch.m_pad - 8)),
        )
    )
    y = jnp.asarray(rng.standard_normal(50).astype(np.float32))

    def forced(self, f, X_, *trees):
        return jax.lax.map(lambda args: f(*args), (X_, *trees))

    p_vmap = np.asarray(net.predict(X))
    r_vmap = np.asarray(net.branch_r2s(X, y))
    orig = Net._branch_map
    try:
        Net._branch_map = forced
        np.testing.assert_allclose(np.asarray(net.predict(X)), p_vmap, atol=1e-6)
        np.testing.assert_allclose(np.asarray(net.branch_r2s(X, y)), r_vmap, atol=1e-6)
    finally:
        Net._branch_map = orig

    Xg = rng.binomial(2, 0.3, size=(3, 50, arch.m_pad)).astype(np.float32)
    by = np.stack([pack_strided(Xg[g].T) for g in range(3)])
    sd = np.where(Xg.std(1) > 0, Xg.std(1), 1.0)
    px = PackedX(jnp.asarray(by), jnp.asarray(1.0 / sd), jnp.asarray(Xg.mean(1)), 50)
    p_packed = np.asarray(net.predict(px))
    try:
        Net._branch_map = forced
        np.testing.assert_allclose(np.asarray(net.predict(px)), p_packed, atol=1e-5)
    finally:
        Net._branch_map = orig


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["sequential", "parallel", "hybrid"])
def test_trajectories_all_update_modes(tmp_path, mode):
    """--trajectories produces reference-schema traj JSONL in every update
    schedule, including hybrid (the recommended genome-scale mode; round-1
    gap #7). One record per branch update, params/ldg series of length L,
    hamiltonian of length L+1, perm covering all branches."""
    import json

    G = 4
    arch = NetArch(m=(5,) * G, h=(3,) * G, s=(3,) * G, depth=0)
    dtr, _ = simulate(arch, "ridge_base", h2=0.7, n=100)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    L = 5
    cfg = MCMCCfg(
        chain_length=2, burn_in=2, hmc_integration_length=L,
        outpath=str(tmp_path / mode), seed=2, trajectories=True,
        update_mode=mode, block_size=2 if mode == "hybrid" else 0,
        hmc_step_size_factor=0.1,
    )
    net, _ = train(net, dtr, cfg, verbose=False)
    lines = [
        json.loads(l) for l in open(os.path.join(str(tmp_path / mode), "traj"))
    ]
    assert len(lines) == 2 * G  # chain_length x branches
    seen = sorted(rec["branch_ix"] for rec in lines[:G])
    assert seen == list(range(G))  # every branch recorded once per sweep
    n_params = arch.num_params_branch(0)
    for rec in lines:
        assert len(rec["hamiltonian"]) == L + 1
        assert len(rec["params"]) == L
        assert len(rec["ldg"]) == L
        assert len(rec["params"][0]) == n_params
        assert np.isfinite(rec["params"]).all()
        assert np.isfinite(rec["hamiltonian"]).all()
