"""Dynamic trajectory lengths (cfg.hmc_traj_length_mode).

The reference integrates a fixed number of leapfrog steps and computes the
u-turn statistic only to log a warning (/root/reference/src/net/branch/
branch_sampler.rs:551-592, 1281-1284). The TPU build adds randomized-length
HMC ("jittered") and NUTS-style u-turn-adaptive nominal lengths ("uturn"),
implemented by freezing the compiled fixed-length scan — validated here:

1. truncation exactness: traj_len=l inside an L-step scan reproduces the
   l-step sampler bit for bit,
2. the u-turn statistic matches the half-period theory on a Gaussian target,
3. the nominal length adapts during warmup and freezes after burn-in,
4. jittered mode targets the same posterior as fixed mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net, _draw_traj_len, _tl_update
from rs_bann_tpu.samplers.hmc import make_hmc_step
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
from rs_bann_tpu.vis import ess


def _branch_args():
    w = (jnp.full((4, 2), 0.3), jnp.full((2, 1), 0.5))
    b = (jnp.zeros((2,)),)
    wp = (jnp.ones((1, 1)), jnp.ones((1, 1)))
    bp = (jnp.ones((1,)),)
    mw = tuple(jnp.ones_like(a) for a in w)
    mb = tuple(jnp.ones_like(a) for a in b)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    return w, b, wp, bp, mw, mb, x, y


@pytest.mark.slow
def test_traj_len_truncation_exact():
    """An L=24 scan truncated at traj_len=7 must produce the same proposal,
    acceptance and u-turn statistic as a static 7-step sampler (uniform step
    size so ε does not depend on L)."""
    w, b, wp, bp, mw, mb, x, y = _branch_args()
    base = dict(
        chain_length=1, hmc_step_size_mode="uniform", hmc_step_size_factor=0.05
    )
    long = make_hmc_step("ridge_base", "tanh", MCMCCfg(hmc_integration_length=24, **base))
    short = make_hmc_step("ridge_base", "tanh", MCMCCfg(hmc_integration_length=7, **base))
    k = jax.random.key(3)
    r_long = long(k, w, b, wp, bp, 1.0, x, y, mw, mb, jnp.asarray(11.0),
                  traj_len=jnp.asarray(7))
    r_short = short(k, w, b, wp, bp, 1.0, x, y, mw, mb, jnp.asarray(11.0))
    for a, bb in zip(jax.tree.leaves(r_long._replace(uturn_step=None)),
                     jax.tree.leaves(r_short._replace(uturn_step=None))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    # u-turn: if the short run saw one it must agree; the long run may see
    # one after step 7 only via frozen state (it cannot, state is frozen)
    assert int(r_long.uturn_step) == int(r_short.uturn_step)


def test_uturn_step_matches_half_period():
    """For a ~N(0, I) target (std_normal prior, negligible likelihood) with
    uniform step size ε, the trajectory rotates at unit angular frequency:
    the first u-turn Σ(q_t−q_0)·p_t < 0 arrives at the half period π/ε."""
    eps = 0.1
    cfg = MCMCCfg(
        chain_length=1, hmc_integration_length=64,
        hmc_step_size_mode="uniform", hmc_step_size_factor=eps,
        hmc_max_hamiltonian_error=1e6,
    )
    hmc = jax.jit(make_hmc_step("std_normal", "identity", cfg))
    w = (jnp.ones((4, 1)), jnp.ones((1, 1)))
    b = (jnp.zeros((1,)),)
    wp = (jnp.ones((1, 1)), jnp.ones((1, 1)))
    bp = (jnp.ones((1,)),)
    mw = tuple(jnp.ones_like(a) for a in w)
    mb = tuple(jnp.ones_like(a) for a in b)
    x = jnp.zeros((8, 4))
    y = jnp.zeros(8)
    k = jax.random.key(0)
    steps = [
        int(
            hmc(jax.random.fold_in(k, s), w, b, wp, bp, 1e-8, x, y, mw, mb,
                jnp.asarray(6.0)).uturn_step
        )
        for s in range(40)
    ]
    assert all(s > 0 for s in steps), "u-turn must occur within 64 steps"
    assert abs(np.mean(steps) - np.pi / eps) < 5.0


def test_draw_traj_len_ranges():
    k = jax.random.key(0)
    L = 32
    lens = _draw_traj_len(k, jnp.zeros(512), L, "jittered")
    assert int(lens.min()) >= 1 and int(lens.max()) <= L
    assert len(np.unique(np.asarray(lens))) > 10  # actually jittered
    # uturn draw: 0.0 sentinel -> full range upper half; adapted nominal 10
    lens = _draw_traj_len(k, jnp.zeros(512), L, "uturn")
    assert int(lens.min()) >= L // 2 and int(lens.max()) <= L
    lens = _draw_traj_len(k, jnp.full(512, 10.0), L, "uturn")
    assert int(lens.min()) >= 5 and int(lens.max()) <= 10


def test_tl_update_rules():
    L = 64
    # fresh (sentinel) takes the observation directly
    tl = _tl_update(jnp.asarray(0.0), jnp.asarray(12, jnp.int32),
                    jnp.asarray(20), jnp.asarray(0), jnp.asarray(True), L)
    assert float(tl) == 12.0
    # no u-turn seen within drawn 20 -> push up to min(2*20, L)
    tl = _tl_update(jnp.asarray(12.0), jnp.asarray(0, jnp.int32),
                    jnp.asarray(20), jnp.asarray(0), jnp.asarray(True), L)
    assert 12.0 < float(tl) <= 12.0 * 0.9 + 40.0 * 0.1 + 1e-5
    # divergent (code 2) and post-warmup observations are ignored
    for code, warm in ((2, True), (0, False)):
        tl = _tl_update(jnp.asarray(12.0), jnp.asarray(3, jnp.int32),
                        jnp.asarray(20), jnp.asarray(code),
                        jnp.asarray(warm), L)
        assert float(tl) == 12.0


@pytest.mark.slow
@pytest.mark.parametrize("update_mode", ["sequential", "parallel", "hybrid"])
def test_uturn_adapts_then_freezes(update_mode):
    arch = NetArch.uniform(4, 8, 4, 1, 4)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    n = 64
    X = np.zeros((4, n, arch.m_pad), np.float32)
    X[:, :, :8] = rng.standard_normal((4, n, 8), dtype=np.float32)
    X = jnp.asarray(X)
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cfg = MCMCCfg(
        chain_length=1, burn_in=4, hmc_integration_length=16,
        hmc_step_size_mode="dual_averaging", hmc_traj_length_mode="uturn",
        update_mode=update_mode, block_size=2, seed=0,
    )
    sweep = jax.jit(net.make_sweep(cfg))
    carry = net.init_carry(X, y, jax.random.key(0))
    assert np.all(np.asarray(carry.tl_avg) == 0.0)
    for _ in range(4):
        carry, _ = sweep(carry, X, y)
    warm_tl = np.asarray(carry.tl_avg)
    assert np.all(warm_tl > 0.0), "nominal lengths must adapt during warmup"
    for _ in range(3):
        carry, _ = sweep(carry, X, y)
    np.testing.assert_array_equal(np.asarray(carry.tl_avg), warm_tl)


@pytest.mark.slow
def test_jittered_matches_fixed_posterior():
    """Randomized trajectory lengths must not change the stationary
    distribution: compare posterior means against fixed-length HMC."""
    from tests.test_statistical import _run_chain, _sim

    arch = NetArch(m=(6, 6), h=(3, 3), s=(3, 3), depth=0)
    data = _sim(arch, seed=11, n=250, h2=0.6)
    keep = 150
    res = {}
    for mode in ("fixed", "jittered"):
        cfg = MCMCCfg(
            chain_length=1, burn_in=60, hmc_integration_length=30,
            hmc_step_size_mode="dual_averaging", seed=4,
            hmc_traj_length_mode=mode,
        )
        res[mode] = _run_chain(data, arch, cfg, keep)
    for ix, name in ((0, "mse"), (1, "error_precision")):
        a, b = res["fixed"][ix], res["jittered"][ix]
        se = np.sqrt(a.var() / max(ess(a), 1.0) + b.var() / max(ess(b), 1.0))
        diff = abs(a.mean() - b.mean())
        assert diff < max(4 * se, 0.08 * abs(a.mean())), (
            f"{name}: |{a.mean():.4f} - {b.mean():.4f}| = {diff:.4f} "
            f"vs 4*SE = {4 * se:.4f}"
        )


def test_cfg_validation():
    with pytest.raises(AssertionError):
        MCMCCfg(hmc_traj_length_mode="uturn", hmc_step_size_mode="izmailov")
    with pytest.raises(AssertionError):
        MCMCCfg(hmc_traj_length_mode="jittered", joint_hmc=True)
    MCMCCfg(hmc_traj_length_mode="uturn", hmc_step_size_mode="dual_averaging")


def test_checkpoint_roundtrip_with_tl(tmp_path):
    """tl_avg is part of the carry; exact resume must preserve it."""
    from rs_bann_tpu.train import load_checkpoint, save_checkpoint, TrainingStats

    arch = NetArch.uniform(2, 4, 2, 1, 2)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    X = jnp.zeros((2, 8, arch.m_pad))
    y = jnp.zeros(8)
    carry = net.init_carry(X, y, jax.random.key(0))
    carry = carry._replace(tl_avg=jnp.asarray([3.0, 7.0]))
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, carry, 5, TrainingStats())
    carry2, ix, _ = load_checkpoint(p, carry)
    assert ix == 5
    np.testing.assert_array_equal(np.asarray(carry2.tl_avg), [3.0, 7.0])
