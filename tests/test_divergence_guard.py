"""Divergence guard (mcmc_cfg.lam_e_floor / lam_row_floor, VERDICT r4 #2).

The measured failure mode (BASELINE_SELF ukb_ssm_pi01_4chain_run): a chain's
coefficients explode, rss explodes, the Gibbs lambda_e collapses toward 0,
the likelihood goes flat and the coefficients random-walk further — a
feedback spiral the near-improper hyperprior amplifies (lambda_row ~ 1/w^2
keeps the slab scale-free, and izmailov eps ~ 1/sqrt(lambda_row) diverges).

These tests inject a near-divergent state into the production-style sampler
(ridge_ard identity depth-0, per-marker spike-and-slab, hybrid schedule) and
assert (a) the guarded chain recovers to sane mse, (b) the floors are
bitwise inactive on healthy chains.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net, NetState, StackedParams, StackedPrecisions
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg


def _production_like(G=4, m=8, h=4, n=512, seed=0):
    arch = NetArch.uniform(G, m, h, 0, h, activation="identity")
    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=seed))
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(seed)
    Xf = np.zeros((G, arch.m_pad, n), np.float32)
    Xf[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
    X = D.FeatX(jnp.asarray(Xf))
    beta = rng.standard_normal((G, m)).astype(np.float32) * 0.3
    y = np.einsum("gmn,gm->n", Xf[:, :m, :], beta)
    y = y + rng.standard_normal(n).astype(np.float32) * np.std(y)
    y = jnp.asarray((y - y.mean()) / y.std())
    return net, X, y


def _corrupt(state: NetState, blow: float = 1e4) -> NetState:
    """The spiral's signature state: exploded layer-0 rows, scale-free
    (tiny) row precisions, collapsed error precision."""
    w = state.params.weights
    params = StackedParams(
        (w[0] + blow,) + w[1:], state.params.biases
    )
    prec = StackedPrecisions(
        tuple(jnp.full_like(p, 1e-9) for p in state.precisions.weights),
        tuple(jnp.full_like(p, 1e-9) for p in state.precisions.biases),
        jnp.asarray(1e-12, jnp.float32),
    )
    return NetState(params, prec, state.output_bias,
                    state.output_bias_precision)


def _cfg(**kw):
    base = dict(
        chain_length=1, burn_in=10**9, hmc_integration_length=5,
        hmc_step_size_mode="izmailov", update_mode="hybrid", block_size=2,
        ss_markers=True, ssm_pi=0.2, ssm_warmup=0, seed=0,
    )
    base.update(kw)
    return MCMCCfg(**base)


def test_guarded_chain_recovers_from_injected_divergence():
    net, X, y = _production_like()
    cfg = _cfg()  # guard defaults ON
    assert cfg.lam_e_floor > 0 and cfg.lam_row_floor > 0
    sweep = jax.jit(net.make_sweep(cfg))
    bad = _corrupt(net.state)
    carry = net.init_carry(X, y, jax.random.key(3), state=bad,
                           ss_markers=True, ssm_pi=cfg.ssm_pi)
    var_y = float(jnp.var(y))
    mse0 = float(jnp.mean(carry.residual ** 2))
    assert mse0 > 1e4 * var_y  # genuinely diverged start
    for _ in range(40):
        carry, stats = sweep(carry, X, y)
    mse = float(jnp.mean(carry.residual ** 2))
    assert np.isfinite(mse)
    # recovered to the data scale (an unfit model has mse ~ var(y))
    assert mse < 3.0 * var_y, (mse, var_y)
    err = float(carry.state.precisions.error)
    assert err >= cfg.lam_e_floor / (var_y + 1e-30) - 1e-6


def test_floors_only_bind_at_the_floor_on_healthy_chains():
    """One healthy sweep, guard on vs off: the lambda_e floor must never
    bind (healthy lambda_e ~ 1 >> 0.01/var(y)), and any row-precision
    element the guard touched must sit exactly at the floor with the
    unguarded draw below it (the near-improper Gamma(0.001) hyperprior has
    a heavy left tail, so rare sub-floor draws are expected even when
    healthy — the guard replaces them by the floor, nothing else)."""
    net, X, y = _production_like(seed=1)
    carry0 = net.init_carry(X, y, jax.random.key(0), ss_markers=True,
                            ssm_pi=0.2)
    results = []
    for guarded in (True, False):
        cfg = _cfg() if guarded else _cfg(lam_e_floor=0.0, lam_row_floor=0.0)
        sweep = jax.jit(net.make_sweep(cfg))
        c, _ = sweep(carry0, X, y)
        results.append(c)
    on, off = results
    floor = _cfg().lam_row_floor
    np.testing.assert_array_equal(
        np.asarray(on.state.precisions.error),
        np.asarray(off.state.precisions.error),
    )
    for a, b in zip(
        jax.tree.leaves(on.state.precisions),
        jax.tree.leaves(off.state.precisions),
    ):
        a, b = np.asarray(a), np.asarray(b)
        diff = a != b
        assert np.all(a[diff] == np.float32(floor)), a[diff]
        assert np.all(b[diff] <= floor)


def test_guard_config_plumbed_to_all_schedules():
    """The floors must bind in sequential and parallel schedules too (the
    spiral is schedule-independent)."""
    net, X, y = _production_like(seed=2)
    for mode in ("sequential", "parallel"):
        cfg = _cfg(update_mode=mode, block_size=0)
        sweep = jax.jit(net.make_sweep(cfg))
        carry = net.init_carry(X, y, jax.random.key(5),
                               state=_corrupt(net.state), ss_markers=True,
                               ssm_pi=cfg.ssm_pi)
        for _ in range(40):
            carry, _ = sweep(carry, X, y)
        var_y = float(jnp.var(y))
        mse = float(jnp.mean(carry.residual ** 2))
        assert np.isfinite(mse) and mse < 3.0 * var_y, (mode, mse, var_y)
