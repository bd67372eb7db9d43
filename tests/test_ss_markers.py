"""Per-marker (within-branch) spike-and-slab tests (cfg.ss_markers).

The collapsed conjugate move is exact for identity depth-0 branches: the
branch output is linear in each layer-0 row, so the row marginalizes in
closed form (models/net.py _marker_ss_scan). These tests check the move's
math against a NumPy mirror, selection behavior on a sparse truth, padding
invariance, and the artifact stream.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.data import stack_standardized
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net, _marker_ss_scan
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
from rs_bann_tpu.train import train


def _sparse_linear_problem(seed=0, G=4, m=20, n=800, frac_h2=0.5, n_causal=6):
    rng = np.random.default_rng(seed)
    M = G * m
    X = rng.binomial(2, 0.3, size=(n, M)).astype(np.float32)
    Xte = rng.binomial(2, 0.3, size=(n, M)).astype(np.float32)
    causal = rng.choice(M, size=n_causal, replace=False)
    beta = np.zeros(M, np.float32)
    beta[causal] = rng.normal(0, 0.5, n_causal)

    def std(A):
        mu, sd = A.mean(0), A.std(0)
        return (A - mu) / np.where(sd > 0, sd, 1)

    g_tr, g_te = std(X) @ beta, std(Xte) @ beta
    sig = np.sqrt(g_tr.var() * (1 / frac_h2 - 1))
    y = (g_tr + rng.normal(0, sig, n)).astype(np.float32)
    yte = (g_te + rng.normal(0, sig, n)).astype(np.float32)
    arch = NetArch.from_width_rules(
        [m] * G, 0, ("fixed", 6), ("like_hidden",), activation="identity"
    )
    dtr = stack_standardized(arch, [X[:, i * m : (i + 1) * m] for i in range(G)], y)
    dte = stack_standardized(arch, [Xte[:, i * m : (i + 1) * m] for i in range(G)], yte)
    return arch, dtr, dte, causal


def test_marker_scan_matches_numpy_collapse():
    """One scan step's Bayes factor and conditional row draw distribution
    match the closed-form NumPy computation (forced single-marker case)."""
    rng = np.random.default_rng(3)
    n, m_pad, s = 400, 8, 4
    x = np.zeros((n, m_pad), np.float32)
    # only marker 2 carries data: other columns are 0, so their z draws
    # cannot perturb the residual and the closed form below is exact
    x[:, 2] = rng.standard_normal(n).astype(np.float32)
    W0 = np.zeros((m_pad, s), np.float32)
    b0 = np.zeros(s, np.float32)  # keep pred offset 0 so e_{-j} = target
    w_out = rng.standard_normal((s, 1)).astype(np.float32)
    lam_e, lam = 2.0, 1.5
    # target carries signal on marker 2 only
    beta_true = 0.8
    target = (x[:, 2] * beta_true + rng.normal(0, 0.5, n)).astype(np.float32)

    keys = jax.random.split(jax.random.key(0), 4000)
    z, rows = [], []
    lam_rows = jnp.full(m_pad, lam)
    rm = jnp.ones(m_pad)
    cm = jnp.ones(s)

    def one(k):
        zf, W0f, _ = _marker_ss_scan(
            k, jnp.asarray(x), jnp.asarray(W0), jnp.asarray(b0),
            jnp.asarray(w_out), jnp.asarray(target), lam_e, lam_rows,
            0.5, rm, cm, False,
        )
        return zf[2], W0f[2]

    zs, rows = jax.vmap(one)(keys)
    zs, rows = np.asarray(zs), np.asarray(rows)

    # NumPy closed form for marker 2 at W0 = 0 (its e_{-j} = target exactly,
    # whatever the scan order — all other rows stay 0 under z_j drawn from a
    # zero-signal BF only by chance; we therefore compare the marker-2
    # inclusion probability in aggregate, which is dominated by its own BF)
    w = w_out[:, 0]
    wn2 = float(w @ w)
    u = float(x[:, 2] @ target)
    sxx = float(x[:, 2] @ x[:, 2])
    q_a = lam + lam_e * sxx * wn2
    log_bf = 0.5 * np.log(lam / q_a) + 0.5 * (lam_e * np.sqrt(wn2) * u) ** 2 / q_a
    p_inc = 1.0 / (1.0 + np.exp(-log_bf))  # pi = 0.5 cancels
    assert abs(zs.mean() - p_inc) < 0.05, (zs.mean(), p_inc)

    # included draws: effective beta = row . w ~ N(lam_e*sqrt(wn2)*u/q_a * sqrt(wn2), ...)
    inc = zs > 0
    beta_draws = rows[inc] @ w
    mu_a = lam_e * np.sqrt(wn2) * u / q_a
    exp_beta = mu_a * np.sqrt(wn2)
    sd_beta = np.sqrt(wn2 / q_a)
    assert abs(beta_draws.mean() - exp_beta) < 4 * sd_beta / np.sqrt(max(inc.sum(), 1))
    assert abs(beta_draws.std() - sd_beta) < 0.2 * sd_beta + 0.01


def test_excluded_rows_exactly_zero_and_padding_invariant():
    arch, dtr, _, _ = _sparse_linear_problem(seed=5, G=2, m=10, n=200)
    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=1))
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=6, burn_in=6, hmc_integration_length=5,
        hmc_step_size_mode="dual_averaging", update_mode="sequential",
        ss_markers=True, outpath="/tmp/ssm_pad_test", seed=0,
    )
    sweep = jax.jit(net.make_sweep(cfg))
    carry = net.init_carry(dtr.X, dtr.y, jax.random.key(0), ss_markers=True)
    for _ in range(6):
        carry, _ = sweep(carry, dtr.X, dtr.y)
    W0 = np.asarray(carry.state.params.weights[0])  # [G, m_pad, s_pad]
    z = np.asarray(carry.ssm_z)  # [G, m_pad]
    for g in range(arch.num_branches):
        # excluded rows are exactly 0
        np.testing.assert_array_equal(W0[g][z[g] == 0], 0.0)
        # padded rows always excluded
        assert np.all(z[g][arch.m[g] :] == 0.0)
        # padded columns stay 0 on included rows too
        np.testing.assert_array_equal(W0[g][:, arch.s[g] :], 0.0)
    assert np.all(np.isfinite(np.asarray(carry.residual)))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["sequential", "parallel", "hybrid"])
def test_identifies_causal_markers(tmp_path, mode):
    arch, dtr, dte, causal = _sparse_linear_problem(seed=0)
    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=1))
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=120, burn_in=60, hmc_integration_length=20,
        hmc_step_size_mode="dual_averaging", update_mode=mode,
        block_size=2 if mode == "hybrid" else 0,
        ss_markers=True, outpath=str(tmp_path), seed=2,
    )
    net, stats = train(net, dtr, cfg, test_data=dte, verbose=False)
    probs = json.load(open(os.path.join(str(tmp_path), "inclusion_probs")))
    pip = np.concatenate([np.array(p) for p in probs["pip_markers"]])
    null = np.delete(pip, causal)
    assert pip[causal].mean() > 0.5, pip[causal]
    assert null.mean() < 0.05, null.mean()
    # prediction at a reasonable fraction of the h2 = 0.5 ceiling
    from rs_bann_tpu.vis import posterior_predictions

    preds = posterior_predictions(os.path.join(str(tmp_path), "models"), dte.X)
    r2 = float(np.corrcoef(preds.mean(0), np.asarray(dte.y))[0, 1] ** 2)
    assert r2 > 0.38, r2
    assert stats.acceptance_rate() > 0.3


@pytest.mark.slow
def test_ssm_with_branch_ss_and_packed(tmp_path):
    """ss_markers composes with branch-level spike_slab and packed X."""
    from rs_bann_tpu.group.grouping import UniformGrouping
    from rs_bann_tpu.io.bed import BedVM
    from rs_bann_tpu.models.data import pack_stacked

    G, m, n = 4, 12, 256
    bed = BedVM.random(n, G * m, seed=4)
    grouping = UniformGrouping(G, m)
    arch = NetArch.from_width_rules(
        [m] * G, 0, ("fixed", 4), ("like_hidden",), activation="identity"
    )
    rng = np.random.default_rng(0)
    y = rng.standard_normal(n).astype(np.float32)
    data = pack_stacked(arch, bed, grouping, y)
    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=1))
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=8, burn_in=4, hmc_integration_length=5,
        hmc_step_size_mode="dual_averaging", update_mode="hybrid",
        block_size=2, ss_markers=True, spike_slab=True,
        outpath=str(tmp_path), seed=0,
    )
    net, stats = train(net, data, cfg, verbose=False)
    probs = json.load(open(os.path.join(str(tmp_path), "inclusion_probs")))
    assert "pip" in probs and "pip_markers" in probs
    assert np.isfinite(stats.mse_train).all()


# ------------------- lasso slab via Park-Casella scale mixture


def test_inverse_gaussian_sampler_moments():
    """InvGauss(mu, lam): mean mu, variance mu^3/lam."""
    from rs_bann_tpu.samplers import gibbs

    for mu, lam in [(1.0, 1.0), (0.5, 4.0), (3.0, 0.8)]:
        x = np.asarray(
            gibbs.inverse_gaussian(jax.random.key(7), jnp.full(200_000, mu), lam)
        )
        assert np.all(x > 0)
        assert abs(x.mean() - mu) < 0.02 * mu + 4 * np.sqrt(mu**3 / lam / 2e5)
        var = mu**3 / lam
        assert abs(x.var() - var) < 0.1 * var + 1e-3


def test_scale_mixture_recovers_laplace_marginal():
    """w | s ~ N(0, s), s ~ Exp(rate lam^2/2) has the Laplace(rate lam)
    marginal — the augmentation identity the lasso slab relies on."""
    lam = 1.7
    rng = np.random.default_rng(0)
    k1, k2 = jax.random.split(jax.random.key(1))
    s = np.asarray(jax.random.exponential(k1, (200_000,))) / (lam**2 / 2)
    w = np.asarray(jax.random.normal(k2, (200_000,))) * np.sqrt(s)
    # Laplace(rate lam): sd = sqrt(2)/lam, P(|w| < t) = 1 - exp(-lam t)
    assert abs(w.std() - np.sqrt(2) / lam) < 0.01
    t = 0.5
    assert abs((np.abs(w) < t).mean() - (1 - np.exp(-lam * t))) < 0.01


def test_lasso_ssm_smoke_and_zeros():
    """lasso_ard + ss_markers runs, keeps excluded rows exactly 0, and
    respects padding in every schedule."""
    arch, dtr, _, _ = _sparse_linear_problem(seed=5, G=2, m=10, n=200)
    state, _ = init_net(arch, "lasso_ard", InitCfg(seed=1))
    net = Net("lasso_ard", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=6, burn_in=6, hmc_integration_length=5,
        hmc_step_size_mode="dual_averaging", update_mode="sequential",
        ss_markers=True, outpath="/tmp/ssm_lasso_test", seed=0,
    )
    sweep = jax.jit(net.make_sweep(cfg))
    carry = net.init_carry(dtr.X, dtr.y, jax.random.key(0), ss_markers=True)
    for _ in range(6):
        carry, _ = sweep(carry, dtr.X, dtr.y)
    W0 = np.asarray(carry.state.params.weights[0])
    z = np.asarray(carry.ssm_z)
    for g in range(arch.num_branches):
        np.testing.assert_array_equal(W0[g][z[g] == 0], 0.0)
        assert np.all(z[g][arch.m[g]:] == 0.0)
        np.testing.assert_array_equal(W0[g][:, arch.s[g]:], 0.0)
    assert np.all(np.isfinite(np.asarray(carry.residual)))


@pytest.mark.slow
def test_lasso_ssm_identifies_causal_markers(tmp_path):
    """Per-marker selection works through the Laplace slab too."""
    arch, dtr, dte, causal = _sparse_linear_problem(seed=0)
    state, _ = init_net(arch, "lasso_ard", InitCfg(seed=1))
    net = Net("lasso_ard", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=120, burn_in=60, hmc_integration_length=20,
        hmc_step_size_mode="dual_averaging", update_mode="hybrid",
        block_size=2, ss_markers=True, outpath=str(tmp_path), seed=2,
    )
    net, stats = train(net, dtr, cfg, test_data=dte, verbose=False)
    probs = json.load(open(os.path.join(str(tmp_path), "inclusion_probs")))
    pip = np.concatenate([np.array(p) for p in probs["pip_markers"]])
    null = np.delete(pip, causal)
    assert pip[causal].mean() > 0.5, pip[causal]
    assert null.mean() < 0.1, null.mean()
    from rs_bann_tpu.vis import posterior_predictions

    preds = posterior_predictions(os.path.join(str(tmp_path), "models"), dte.X)
    r2 = float(np.corrcoef(preds.mean(0), np.asarray(dte.y))[0, 1] ** 2)
    assert r2 > 0.35, r2


@pytest.mark.parametrize("packed", [False, True])
def test_blocked_scan_matches_sequential_replica(packed):
    """The blocked coefficient-space execution (16-marker blocks, Gram
    updates, residual per block — VERDICT r3 #4) must equal the plain
    marker-by-marker rank-1 scan draw-for-draw: same permutation, same
    per-marker fold_in keys, so a sequential replica of the collapsed move
    reproduces the exact draws; only float association differs.

    The packed case pins the ADVICE-r4 note: the packed path's q_a uses the
    data-computed Gram diagonal (true x_jᵀx_j of the standardized decoded
    column), matching the dense path — NOT the pre-r4 pinned sxx = n."""
    rng = np.random.default_rng(7)
    n, m_pad, s = 300, 24, 4  # 3 blocks of kb=8
    if packed:
        from rs_bann_tpu.models.density import PackedX
        from rs_bann_tpu.ops.packed_matmul import pack_strided

        vals = rng.integers(0, 3, size=(m_pad, n)).astype(np.float32)
        mu = vals.mean(axis=1)
        sd = vals.std(axis=1)
        scale = (1.0 / sd).astype(np.float32)
        x = ((vals - mu[:, None]) * scale[:, None]).T.astype(np.float32)
        x_in = PackedX(
            jnp.asarray(pack_strided(vals)), jnp.asarray(scale),
            jnp.asarray(mu.astype(np.float32)), n,
        )
    else:
        x = rng.standard_normal((n, m_pad)).astype(np.float32)
    W0 = (rng.standard_normal((m_pad, s)) * 0.3).astype(np.float32)
    b0 = np.zeros(s, np.float32)
    w_out = rng.standard_normal((s, 1)).astype(np.float32)
    lam_e = 1.7
    lam_rows = jnp.asarray(np.full(m_pad, 1.3, np.float32))
    resid0 = rng.standard_normal(n).astype(np.float32)
    rm = jnp.ones(m_pad)
    cm = jnp.ones(s)
    key = jax.random.key(11)

    z_b, W0_b, e_b = _marker_ss_scan(
        key, x_in if packed else jnp.asarray(x), jnp.asarray(W0),
        jnp.asarray(b0), jnp.asarray(w_out), jnp.asarray(resid0), lam_e,
        lam_rows, 0.4, rm, cm, False,
    )

    # sequential replica (the pre-blocking algorithm), same key derivations
    w = w_out[:, 0]
    wn2 = float(w @ w)
    wnorm = np.sqrt(max(wn2, 1e-30))
    what = w / wnorm
    key2, k_eta = jax.random.split(key)
    k_perm, k_scan = jax.random.split(key2)
    order = np.asarray(jax.random.permutation(k_perm, m_pad))
    eta = np.clip(np.broadcast_to(
        np.maximum(np.asarray(lam_rows), 1e-6)[:, None], (m_pad, s)
    ), 1e-6, 1e12)
    e = resid0.copy()
    W0s = W0.copy()
    zs = np.zeros(m_pad, np.float32)
    pi_m = 0.4
    for j in order:
        kj = jax.random.fold_in(k_scan, int(j))
        k_z, k_a, k_o = jax.random.split(kj, 3)
        x_j = x[:, j]
        row = W0s[j]
        e_mj = e + x_j * float(row @ w)
        u = float(x_j @ e_mj)
        d_j = np.asarray(cm) / eta[j]
        dw = d_j * what
        v_a = max(float(what @ dw), 1e-30)
        lam_a = 1.0 / v_a
        q_a = lam_a + lam_e * float(x_j @ x_j) * wn2
        log_bf = 0.5 * np.log(lam_a / q_a) + 0.5 * (lam_e * wnorm * u) ** 2 / q_a
        logit = np.log(pi_m) - np.log1p(-pi_m) + log_bf
        p = 1.0 / (1.0 + np.exp(-logit))
        zj = float(np.asarray(jax.random.bernoulli(k_z, min(p, 1.0))))
        a = lam_e * wnorm * u / q_a + float(
            np.asarray(jax.random.normal(k_a, ()))
        ) / np.sqrt(q_a)
        xi = np.asarray(jax.random.normal(k_o, (s,))) * np.sqrt(d_j)
        xi = xi - dw * (float(xi @ what) / v_a)
        new_row = (dw / v_a) * a + xi if zj > 0 else np.zeros(s)
        e = e_mj - x_j * float(new_row @ w)
        W0s[j] = new_row
        zs[j] = zj

    np.testing.assert_allclose(np.asarray(z_b), zs, atol=0)
    np.testing.assert_allclose(np.asarray(W0_b), W0s, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_b), e, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_learned_pi_converges_from_adversarial_inits(tmp_path):
    """VERDICT r4 #8: the Beta-Bernoulli pi update must converge from FAR
    initializations, not just a lucky one. Truth: 6 causal of 80 markers
    (7.5%). Two chains initialized at pi=0.9 (adversarial: near-total
    inclusion) and pi=0.02 (near-total exclusion) must both end with a
    posterior-mean pi in a band around the true sparsity and agree with
    each other."""
    arch, dtr, dte, causal = _sparse_linear_problem(seed=3)
    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=1))
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    pis = {}
    for init_pi in (0.9, 0.02):
        cfg = MCMCCfg(
            chain_length=160, burn_in=80, hmc_integration_length=20,
            hmc_step_size_mode="dual_averaging", update_mode="hybrid",
            block_size=2, ss_markers=True, ssm_pi=init_pi, ssm_warmup=0,
            outpath=str(tmp_path / f"pi{init_pi}"), seed=2,
        )
        n2, stats = train(net, dtr, cfg, test_data=dte, verbose=False)
        probs = json.load(
            open(os.path.join(str(tmp_path / f"pi{init_pi}"),
                              "inclusion_probs"))
        )
        pis[init_pi] = probs["pi_markers"]
        pip = np.concatenate([np.array(p) for p in probs["pip_markers"]])
        # selection survives the adversarial init
        assert pip[causal].mean() > 0.5, (init_pi, pip[causal])
    # both runs land in a band around the true inclusion fraction (6/80 =
    # 7.5%; the posterior mean sits near (1+nz)/(2+M)) and near each other
    for init_pi, pi in pis.items():
        assert 0.01 < pi < 0.35, (init_pi, pi)
    assert abs(pis[0.9] - pis[0.02]) < 0.15, pis
