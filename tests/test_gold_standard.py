"""Gold-standard sampler validation: HMC-within-Gibbs posterior vs
brute-force numerical integration on a tiny model.

Model: one branch, one marker, depth 0, summary width 1, identity
activation, all precisions FIXED (fixed_param_precisions mode), intercept
disabled by centering. The posterior over the 3 free parameters
(w0 (1x1 summary weight), b0 (summary bias), w1 (output weight)) is
computed on a dense grid and its marginal moments of the *identifiable*
quantities — the effective slope w0*w1 and effective intercept b0*w1 —
are compared against the MCMC estimates. This validates the complete
transition (step sizes, leapfrog, Metropolis correction, residual
bookkeeping) against exact Bayes, not just against the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net
from rs_bann_tpu.models.params import StackedParams, StackedPrecisions
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

LAM_W, LAM_E = 1.0, 1.0  # fixed prior and error precisions
N = 40


def _data():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(N).astype(np.float32)
    x = (x - x.mean()) / x.std()
    y = 0.8 * x + 0.3 + rng.normal(0, 1.0, N).astype(np.float32)
    return x, y.astype(np.float32)


def _log_post_grid(x, y, w0, b0, w1):
    """Unnormalized log posterior on broadcastable grids.

    Marginal-mode density (branch_sampler.rs:72-128): weight prior terms
    for w0 and w1 at fixed precision, UNREGULARIZED bias, rss term. The
    intercept is disabled, so the model is y ~ (x*w0 + b0)*w1 + noise minus
    the per-update ML intercept — handled by centering y and x.
    """
    pred = (x[:, None, None, None] * w0 + b0) * w1  # [N, ...]
    rss = ((pred - y[:, None, None, None]) ** 2).sum(axis=0)
    return (
        -0.5 * LAM_E * rss
        - 0.5 * LAM_W * (w0**2)
        - 0.5 * LAM_W * (w1**2)
    )


@pytest.mark.slow
def test_hmc_matches_grid_integration(tmp_path):
    x, y = _data()
    # mean-center so the ML intercept update is a (near) no-op
    y = y - y.mean()

    # ---- brute force: grid over (w0, b0, w1)
    w0g = np.linspace(-2.5, 2.5, 101)
    b0g = np.linspace(-2.5, 2.5, 101)
    w1g = np.linspace(-2.5, 2.5, 101)
    W0, B0, W1 = np.meshgrid(w0g, b0g, w1g, indexing="ij")
    lp = _log_post_grid(x, y, W0, B0, W1)
    p = np.exp(lp - lp.max())
    p /= p.sum()
    slope = W0 * W1
    intercept = B0 * W1
    exp_slope = float((p * slope).sum())
    exp_slope2 = float((p * slope**2).sum())
    exp_int = float((p * intercept).sum())

    # ---- MCMC with the full machinery
    arch = NetArch(
        m=(1,), h=(1,), s=(1,), depth=0, pad_multiple=1, activation="identity"
    )
    state, _ = init_net(
        arch, "ridge_base", InitCfg(fixed_param_precision=LAM_W, seed=0)
    )
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=20,
        hmc_step_size_mode="dual_averaging", seed=7,
        fixed_param_precisions=True,
    )
    from rs_bann_tpu.train import prepare_state_for_training

    prepare_state_for_training(net, LAM_W)
    # fixed_param_precisions pins the weight/bias precisions; the error
    # precision is still Gibbs-redrawn per branch update (reference
    # semantics), so pin it by overwriting the carry before each sweep.
    sweep = jax.jit(net.make_sweep(cfg))
    Xs = jnp.asarray(x.reshape(1, N, 1))
    ys = jnp.asarray(y)
    carry = net.init_carry(Xs, ys, jax.random.key(7), 1.0)

    def pin(c):
        prec = c.state.precisions._replace(error=jnp.asarray(LAM_E))
        return c._replace(state=c.state._replace(precisions=prec))

    slopes, intercepts = [], []
    warmup, keep = 300, 1500
    for i in range(warmup + keep):
        carry, _ = sweep(pin(carry), Xs, ys)
        if i >= warmup:
            s = carry.state
            w0 = float(s.params.weights[0][0, 0, 0])
            b0 = float(s.params.biases[0][0, 0])
            w1 = float(s.params.weights[1][0, 0, 0])
            ob = float(s.output_bias)
            slopes.append(w0 * w1)
            intercepts.append(b0 * w1 + ob)

    # Only the SLOPE w0*w1 is cleanly comparable: with mean-zero x the
    # slope is orthogonal to the intercept direction, which the per-update
    # ML intercept (net.rs:319-332 semantics) continually re-absorbs.
    del exp_int, intercepts
    slopes = np.asarray(slopes)
    from rs_bann_tpu.vis import ess

    se_slope = slopes.std() / np.sqrt(max(ess(slopes), 1.0))
    assert abs(slopes.mean() - exp_slope) < max(4 * se_slope, 0.03), (
        f"slope mean {slopes.mean():.4f} vs grid {exp_slope:.4f}"
    )
    var_grid = exp_slope2 - exp_slope**2
    assert abs(slopes.var() - var_grid) < 0.5 * var_grid + 0.01, (
        f"slope var {slopes.var():.4f} vs grid {var_grid:.4f}"
    )
