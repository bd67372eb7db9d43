"""Fused branch-MLP data-vg kernel (ops/branch_mlp.py) vs autodiff.

The kernel computes the potential's data term (y_pred, rss, d(rss/2)/dθ)
in one X stream (interpret mode on the CPU test mesh, f32 inputs — exact
math). Reference: the autodiff of the same feature-major forward the
sampler otherwise uses (samplers/hmc.py potential).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.models import density as D
from rs_bann_tpu.ops import branch_mlp as bm


@pytest.fixture(autouse=True)
def _interpret():
    bm.FORCE = "interpret"
    yield
    bm.FORCE = None


def _autodiff_ref(act, xT, ws, bs, t):
    def loss(ws, bs):
        a = xT
        for l in range(len(ws) - 1):
            z = jax.lax.dot_general(
                ws[l], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bs[l][:, None]
            a = bm._act(act, z)
        pred = jnp.sum(ws[-1] * a, axis=0)
        return 0.5 * jnp.sum((pred - t) ** 2), pred

    return jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(ws, bs)


@pytest.mark.parametrize("act", list(bm.SUPPORTED_ACTIVATIONS))
@pytest.mark.parametrize("widths,n", [((24, 16, 8, 1), 384), ((16, 8, 1), 300)])
def test_matches_autodiff(act, widths, n):
    rng = np.random.default_rng(0)
    xT = jnp.asarray(rng.standard_normal((widths[0], n)), jnp.float32)
    ws = tuple(
        jnp.asarray(rng.standard_normal((widths[i], widths[i + 1])) * 0.3,
                    jnp.float32)
        for i in range(len(widths) - 1)
    )
    bs = tuple(
        jnp.asarray(rng.standard_normal((widths[i + 1],)) * 0.1, jnp.float32)
        for i in range(len(widths) - 2)
    )
    t = jnp.asarray(rng.standard_normal(n), jnp.float32)
    (l0, pred0), (gw, gb) = _autodiff_ref(act, xT, ws, bs, t)
    yp, rss, dws, dbs = bm.data_vg(act, xT, ws, bs, t)
    np.testing.assert_allclose(yp, pred0, atol=2e-5)
    np.testing.assert_allclose(rss, 2 * l0, rtol=1e-5)
    for a, b in zip(dws, gw):
        np.testing.assert_allclose(a, b, atol=5e-4)
    for a, b in zip(dbs, gb):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_vmap_over_branches():
    rng = np.random.default_rng(1)
    G, m_pad, h, n = 5, 16, 8, 256
    xT = jnp.asarray(rng.standard_normal((G, m_pad, n)), jnp.float32)
    W0 = jnp.asarray(rng.standard_normal((G, m_pad, h)) * 0.3, jnp.float32)
    W1 = jnp.asarray(rng.standard_normal((G, h, 1)) * 0.3, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((G, h)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((G, n)), jnp.float32)
    yp, rss, dws, dbs = jax.vmap(
        lambda x, w0, w1, bb, tt: bm.data_vg("tanh", x, (w0, w1), (bb,), tt)
    )(xT, W0, W1, b0, t)
    yp2, rss2, dws2, _ = bm.data_vg(
        "tanh", xT[2], (W0[2], W1[2]), (b0[2],), t[2]
    )
    np.testing.assert_allclose(yp[2], yp2, atol=1e-6)
    np.testing.assert_allclose(rss[2], rss2, rtol=1e-6)
    np.testing.assert_allclose(dws[0][2], dws2[0], atol=1e-6)


def test_hmc_step_fused_matches_exact():
    """make_hmc_step dispatches to the kernel for FeatX inputs; the proposal
    must match the autodiff path run on the same key (f32 interpret mode —
    only association-order roundoff differs)."""
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.params import bias_masks, weight_masks
    from rs_bann_tpu.samplers.hmc import make_hmc_step
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    rng = np.random.default_rng(2)
    G, m, h, n = 1, 12, 4, 256
    arch = NetArch.uniform(G, m, h, 1, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    cfg = MCMCCfg(chain_length=1, burn_in=0, hmc_integration_length=5,
                  hmc_step_size_mode="izmailov", seed=0)
    step = make_hmc_step("ridge_base", "tanh", cfg)
    xT = np.zeros((arch.m_pad, n), np.float32)
    xT[:m] = rng.standard_normal((m, n))
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    mw = tuple(jnp.asarray(m_[0]) for m_ in weight_masks(arch))
    mb = tuple(jnp.asarray(m_[0]) for m_ in bias_masks(arch))
    args = dict(
        key=jax.random.key(3),
        weights=tuple(w[0] for w in state.params.weights),
        biases=tuple(b[0] for b in state.params.biases),
        w_precisions=tuple(p[0] for p in state.precisions.weights),
        b_precisions=tuple(p[0] for p in state.precisions.biases),
        error_precision=jnp.float32(1.0),
        y=y, masks_w=mw, masks_b=mb,
        n_params=jnp.float32(m * h + h * h + h + 2 * h),
    )
    res_fused = step(x=D.FeatX(jnp.asarray(xT)), **args)
    bm.FORCE = "off"  # autodiff path, same key
    res_exact = step(x=D.FeatX(jnp.asarray(xT)), **args)
    np.testing.assert_allclose(
        res_fused.y_pred, res_exact.y_pred, atol=1e-3
    )
    for a, b in zip(res_fused.weights, res_exact.weights):
        np.testing.assert_allclose(a, b, atol=1e-3)
    assert res_fused.code == res_exact.code


@pytest.mark.parametrize("act", ["tanh", "silu"])
def test_blocked_matches_single(act):
    """G=8, h_pad=16 -> NB=8: the branch-blocked kernel (block-diagonal
    layer dots, custom_vmap rule) must equal per-branch single calls."""
    from rs_bann_tpu.ops.branch_mlp import _pick_nb

    rng = np.random.default_rng(3)
    G, m_pad, h, n = 8, 24, 16, 640
    ws = (
        jnp.asarray(rng.standard_normal((G, m_pad, h)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((G, h, h)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((G, h, 1)) * 0.3, jnp.float32),
    )
    bs = (
        jnp.asarray(rng.standard_normal((G, h)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((G, h)) * 0.1, jnp.float32),
    )
    assert _pick_nb(G, tuple(w[0] for w in ws)) == 8
    xT = jnp.asarray(rng.standard_normal((G, m_pad, n)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((G, n)), jnp.float32)
    yp, rss, dws, dbs = jax.vmap(
        lambda x, w0, w1, w2, b0, b1, tt: bm.data_vg(
            act, x, (w0, w1, w2), (b0, b1), tt
        )
    )(xT, *ws, *bs, t)
    for g in [0, 3, 7]:
        yp1, rss1, dws1, dbs1 = bm.data_vg(
            act, xT[g], tuple(w[g] for w in ws), tuple(b[g] for b in bs), t[g]
        )
        np.testing.assert_allclose(yp[g], yp1, atol=2e-5)
        np.testing.assert_allclose(rss[g], rss1, rtol=1e-5)
        for a, b in zip(dws, dws1):
            np.testing.assert_allclose(a[g], b, atol=5e-4)
        for a, b in zip(dbs, dbs1):
            np.testing.assert_allclose(a[g], b, atol=5e-4)


def test_full_sweep_fused_smoke():
    """A multi-chain parallel sweep on FeatX with the kernel engaged (the
    exact bench path): custom_vmap under the sweep's branch vmap inside
    lax.scan must trace, and the sampler must move (accept some)."""
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    G, m, n, h, C, L = 4, 8, 256, 4, 2, 5
    arch = NetArch.uniform(G, m, h, 1, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    Xf = np.zeros((G, arch.m_pad, n), np.float32)
    Xf[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
    X = D.FeatX(jnp.asarray(Xf, dtype=jnp.bfloat16))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cfg = MCMCCfg(chain_length=1, burn_in=10**9, hmc_integration_length=L,
                  hmc_step_size_mode="izmailov", update_mode="parallel",
                  num_chains=C, seed=0)
    s1 = net.make_sweep(cfg)
    sweep = jax.jit(lambda c, X_, y_: jax.lax.map(lambda ci: s1(ci, X_, y_), c))
    keys = jax.random.split(jax.random.key(0), C)
    carry = jax.jit(
        lambda s, X_, y_, ks: jax.vmap(
            lambda k: net.init_carry(X_, y_, k, state=s)
        )(ks)
    )(net.state, X, y, keys)
    for _ in range(8):
        carry, stats = sweep(carry, X, y)
    counts = np.asarray(stats.counts)[:, 0]
    assert counts.sum() > 0, "no accepted moves in 8 sweeps"
    assert np.all(np.isfinite(np.asarray(stats.mse_train)))


@pytest.mark.parametrize("act,depth", [("identity", 0), ("tanh", 1)])
def test_packed_matches_dense_autodiff(act, depth):
    """The packed fused kernel (in-kernel 2-bit decode, folded
    standardization) must match autodiff on the dense standardized matrix."""
    from rs_bann_tpu.models.density import PackedX
    from rs_bann_tpu.ops.packed_matmul import pack_strided

    rng = np.random.default_rng(4)
    G, m, m_pad, h, n = 4, 12, 16, 8, 700
    raw = rng.integers(0, 3, size=(G, m_pad, n)).astype(np.float32)
    raw[:, m:, :] = 0.0
    by = np.stack([pack_strided(raw[g]) for g in range(G)])
    mu = raw.mean(axis=2)
    sd = raw.std(axis=2)
    scale = np.where(sd > 0, 1.0 / np.where(sd > 0, sd, 1.0), 0.0)
    scale[:, m:] = 0.0
    mu[:, m:] = 0.0
    x = PackedX(jnp.asarray(by), jnp.asarray(scale.astype(np.float32)),
                jnp.asarray(mu.astype(np.float32)), n)
    dense = scale[:, :, None] * (raw - mu[:, :, None])  # [G, m_pad, n]

    widths = [m_pad] + [h] * depth + [h, 1]
    ws = tuple(
        jnp.asarray(rng.standard_normal((G, widths[i], widths[i + 1])) * 0.3,
                    jnp.float32)
        for i in range(len(widths) - 1)
    )
    bs = tuple(
        jnp.asarray(rng.standard_normal((G, widths[i + 1],)) * 0.1, jnp.float32)
        for i in range(len(widths) - 2)
    )
    t = jnp.asarray(rng.standard_normal((G, n)), jnp.float32)

    yp, rss, dws, dbs = jax.vmap(
        lambda xg, tt, *wb: bm.data_vg_packed(
            act, xg, wb[: len(ws)], wb[len(ws):], tt
        )
    )(x, t, *ws, *bs)

    for g in [0, 3]:
        (l0, pred0), (gw, gb) = _autodiff_ref(
            act, jnp.asarray(dense[g]), tuple(w[g] for w in ws),
            tuple(b[g] for b in bs), t[g],
        )
        np.testing.assert_allclose(yp[g], pred0, atol=5e-4)
        np.testing.assert_allclose(rss[g], 2 * l0, rtol=1e-4)
        for a, b in zip(dws, gw):
            np.testing.assert_allclose(a[g], b, atol=3e-3)
        for a, b in zip(dbs, gb):
            np.testing.assert_allclose(a[g], b, atol=3e-3)


def test_hmc_step_packed_fused_matches_exact():
    """PackedX dispatch through make_hmc_step (the production genome-scale
    path): kernel proposal vs the autodiff packed_linear path, same key."""
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.density import PackedX
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.params import bias_masks, weight_masks
    from rs_bann_tpu.ops.packed_matmul import pack_strided
    from rs_bann_tpu.samplers.hmc import make_hmc_step
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    rng = np.random.default_rng(5)
    G, m, h, n = 1, 12, 4, 600
    arch = NetArch.uniform(G, m, h, 0, h, activation="identity")
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    raw = rng.integers(0, 3, size=(arch.m_pad, n)).astype(np.float32)
    raw[m:] = 0.0
    mu, sd = raw.mean(1), raw.std(1)
    scale = np.where(sd > 0, 1.0 / np.where(sd > 0, sd, 1.0), 0.0)
    scale[m:] = 0.0
    mu[m:] = 0.0
    x = PackedX(jnp.asarray(pack_strided(raw)[None])[0],
                jnp.asarray(scale.astype(np.float32)),
                jnp.asarray(mu.astype(np.float32)), n)
    cfg = MCMCCfg(chain_length=1, burn_in=0, hmc_integration_length=4,
                  hmc_step_size_mode="izmailov", seed=0)
    step = make_hmc_step("ridge_base", "identity", cfg)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    mw = tuple(jnp.asarray(m_[0]) for m_ in weight_masks(arch))
    mb = tuple(jnp.asarray(m_[0]) for m_ in bias_masks(arch))
    args = dict(
        key=jax.random.key(7),
        weights=tuple(w[0] for w in state.params.weights),
        biases=tuple(b[0] for b in state.params.biases),
        w_precisions=tuple(p[0] for p in state.precisions.weights),
        b_precisions=tuple(p[0] for p in state.precisions.biases),
        error_precision=jnp.float32(1.0),
        y=y, masks_w=mw, masks_b=mb,
        n_params=jnp.float32(m * h + 2 * h),
    )
    res_fused = step(x=x, **args)
    bm.FORCE = "off"
    res_exact = step(x=x, **args)
    np.testing.assert_allclose(res_fused.y_pred, res_exact.y_pred, atol=2e-3)
    for a, b in zip(res_fused.weights, res_exact.weights):
        np.testing.assert_allclose(a, b, atol=2e-3)
    assert res_fused.code == res_exact.code
