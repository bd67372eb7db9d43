"""Packed (2-bit HBM-resident) genotype path vs the dense standardized path:
forward, gradients, and full training sweeps must agree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.io.bed import BedVM
from rs_bann_tpu.group.grouping import UniformGrouping
from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.data import pack_stacked
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net
from rs_bann_tpu.ops.packed_matmul import (
    FUSED_ACTIVATIONS,
    _act_apply,
    _packed_matmul_ref,
    _pallas_bwd,
    _pallas_fwd,
    _pallas_fwd_fused,
    pack_strided,
    packed_linear,
    unpack_bytes,
    unpack_strided,
)
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg


def _setup(n=50, G=2, m=6, seed=0):
    bed = BedVM.random(n, G * m, seed=seed)
    grouping = UniformGrouping(G, m)
    arch = NetArch.uniform(G, m, 4, 0, 4)
    rng = np.random.default_rng(seed)
    y = rng.standard_normal(n).astype(np.float32)
    from rs_bann_tpu.io.genotypes import CompressedGenotypes

    gen = CompressedGenotypes(bed, grouping)
    dense = gen.to_stacked(arch, y)
    packed = pack_stacked(arch, bed, grouping, y)
    return arch, dense, packed


def test_unpack_matches_bed_decode():
    bed = BedVM.random(23, 5, seed=1)
    dec = np.asarray(unpack_bytes(jnp.asarray(bed.data), 23))
    np.testing.assert_array_equal(dec, bed.data_f32().T)


def test_strided_pack_round_trip():
    rng = np.random.default_rng(0)
    for n in (512, 513, 700, 1024, 37):
        vals = rng.integers(0, 3, size=(5, n)).astype(np.float32)
        by = pack_strided(vals)
        assert by.shape[1] % 128 == 0
        np.testing.assert_array_equal(
            np.asarray(unpack_strided(jnp.asarray(by), n)), vals
        )


def test_packed_forward_matches_dense():
    arch, dense, packed = _setup()
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=3))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    a = np.asarray(net.predict(dense.X))
    b = np.asarray(net.predict(packed.X))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_packed_gradient_matches_dense():
    arch, dense, packed = _setup()
    state, _ = init_net(arch, "lasso_base", InitCfg(seed=3))
    pot = D.potential_fn("lasso_base", "tanh")
    w = tuple(w[0] for w in state.params.weights)
    b = tuple(b[0] for b in state.params.biases)
    lam = tuple(a[0] for a in state.precisions.weights)
    g_dense = jax.grad(pot, argnums=(0, 1))(
        w, b, lam, jnp.asarray(1.0), dense.X[0], dense.y
    )
    g_packed = jax.grad(pot, argnums=(0, 1))(
        w, b, lam, jnp.asarray(1.0), packed.X[0], dense.y
    )
    for a_, b_ in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_packed)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=2e-3, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("update_mode", ["sequential", "parallel"])
def test_packed_sweep_matches_dense(update_mode):
    """Same seed, packed vs dense input: identical sampler trajectory."""
    arch, dense, packed = _setup(n=40)
    outs = []
    for data in (dense, packed):
        state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
        net = Net("ridge_base", arch, D.Hyperparameters(), state)
        cfg = MCMCCfg(
            chain_length=3, burn_in=10**9, hmc_integration_length=10,
            update_mode=update_mode, seed=7,
        )
        sweep = jax.jit(net.make_sweep(cfg))
        carry = net.init_carry(data.X, data.y, jax.random.key(7))
        for _ in range(3):
            carry, stats = sweep(carry, data.X, data.y)
        outs.append(np.asarray(carry.residual))
    np.testing.assert_allclose(outs[0], outs[1], rtol=5e-3, atol=5e-4)


def test_pallas_kernels_interpret_mode():
    """The TPU kernels, run in interpreter mode on CPU, match the jnp ref."""
    rng = np.random.default_rng(0)
    m, n, k = 16, 600, 8
    vals = rng.integers(0, 3, size=(m, n)).astype(np.float32)
    by = jnp.asarray(pack_strided(vals))
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    ref = np.asarray(_packed_matmul_ref(by, a, n))
    out = np.asarray(_pallas_fwd(by, a, n, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5)

    g = jnp.asarray(rng.standard_normal((by.shape[1] * 4, k)).astype(np.float32))
    ref_b = np.asarray(
        jax.lax.dot_general(
            unpack_strided(by, by.shape[1] * 4), g, (((1,), (0,)), ((), ()))
        )
    )
    out_b = np.asarray(_pallas_bwd(by, g, n, interpret=True))
    # per-part dots change the f32 accumulation order slightly
    np.testing.assert_allclose(out_b, ref_b, rtol=1e-4)


@pytest.mark.parametrize("act", FUSED_ACTIVATIONS)
def test_pallas_fused_kernel_interpret_mode(act):
    """Fused decode+matmul+offset+activation kernel matches the jnp ref."""
    rng = np.random.default_rng(3)
    m, n, k = 16, 600, 8
    vals = rng.integers(0, 3, size=(m, n)).astype(np.float32)
    by = jnp.asarray(pack_strided(vals))
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    off = jnp.asarray(rng.standard_normal(k).astype(np.float32))
    ref = np.asarray(_act_apply(act, _packed_matmul_ref(by, a, n) + off[None, :]))
    out = np.asarray(_pallas_fwd_fused(by, a, off, n, act, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("act", FUSED_ACTIVATIONS)
def test_pallas_bwd_fused_kernel_interpret_mode(act):
    """Backward kernel with in-kernel h'(out) matches the jnp formula."""
    from rs_bann_tpu.ops.packed_matmul import _act_prime_from_out, _pallas_bwd_fused

    rng = np.random.default_rng(7)
    m, n, k = 16, 600, 8
    vals = rng.integers(0, 3, size=(m, n)).astype(np.float32)
    by = jnp.asarray(pack_strided(vals))
    B4 = by.shape[1] * 4
    g = jnp.asarray(rng.standard_normal((B4, k)).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((B4, k)).astype(np.float32))
    dz = g * _act_prime_from_out(act, res)
    ref = np.asarray(
        jax.lax.dot_general(unpack_strided(by, B4), dz, (((1,), (0,)), ((), ())))
    )
    out, d_off = _pallas_bwd_fused(by, g, res, n, act, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d_off)[0], np.asarray(jnp.sum(dz, axis=0)), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("act", FUSED_ACTIVATIONS)
def test_packed_linear_gradient(act):
    """Custom VJP of the fused op matches autodiff of the unfused math."""
    rng = np.random.default_rng(5)
    m, n, k = 12, 70, 4
    vals = rng.integers(0, 3, size=(m, n)).astype(np.float32)
    by = jnp.asarray(pack_strided(vals))
    a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    off = jnp.asarray(rng.standard_normal(k).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    def fused(a_, off_):
        return jnp.vdot(packed_linear(by, a_, off_, n, act), ct)

    def unfused(a_, off_):
        dec = unpack_strided(by, n)
        z = jax.lax.dot_general(dec, a_, (((0,), (0,)), ((), ()))) + off_[None, :]
        return jnp.vdot(_act_apply(act, z), ct)

    ga, go = jax.grad(fused, argnums=(0, 1))(a, off)
    ra, ro = jax.grad(unfused, argnums=(0, 1))(a, off)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(ro), rtol=1e-4, atol=1e-5)


def test_packed_analysis_matches_dense():
    """effect_sizes / branch_r2s / activations / gradients agree between the
    dense and 2-bit packed genotype forms (VERDICT r1 #6: the analysis
    surface must not force the dense materialization at genome scale)."""
    from rs_bann_tpu.io.bed import BedVM
    from rs_bann_tpu.group.grouping import UniformGrouping
    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.data import pack_stacked
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net

    G, m, n, h = 3, 10, 64, 4
    bed = BedVM.random(n, G * m, seed=3)
    grouping = UniformGrouping(G, m)
    arch = NetArch.uniform(G, m, h, 1, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=2))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(n).astype(np.float32)

    from rs_bann_tpu.io.genotypes import CompressedGenotypes

    gen = CompressedGenotypes(bed, grouping)
    dense = gen.to_stacked(arch, y)
    packed = pack_stacked(arch, bed, grouping, y)

    es_d = np.asarray(net.effect_sizes(dense.X))
    es_p = np.asarray(net.effect_sizes(packed.X))
    np.testing.assert_allclose(es_p, es_d, rtol=1e-4, atol=1e-5)

    r2_d = np.asarray(net.branch_r2s(dense.X, dense.y))
    r2_p = np.asarray(net.branch_r2s(packed.X, packed.y))
    np.testing.assert_allclose(r2_p, r2_d, rtol=1e-4, atol=1e-5)

    pes_d = net.population_effect_sizes(dense.X)
    pes_p = net.population_effect_sizes(packed.X)
    np.testing.assert_allclose(pes_p, pes_d, rtol=1e-4, atol=1e-5)

    acts_d = net.activations(dense.X)
    acts_p = net.activations(packed.X)
    for g in range(G):
        for l in range(arch.num_layers):
            np.testing.assert_allclose(
                acts_p[g][l], acts_d[g][l], rtol=1e-4, atol=1e-5
            )

    gr_d = net.gradients(dense.X, dense.y)
    gr_p = net.gradients(packed.X, packed.y)
    for g in range(G):
        for a, b in zip(gr_d[g][0], gr_p[g][0]):
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)
