"""Packed whole-trajectory leapfrog kernel (ops/leapfrog.integrate_chains_packed).

Interpret mode on CPU: f32 math, so the kernel (in-kernel 2-bit decode +
standardize, part-major target permutation, resident bytes) must agree with
the reference autodiff leapfrog on the densely decoded standardized X to
float roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.ops import branch_mlp as bm
from rs_bann_tpu.ops.leapfrog import integrate_chains_packed, packed_fits_vmem
from rs_bann_tpu.ops.packed_matmul import pack_strided


@pytest.fixture(autouse=True)
def _interpret():
    bm.FORCE = "interpret"
    yield
    bm.FORCE = None


@pytest.mark.parametrize(
    "act,l1,n,depth,stream",
    [
        ("tanh", False, 1024, 1, False),
        # n not a multiple of the 512-individual pack group: pins the
        # in-kernel validity mask over the pack padding
        ("identity", False, 700, 0, False),
        ("identity", True, 1536, 0, False),
        # grid-streamed variant (bytes in HBM-style tiles, scratch-resident
        # state): the UKB-460k path; forced via env on small shapes
        ("tanh", False, 1024, 1, True),
        ("identity", False, 700, 0, True),
        ("identity", True, 1536, 0, True),
    ],
)
def test_integrate_chains_packed_matches_autodiff(act, l1, n, depth, stream,
                                                  monkeypatch):
    if stream:
        monkeypatch.setenv("RS_BANN_TRAJ_STREAM", "1")
    rng = np.random.default_rng(1)
    G, C, m, h, s, L_steps = 2, 3, 12, 8, 8, 4
    m_pad = 16
    if depth == 1:
        widths = [(m_pad, h), (h, s), (s, 1)]
    else:
        widths = [(m_pad, s), (s, 1)]
    mk = lambda sc: tuple(
        jnp.asarray(rng.standard_normal((G, C, i, o)).astype(np.float32)) * sc
        for i, o in widths
    )
    mkb = lambda sc: tuple(
        jnp.asarray(rng.standard_normal((G, C, o)).astype(np.float32)) * sc
        for i, o in widths[:-1]
    )
    weights, p_w = mk(0.3), mk(0.5)
    eps_w = tuple(jnp.abs(e) * 0.01 for e in mk(1.0))
    lam_w = tuple(jnp.abs(e) + 0.5 for e in mk(1.0))
    biases, p_b = mkb(0.1), mkb(0.5)
    eps_b = tuple(jnp.abs(e) * 0.01 for e in mkb(1.0))
    lam_b = tuple(jnp.zeros_like(e) for e in mkb(1.0))

    # raw genotypes on the true markers; padded markers get scale 0
    geno = rng.integers(0, 3, size=(G, m, n)).astype(np.float32)
    bytes_g = np.stack([
        pack_strided(np.pad(geno[g], ((0, m_pad - m), (0, 0))))
        for g in range(G)
    ])
    shift = np.zeros((G, m_pad), np.float32)
    scale = np.zeros((G, m_pad), np.float32)
    shift[:, :m] = geno.mean(axis=2)
    sd = geno.std(axis=2)
    scale[:, :m] = np.where(sd > 0, 1.0 / np.maximum(sd, 1e-12), 0.0)
    x_std = np.zeros((G, m_pad, n), np.float32)
    x_std[:, :m, :] = (geno - shift[:, :m, None]) * scale[:, :m, None]

    targets = jnp.asarray(rng.standard_normal((G, C, n)).astype(np.float32))
    err = jnp.asarray(
        np.abs(rng.standard_normal((G, C))).astype(np.float32) + 0.5
    )

    w_f, b_f, pw_f, pb_f = integrate_chains_packed(
        act, jnp.asarray(bytes_g), jnp.asarray(scale), jnp.asarray(shift),
        targets, err, weights, biases, p_w, p_b, eps_w, eps_b,
        lam_w, lam_b, L_steps, n, l1=l1, interpret=True,
    )

    def ld(w, b, x_g, t, e, lw):
        a = x_g
        for l in range(len(w) - 1):
            z = jax.lax.dot_general(
                w[l], a, (((0,), (0,)), ((), ()))
            ) + b[l][:, None]
            a = bm._act(act, z)
        pred = jnp.sum(w[-1] * a, axis=0)
        rss = jnp.sum((pred - t) ** 2)
        if l1:
            pri = -sum(
                jnp.sum(li * wi * jnp.sign(wi)) for li, wi in zip(lw, w)
            )
        else:
            pri = -0.5 * sum(jnp.sum(li * wi * wi) for li, wi in zip(lw, w))
        return pri - e * rss / 2.0

    grad = jax.jit(jax.grad(ld, argnums=(0, 1)))
    nlayer = len(widths)
    for g in range(G):
        for c in [0, C - 1]:
            w = tuple(wi[g, c] for wi in weights)
            b = tuple(bi[g, c] for bi in biases)
            pw = tuple(pi[g, c] for pi in p_w)
            pb = tuple(pi[g, c] for pi in p_b)
            ew = tuple(ei[g, c] for ei in eps_w)
            ebs = tuple(ei[g, c] for ei in eps_b)
            lw = tuple(li[g, c] for li in lam_w)
            gw, gb = grad(w, b, x_std[g], targets[g, c], err[g, c], lw)
            for _ in range(L_steps):
                pw = tuple(p + 0.5 * e * gg for p, e, gg in zip(pw, ew, gw))
                pb = tuple(p + 0.5 * e * gg for p, e, gg in zip(pb, ebs, gb))
                w = tuple(wi + e * p for wi, e, p in zip(w, ew, pw))
                b = tuple(bi + e * p for bi, e, p in zip(b, ebs, pb))
                gw, gb = grad(w, b, x_std[g], targets[g, c], err[g, c], lw)
                pw = tuple(p + 0.5 * e * gg for p, e, gg in zip(pw, ew, gw))
                pb = tuple(p + 0.5 * e * gg for p, e, gg in zip(pb, ebs, gb))
            for l in range(nlayer):
                np.testing.assert_allclose(
                    w[l], w_f[l][g, c], atol=3e-5, rtol=2e-4
                )
                np.testing.assert_allclose(
                    pw[l], pw_f[l][g, c], atol=3e-5, rtol=2e-4
                )
            for l in range(nlayer - 1):
                np.testing.assert_allclose(
                    b[l], b_f[l][g, c], atol=3e-5, rtol=2e-4
                )
                np.testing.assert_allclose(
                    pb[l], pb_f[l][g, c], atol=3e-5, rtol=2e-4
                )


def test_packed_fits_vmem_bounds():
    # n=100k production shape fits; UKB-460k does not (falls back)
    assert packed_fits_vmem(104, 25088, C=1)
    assert packed_fits_vmem(104, 25088, C=4)
    assert not packed_fits_vmem(104, 115200, C=1)
