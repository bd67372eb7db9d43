"""Ablation: where do the lean hmc transition's 35 ms/sweep go, when the
stripped leapfrog loop does the same vg work in 13 ms? (flagship shape,
per-chain lax.map arrangement in all variants)

V0  stripped: vg of 0.5*rss, single param update per step
V1  + full leapfrog: momenta carried, two half-step updates + position
V2  + the real potential (density.forward via matmul_fm + prior terms),
      grads of the log density
V3  + izmailov eps arrays (broadcast per coordinate) instead of scalar eps
V4  the real make_hmc_step lean path (adds masked momentum sampling,
      initial vg, final value pass, ΔH dead check)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models import params as P
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.ops import branch_mlp
from rs_bann_tpu.samplers.hmc import make_hmc_step
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg


def sync(tree):
    return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])


def timed(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    G, m, n, h, C, L = 64, 64, 4096, 32, 4, 64
    sweeps = 5
    act = "tanh"
    arch = NetArch.uniform(G, m, h, 1, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    m_pad, s = arch.m_pad, h
    rng = np.random.default_rng(0)
    xT = jnp.asarray(
        rng.standard_normal((G, m_pad, n)).astype(np.float32), jnp.bfloat16
    )
    X = D.FeatX(xT)
    widths = [(m_pad, h), (h, s), (s, 1)]
    wc = tuple(
        jnp.asarray(rng.standard_normal((G, C, i, o)).astype(np.float32)) * 0.2
        for i, o in widths
    )
    bc = tuple(
        jnp.asarray(rng.standard_normal((G, C, o)).astype(np.float32)) * 0.1
        for i, o in widths[:-1]
    )
    tgt = jnp.asarray(rng.standard_normal((G, C, n)).astype(np.float32))
    eps = 1e-3
    err = jnp.asarray(1.0)
    masks_w = tuple(jnp.asarray(a) for a in P.weight_masks(arch))
    masks_b = tuple(jnp.asarray(a) for a in P.bias_masks(arch))
    statics = jax.tree.map(jnp.asarray, D.branch_statics(arch))
    wp1 = tuple(p for p in state.precisions.weights)   # [G, ...]
    bp1 = tuple(p for p in state.precisions.biases)

    def loss_fm(w_g, b_g, x_g, t_g):
        a = x_g
        for l in range(len(w_g) - 1):
            z = jax.lax.dot_general(
                w_g[l].astype(jnp.bfloat16), a.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_g[l][:, None]
            a = branch_mlp._act(act, z)
        pred = jnp.sum(w_g[-1] * a, axis=0)
        return 0.5 * jnp.sum((pred - t_g) ** 2)

    vg0 = jax.vmap(jax.value_and_grad(loss_fm, argnums=(0, 1)),
                   in_axes=(0, 0, 0, 0))

    def pot_real(w_g, b_g, wp_g, x_g, t_g):
        _, acts = D.forward(act, w_g, b_g, x_g)
        y_pred = acts[-1][:, 0]
        r = y_pred - t_g
        rss = jnp.sum(r * r)
        prior = D.log_density_wrt_weights("ridge_base", w_g, wp_g)
        return prior - err * rss / 2.0

    vg2 = jax.vmap(jax.value_and_grad(pot_real, argnums=(0, 1)),
                   in_axes=(0, 0, 0, 0, 0))

    def run_variant(body_per_chain):
        # CRITICAL harness rule: the evolved states MUST thread through the
        # sweep scan — an unchanged carry lets XLA hoist the entire sweep
        # out of the loop (LICM), reporting 1/sweeps of the true cost
        tcg0 = jnp.swapaxes(tgt, 0, 1)

        @jax.jit
        def run(wc, bc):
            wcg0 = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), wc)
            bcg0 = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), bc)

            def chain(args):
                w, b, t = args
                return body_per_chain(w, b, t)

            def one_sweep(carry, _):
                w, b = carry  # [C, G, ...]
                w, b, rs = jax.lax.map(chain, (w, b, tcg0))
                return (w, b), jnp.sum(rs)

            (w, b), rs = jax.lax.scan(
                one_sweep, (wcg0, bcg0), None, length=sweeps
            )
            return rs

        return run

    # V0: stripped
    def v0(w, b, t):
        def lf(carry, _):
            w, b = carry
            rss, (dws, dbs) = vg0(w, b, xT, t)
            w = tuple(wi - eps * d for wi, d in zip(w, dws))
            b = tuple(bi - eps * d for bi, d in zip(b, dbs))
            return (w, b), jnp.sum(rss)

        (w, b), rs = jax.lax.scan(lf, (w, b), None, length=L)
        return w, b, rs[-1]

    # V1: + momenta/leapfrog
    def v1(w, b, t):
        pw = tuple(jnp.zeros_like(x) + 0.1 for x in w)
        pb = tuple(jnp.zeros_like(x) + 0.1 for x in b)
        _, (gw, gb) = vg0(w, b, xT, t)

        def lf(carry, _):
            w, b, pw, pb, gw, gb = carry
            pw = tuple(p - 0.5 * eps * g for p, g in zip(pw, gw))
            pb = tuple(p - 0.5 * eps * g for p, g in zip(pb, gb))
            w = tuple(wi + eps * p for wi, p in zip(w, pw))
            b = tuple(bi + eps * p for bi, p in zip(b, pb))
            rss, (gw, gb) = vg0(w, b, xT, t)
            pw = tuple(p - 0.5 * eps * g for p, g in zip(pw, gw))
            pb = tuple(p - 0.5 * eps * g for p, g in zip(pb, gb))
            return (w, b, pw, pb, gw, gb), jnp.sum(rss)

        (w, b, pw, pb, gw, gb), rs = jax.lax.scan(
            lf, (w, b, pw, pb, gw, gb), None, length=L
        )
        return w, b, rs[-1]

    # V2: real potential (density.forward + prior), scalar eps
    def v2(w, b, t):
        pw = tuple(jnp.zeros_like(x) + 0.1 for x in w)
        pb = tuple(jnp.zeros_like(x) + 0.1 for x in b)
        _, (gw, gb) = vg2(w, b, wp1, X, t)

        def lf(carry, _):
            w, b, pw, pb, gw, gb = carry
            pw = tuple(p + 0.5 * eps * g for p, g in zip(pw, gw))
            pb = tuple(p + 0.5 * eps * g for p, g in zip(pb, gb))
            w = tuple(wi + eps * p for wi, p in zip(w, pw))
            b = tuple(bi + eps * p for bi, p in zip(b, pb))
            ld, (gw, gb) = vg2(w, b, wp1, X, t)
            pw = tuple(p + 0.5 * eps * g for p, g in zip(pw, gw))
            pb = tuple(p + 0.5 * eps * g for p, g in zip(pb, gb))
            return (w, b, pw, pb, gw, gb), jnp.sum(ld)

        (w, b, pw, pb, gw, gb), rs = jax.lax.scan(
            lf, (w, b, pw, pb, gw, gb), None, length=L
        )
        return w, b, rs[-1]

    # V3: + per-coordinate izmailov-like eps arrays
    import math
    fac = math.pi / (2.0 * 64)
    eps_w = tuple(
        jnp.broadcast_to(fac / jnp.sqrt(p), (G,) + wl.shape[2:])
        for p, wl in zip(wp1, wc)
    )
    eps_b = tuple(
        jnp.broadcast_to(
            fac / jnp.sqrt(p.reshape(G, -1)[:, :1]), (G,) + bl.shape[2:]
        )
        for p, bl in zip(bp1, bc)
    )

    def v3(w, b, t):
        pw = tuple(jnp.zeros_like(x) + 0.1 for x in w)
        pb = tuple(jnp.zeros_like(x) + 0.1 for x in b)
        _, (gw, gb) = vg2(w, b, wp1, X, t)

        def lf(carry, _):
            w, b, pw, pb, gw, gb = carry
            pw = tuple(p + 0.5 * e * g for p, e, g in zip(pw, eps_w, gw))
            pb = tuple(p + 0.5 * e * g for p, e, g in zip(pb, eps_b, gb))
            w = tuple(wi + e * p for wi, e, p in zip(w, eps_w, pw))
            b = tuple(bi + e * p for bi, e, p in zip(b, eps_b, pb))
            ld, (gw, gb) = vg2(w, b, wp1, X, t)
            pw = tuple(p + 0.5 * e * g for p, e, g in zip(pw, eps_w, gw))
            pb = tuple(p + 0.5 * e * g for p, e, g in zip(pb, eps_b, gb))
            return (w, b, pw, pb, gw, gb), jnp.sum(ld)

        (w, b, pw, pb, gw, gb), rs = jax.lax.scan(
            lf, (w, b, pw, pb, gw, gb), None, length=L
        )
        return w, b, rs[-1]

    # V4: the real lean hmc
    cfg = MCMCCfg(chain_length=1, burn_in=10**9, hmc_integration_length=L,
                  hmc_step_size_mode="izmailov", update_mode="parallel",
                  num_chains=C, seed=0)
    hmc = make_hmc_step("ridge_base", act, cfg, defer_accept=True)
    keysG = jax.random.split(jax.random.key(0), G)

    def v4(w, b, t):
        out = jax.vmap(
            lambda k, w_g, b_g, wp_g, bp_g, x_g, t_g, mw, mb, npar: hmc(
                k, w_g, b_g, wp_g, bp_g, err, x_g, t_g, mw, mb, npar
            )
        )(keysG, w, b, wp1, bp1, X, t, masks_w, masks_b, statics.n_params)
        return out.weights, out.biases, jnp.sum(out.kin_prop)

    steps = sweeps * C * G * L
    for name, body in (("V0 stripped", v0), ("V1 +leapfrog", v1),
                       ("V2 +real potential", v2), ("V3 +eps arrays", v3),
                       ("V4 lean hmc", v4)):
        run = run_variant(body)
        t0 = time.time()
        sync(run(wc, bc))
        comp = time.time() - t0
        med = timed(lambda: sync(run(wc, bc)))
        print(f"{name}: compile {comp:.0f}s; {med/sweeps*1e3:.1f} ms/sweep "
              f"-> {steps/med:,.0f} steps/s", flush=True)


if __name__ == "__main__":
    main()
