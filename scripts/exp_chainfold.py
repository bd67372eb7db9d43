"""Experiment: chain-folded X-stream for the dense flagship HMC (VERDICT r3 #1).

The flagship sweep runs chains via ``lax.map`` — each chain streams the
branch genotypes X separately, and the r3 scaling study showed the sweep is
HBM-bound on exactly that stream. Hypothesis: nesting the chain axis INSIDE
the per-branch vmap (arrays laid out [G, C, ...], G outermost — matching X's
[G, m_pad, n] layout) lets XLA batch the layer dots over chains with X as a
shared operand: ONE X stream per leapfrog step for all C chains, and C·h=128
output rows filling full MXU tiles.

The r3 attempt vmapped chains OUTERMOST ([C, G, ...]) and measured 2.4x
SLOWER — every dot then needs a [C,G,..] -> [G,C,..] transpose to line the
batch dim up with X, re-laid-out at every scan step. This experiment times
all three arrangements on the real transition (samplers/hmc.make_hmc_step):

  A  lax.map over C of vmap_G(hmc)        (current production)
  B  vmap_G(vmap_C(hmc, x unbatched))     ([G, C, ...], proposed)
  C  vmap_C(vmap_G(hmc))                  ([C, G, ...], the r3 negative)

Run on the TPU: python scripts/exp_chainfold.py
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
    return float(np.median(ts)), float(min(ts)), float(max(ts))


def main():
    G, m, n, h, depth, C, L = 64, 64, 4096, 32, 1, 4, 64
    calls = 5  # hmc transitions per timed run (each integrates L steps)

    arch = NetArch.uniform(G, m, h, depth, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    cfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=L,
        hmc_step_size_mode="izmailov", update_mode="parallel",
        num_chains=C, seed=0,
    )
    hmc = make_hmc_step("ridge_base", "tanh", cfg, defer_accept=True)

    rng = np.random.default_rng(0)
    Xf = np.zeros((G, arch.m_pad, n), np.float32)
    Xf[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
    X = D.FeatX(jnp.asarray(Xf, dtype=jnp.bfloat16))
    targets = jnp.asarray(
        rng.standard_normal((C, G, n)).astype(np.float32)
    )

    masks_w = tuple(jnp.asarray(a) for a in P.weight_masks(arch))
    masks_b = tuple(jnp.asarray(a) for a in P.bias_masks(arch))
    statics = jax.tree.map(jnp.asarray, D.branch_statics(arch))
    err = jnp.asarray(1.0)

    # chain-stacked params [C, G, ...] by jittering the init
    def cstack(a):
        return jnp.stack([a + 0.01 * i for i in range(C)])

    wc = tuple(cstack(w) for w in state.params.weights)  # [C, G, in, out]
    bc = tuple(cstack(b) for b in state.params.biases)
    wpc = tuple(cstack(p) for p in state.precisions.weights)
    bpc = tuple(cstack(p) for p in state.precisions.biases)
    keys = jax.random.split(jax.random.key(0), C * G).reshape(C, G)

    def one(k, w_g, b_g, wp_g, bp_g, x_g, t_g, mw_g, mb_g, npar):
        return hmc(k, w_g, b_g, wp_g, bp_g, err, x_g, t_g, mw_g, mb_g, npar)

    # ---- A: lax.map over chains of vmap over G (current production shape)
    per_chain = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0))

    def chainA(args):
        k, w, b, wp, bp, t = args
        return per_chain(k, w, b, wp, bp, X, t, masks_w, masks_b,
                         statics.n_params)

    @jax.jit
    def runA(keys, w, b, wp, bp, t):
        def body(c, _):
            out = jax.lax.map(chainA, (keys, w, b, wp, bp, t))
            return (keys, out.weights, out.biases, wp, bp, t), out.kin_prop

        (_, w, b, _, _, _), kins = jax.lax.scan(
            body, (keys, w, b, wp, bp, t), None, length=calls
        )
        return w, kins

    # ---- B: [G, C, ...] — vmap over G outermost, chains inner, X shared
    inner = jax.vmap(
        one, in_axes=(0, 0, 0, 0, 0, None, 0, None, None, None)
    )  # over C; x_g, masks, npar shared
    folded = jax.vmap(
        inner, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    )  # over G

    def gfirst(tree):
        return jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), tree)

    @jax.jit
    def runB(keys, w, b, wp, bp, t):
        # transpose once outside the hot loop: [C, G, ...] -> [G, C, ...]
        keys, w, b, wp, bp, t = jax.tree.map(
            lambda a: jnp.swapaxes(a, 0, 1), (keys, w, b, wp, bp, t)
        )

        def body(c, _):
            out = folded(keys, w, b, wp, bp, X, t, masks_w, masks_b,
                         statics.n_params)
            return (w, out.weights, out.biases), out.kin_prop

        (_, w_f, b_f), kins = jax.lax.scan(
            body, (w, w, b), None, length=calls
        )
        return w_f, kins

    # ---- C: [C, G, ...] — chains outermost (the r3 negative, for reference)
    both = jax.vmap(per_chain, in_axes=(0, 0, 0, 0, 0, None, 0, None, None, None))

    @jax.jit
    def runC(keys, w, b, wp, bp, t):
        def body(c, _):
            out = both(keys, w, b, wp, bp, X, t, masks_w, masks_b,
                       statics.n_params)
            return (w, out.weights, out.biases), out.kin_prop

        (_, w_f, b_f), kins = jax.lax.scan(
            body, (w, w, b), None, length=calls
        )
        return w_f, kins

    steps = calls * C * G * L
    for name, fn in (("A lax.map(C) x vmap(G)", runA),
                     ("B vmap(G) x vmap(C) [G,C]", runB),
                     ("C vmap(C) x vmap(G) [C,G]", runC)):
        t0 = time.time()
        out = fn(keys, wc, bc, wpc, bpc, targets)
        sync(out[1])
        compile_s = time.time() - t0
        med, lo, hi = timed(lambda: sync(fn(keys, wc, bc, wpc, bpc, targets)[1]))
        print(f"{name}: compile {compile_s:.1f}s; median {med*1e3:.1f} ms "
              f"[{lo*1e3:.1f}, {hi*1e3:.1f}] -> {steps/med:,.0f} leapfrog steps/s",
              flush=True)


if __name__ == "__main__":
    main()
