"""Speed check: chain-folded fused kernel (data_vg_chains) vs the production
per-chain XLA autodiff arrangement, on the flagship leapfrog workload.

Simulates the leapfrog inner loop: scan of L steps, each step one
value-and-grad of the data term + elementwise momentum/position updates —
the real sweep's cost structure minus Gibbs bookkeeping (measured <5% of
the sweep). Run on the TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from rs_bann_tpu.ops import branch_mlp


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
    G, m, n, h, C, L = 64, 64, 4096, 32, 4, 64
    sweeps = 5
    act = "tanh"
    m_pad, s = m, h
    rng = np.random.default_rng(0)
    xT = jnp.asarray(
        rng.standard_normal((G, m_pad, n)).astype(np.float32), jnp.bfloat16
    )
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

    @jax.jit
    def run_folded(wc, bc):
        def lf(carry, _):
            w, b = carry
            _, rss, dws, dbs = branch_mlp.data_vg_chains(act, xT, w, b, tgt)
            w = tuple(wi - eps * d for wi, d in zip(w, dws))
            b = tuple(bi - eps * d for bi, d in zip(b, dbs))
            return (w, b), jnp.sum(rss)

        def one_sweep(carry, _):
            (w, b), rs = jax.lax.scan(lf, carry, None, length=L)
            return (w, b), rs[-1]

        (w, b), rs = jax.lax.scan(one_sweep, (wc, bc), None, length=sweeps)
        return rs

    # per-chain production arrangement: lax.map over chains, vmap over G,
    # XLA autodiff (the current dense flagship path)
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

    vg = jax.value_and_grad(loss_fm, argnums=(0, 1))
    vg_g = jax.vmap(vg, in_axes=(0, 0, 0, 0))

    @jax.jit
    def run_perchain(wc, bc):
        def chain(args):
            w, b, t = args  # [G, ...] for one chain

            def lf(carry, _):
                w, b = carry
                rss, (dws, dbs) = vg_g(w, b, xT, t)
                w = tuple(wi - eps * d for wi, d in zip(w, dws))
                b = tuple(bi - eps * d for bi, d in zip(b, dbs))
                return (w, b), jnp.sum(rss)

            (w, b), rs = jax.lax.scan(lf, (w, b), None, length=L)
            return rs[-1]

        def one_sweep(carry, _):
            w, b = carry
            wcg = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), w)  # [C,G,..]
            bcg = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), b)
            tcg = jnp.swapaxes(tgt, 0, 1)
            rs = jax.lax.map(chain, (wcg, bcg, tcg))
            return (w, b), jnp.sum(rs)

        _, rs = jax.lax.scan(one_sweep, (wc, bc), None, length=sweeps)
        return rs

    steps = sweeps * C * G * L
    for name, fn in (("folded chain-kernel", run_folded),
                     ("per-chain XLA autodiff", run_perchain)):
        t0 = time.time()
        sync(fn(wc, bc))
        compile_s = time.time() - t0
        med, lo, hi = timed(lambda: sync(fn(wc, bc)))
        print(f"{name}: compile {compile_s:.1f}s; {med/sweeps*1e3:.1f} ms/sweep "
              f"[{lo/sweeps*1e3:.1f}, {hi/sweeps*1e3:.1f}] -> "
              f"{steps/med:,.0f} leapfrog steps/s", flush=True)


if __name__ == "__main__":
    main()


def traj_kernel_bench():
    """Whole-trajectory kernel (ops/leapfrog.py) at the flagship shape,
    with honestly-evolving state (see exp_chainfold3 LICM note)."""
    import jax
    import jax.numpy as jnp
    from rs_bann_tpu.ops.leapfrog import integrate_chains

    G, m, n, h, C, L = 64, 64, 4096, 32, 4, 64
    sweeps = 5
    act = "tanh"
    rng = np.random.default_rng(0)
    xT = jnp.asarray(
        rng.standard_normal((G, m, n)).astype(np.float32), jnp.bfloat16
    )
    widths = [(m, h), (h, h), (h, 1)]
    mk = lambda sc: tuple(
        jnp.asarray(rng.standard_normal((G, C, i, o)).astype(np.float32)) * sc
        for i, o in widths
    )
    mkb = lambda sc: tuple(
        jnp.asarray(rng.standard_normal((G, C, o)).astype(np.float32)) * sc
        for i, o in widths[:-1]
    )
    weights = mk(0.2)
    p_w = mk(0.5)
    eps_w = tuple(jnp.full_like(w, 2e-3) for w in weights)
    lam_w = tuple(jnp.ones_like(w) for w in weights)
    biases = mkb(0.1)
    p_b = mkb(0.5)
    eps_b = tuple(jnp.full_like(b, 2e-3) for b in biases)
    lam_b = tuple(jnp.zeros_like(b) for b in biases)
    targets = jnp.asarray(rng.standard_normal((G, C, n)).astype(np.float32))
    err = jnp.ones((G, C), jnp.float32)

    @jax.jit
    def run(w, b):
        def one_sweep(carry, _):
            w, b = carry
            w, b, pw, pb = integrate_chains(
                act, xT, targets, err, w, b, p_w, p_b, eps_w, eps_b,
                lam_w, lam_b, L,
            )
            return (w, b), jnp.sum(pw[0][:, :, 0, 0])
        (w, b), ks = jax.lax.scan(one_sweep, (w, b), None, length=sweeps)
        return ks

    t0 = time.time()
    sync(run(weights, biases))
    comp = time.time() - t0
    med, lo, hi = timed(lambda: sync(run(weights, biases)))
    steps = sweeps * C * G * L
    print(f"trajectory kernel: compile {comp:.1f}s; {med/sweeps*1e3:.1f} ms/sweep "
          f"[{lo/sweeps*1e3:.1f}, {hi/sweeps*1e3:.1f}] -> "
          f"{steps/med:,.0f} leapfrog steps/s", flush=True)
