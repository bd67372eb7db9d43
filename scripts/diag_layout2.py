"""Layout A/B on the REAL compiled sweep (bench.py flagship config).

The synthetic double-vmap micro-bench (diag_layout.py) is not
representative (3x slower than the real sweep at the same shape); this
drives net.make_sweep exactly as bench.py does — parallel update, C=4
chains via lax.map — and compares:

  A. dense sample-major [G, n, m_pad]   (BENCH_r02 layout)
  B. feature-major FeatX [G, m_pad, n]
  C. FeatX + bf16 matmul inputs (set_compute_dtype)
  D. dense + bf16

One process for all variants (each fresh TPU process pays a multi-minute
tunnel claim).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(tree):
    import jax

    return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    log("device:", jax.devices()[0].device_kind)
    t0 = time.time()
    sync(jnp.zeros(8) + 1.0)
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    G, m, n, h, depth, C, L = 64, 64, 4096, 32, 1, 4, 64
    sweeps = 10
    F_TRUE = 3 * (2 * n * (m * h + h * h + h)) - 2 * n * m * h

    arch = NetArch.uniform(G, m, h, depth, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    Xs_np = np.zeros((G, n, arch.m_pad), np.float32)
    Xs_np[:, :, :m] = rng.standard_normal((G, n, m), dtype=np.float32)
    Xs = jnp.asarray(Xs_np)
    Xf = D.FeatX(jnp.asarray(np.ascontiguousarray(Xs_np.transpose(0, 2, 1))))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    cfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=L,
        hmc_step_size_mode="izmailov", update_mode="parallel",
        num_chains=C, seed=0,
    )

    def run(tag, X, dtype=None):
        D.set_compute_dtype(dtype)
        try:
            sweep1 = net.make_sweep(cfg)
            sweep = jax.jit(
                lambda c, X_, y_: jax.lax.map(lambda ci: sweep1(ci, X_, y_), c)
            )
            keys = jax.random.split(jax.random.key(0), C)
            carry = jax.jit(
                lambda s, X_, y_, ks: jax.vmap(
                    lambda k: net.init_carry(X_, y_, k, state=s)
                )(ks)
            )(net.state, X, y, keys)
            jax.block_until_ready(carry)
            t0 = time.time()
            carry, stats = sweep(carry, X, y)
            sync(stats)
            compile_s = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                c2 = carry
                for _ in range(sweeps):
                    c2, stats = sweep(c2, X, y)
                sync(stats)
                times.append(time.time() - t0)
            carry = c2
            dt = float(np.median(times))
            steps = sweeps * C * G * L
            tf = steps / dt * F_TRUE / 1e12
            acc = np.asarray(stats.counts)[:, 0].sum() / (31 * C * G)
            log(
                f"[{tag}] compile {compile_s:.1f}s; median {dt:.3f}s "
                f"[{min(times):.3f},{max(times):.3f}] -> "
                f"{steps/dt:,.0f} steps/s; {tf:.1f} TF/s true "
                f"({100*tf/197:.1f}% bf16 peak); acc={acc:.2f} "
                f"mse={np.asarray(stats.mse_train).mean():.3f}"
            )
        finally:
            D.set_compute_dtype(None)

    run("A dense f32", Xs)
    run("B featx f32", Xf)
    run("C featx bf16", Xf, "bfloat16")
    run("D dense bf16", Xs, "bfloat16")


if __name__ == "__main__":
    main()
