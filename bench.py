"""Benchmark: HMC leapfrog throughput of the compiled Gibbs sweep.

Workload: a genome-scale-shaped block net — 64 branches x 64 markers,
n=4096 individuals, one hidden layer of 32, block-parallel update mode,
4 vectorized chains — the flagship configuration of this framework
(multi-branch + multi-chain, which the rs-bann reference cannot express:
it runs one chain, one branch at a time, host-driven).

Metric: leapfrog steps/s/chip, where one step = one per-branch leapfrog
integration step (forward+backward pass + momentum update) — counted as
chains x branches x integration_length x sweeps.

vs_baseline: the reference publishes no numbers (BASELINE.md), so we
self-baseline against the reference's algorithm compiled as well as possible
on the same chip: one chain, branches updated one at a time in a sequential
scan (net.rs:258-334 semantics, but fully jitted — a generous stand-in for
the ArrayFire host-driven loop, which additionally pays per-op dispatch).
The ratio isolates the win of the TPU-native design: vectorized chains +
block-parallel branches feeding the MXU with batched work.

Prints ONE json line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(tree):
    """True device barrier: jax.block_until_ready can return before
    execution completes through the axon TPU tunnel, so force a host
    readback of one leaf (measured: timings without this are fiction)."""
    import jax

    return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    G, m, n, h, depth, C, L = 64, 64, 4096, 32, 1, 4, 64
    sweeps = 10

    arch = NetArch.uniform(G, m, h, depth, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)

    rng = np.random.default_rng(0)
    X = np.zeros((G, n, arch.m_pad), np.float32)
    X[:, :, :m] = rng.standard_normal((G, n, m), dtype=np.float32)
    X = jnp.asarray(X)
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    cfg = MCMCCfg(
        chain_length=1,
        burn_in=10**9,
        hmc_integration_length=L,
        hmc_step_size_mode="izmailov",
        update_mode="parallel",
        num_chains=C,
        seed=0,
    )
    sweep1 = net.make_sweep(cfg)
    # sequential chains in one program: faster than a vmapped chain batch
    # on a single chip (VMEM pressure); see DESIGN.md performance notes
    sweep = jax.jit(
        lambda c, X_, y_: jax.lax.map(lambda ci: sweep1(ci, X_, y_), c)
    )
    keys = jax.random.split(jax.random.key(0), C)
    carry = jax.jit(
        lambda s, X_, y_, ks: jax.vmap(
            lambda k: net.init_carry(X_, y_, k, state=s)
        )(ks)
    )(net.state, X, y, keys)

    log(f"compiling sweep: G={G} m={m} n={n} h={h} depth={depth} C={C} L={L}")
    t0 = time.time()
    carry, stats = sweep(carry, X, y)
    sync(stats)
    log(f"compile+first sweep: {time.time() - t0:.1f}s")

    t0 = time.time()
    for _ in range(sweeps):
        carry, stats = sweep(carry, X, y)
    sync(stats)
    dt = time.time() - t0
    steps = sweeps * C * G * L
    steps_per_s = steps / dt
    log(
        f"{sweeps} sweeps in {dt:.2f}s -> {steps_per_s:,.0f} leapfrog steps/s/chip "
        f"(mse={np.asarray(stats.mse_train).mean():.3f}, "
        f"acc={np.asarray(stats.counts)[:, 0].sum() / (sweeps * C * G + C * G):.2f})"
    )

    # ---- secondary: effective samples per second (north-star metric #2):
    # ESS of the per-sweep training-mse series across kept sweeps x chains
    from rs_bann_tpu.vis import ess

    ess_sweeps = 64
    mse_series = []
    t0 = time.time()
    for _ in range(ess_sweeps):
        carry, stats = sweep(carry, X, y)
        mse_series.append(stats.mse_train)
    sync(stats)
    ess_dt = time.time() - t0
    mse_series = np.asarray(mse_series)  # [sweeps, C]
    ess_total = sum(ess(mse_series[:, c]) for c in range(C))
    log(
        f"effective samples/s (mse statistic, {ess_sweeps} sweeps x {C} chains): "
        f"{ess_total / ess_dt:.1f}"
    )

    # ---- self-baseline: the reference's algorithm (sequential random-scan
    # Gibbs, one chain), fully compiled on the same chip
    base_cfg = MCMCCfg(
        chain_length=1,
        burn_in=10**9,
        hmc_integration_length=L,
        hmc_step_size_mode="izmailov",
        update_mode="sequential",
        num_chains=1,
        seed=0,
    )
    base_sweep = jax.jit(net.make_sweep(base_cfg))
    base_carry = jax.jit(
        lambda s, X_, y_, k: net.init_carry(X_, y_, k, state=s)
    )(net.state, X, y, jax.random.key(2))
    t0 = time.time()
    base_carry, base_stats = base_sweep(base_carry, X, y)
    sync(base_stats)
    log(f"baseline compile+first sweep: {time.time() - t0:.1f}s")
    base_sweeps = 3
    t0 = time.time()
    for _ in range(base_sweeps):
        base_carry, base_stats = base_sweep(base_carry, X, y)
    sync(base_stats)
    base_dt = time.time() - t0
    base_steps_per_s = base_sweeps * G * L / base_dt
    log(
        f"sequential single-chain baseline (reference algorithm, compiled): "
        f"{base_steps_per_s:,.0f} steps/s ({base_sweeps} sweeps in {base_dt:.2f}s)"
    )

    print(
        json.dumps(
            {
                "metric": "hmc_leapfrog_steps_per_s_per_chip",
                "value": round(steps_per_s, 1),
                "unit": "leapfrog steps/s (fwd+bwd per branch) on G=64,m=64,n=4096,h=32,d=1,C=4",
                "vs_baseline": round(steps_per_s / base_steps_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
