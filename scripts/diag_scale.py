"""Empirical scaling study of the flagship sweep (what actually binds?).

diag_bw r3 findings: map-f32 44.9 ms/sweep; bf16 X storage is FREE (XLA
hoists the default-precision f32->bf16 cast of X out of the leapfrog scan,
so both variants stream bf16 X = 67 MB per direction); vmap chain folding
is 2.4x SLOWER despite reading X once. If the sweep is X-stream-bound we
expect time ~ C * L * G * m * n. This script perturbs one axis at a time
around the flagship point (C=4, n=4096, L=64, G=64, m=64, h=32, tanh d=1)
and also times K=8 sweeps inside one compiled scan (dispatch floor), then
captures a profiler trace of 3 sweeps for offline op-level attribution.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, flush=True)


def sync(tree):
    import jax

    return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])


def timed(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def build(G, m, n, h, depth, C, L, act="tanh"):
    import jax
    import jax.numpy as jnp

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    arch = NetArch.uniform(G, m, h, depth, h, activation=act)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    Xf = np.zeros((G, arch.m_pad, n), np.float32)
    Xf[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
    X = D.FeatX(jnp.asarray(Xf))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=L,
        hmc_step_size_mode="izmailov", update_mode="parallel",
        num_chains=C, seed=0,
    )
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
    return net, sweep, carry, X, y


def run_point(tag, G=64, m=64, n=4096, h=32, depth=1, C=4, L=64, sweeps=6):
    net, sweep, carry, X, y = build(G, m, n, h, depth, C, L)
    t0 = time.time()
    carry, stats = sweep(carry, X, y)
    sync(stats)
    comp = time.time() - t0
    box = {"c": carry}

    def run():
        c = box["c"]
        for _ in range(sweeps):
            c, s = sweep(c, X, y)
        sync(s)
        box["c"] = c

    dt = timed(run) / sweeps
    log(f"{tag:>18}: {dt*1e3:7.1f} ms/sweep (compile {comp:.0f}s) "
        f"[G={G} m={m} n={n} h={h} d={depth} C={C} L={L}]")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    log("device:", jax.devices()[0].device_kind)
    t0 = time.time()
    sync(jnp.zeros(8) + 1.0)
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    r = {}
    r["base"] = run_point("base")
    r["n2048"] = run_point("n2048", n=2048)
    r["n8192"] = run_point("n8192", n=8192)
    r["L32"] = run_point("L32", L=32)
    r["C1"] = run_point("C1", C=1)
    r["C2"] = run_point("C2", C=2)
    r["G32"] = run_point("G32", G=32)
    r["d0-identity"] = run_point("d0-identity", depth=0)
    r["m128"] = run_point("m128", m=128)

    # K sweeps inside one compiled call (dispatch floor)
    net, sweep, carry, X, y = build(64, 64, 4096, 32, 1, 4, 64)
    K = 8
    sweep1 = net.make_sweep(
        __import__("rs_bann_tpu.samplers.mcmc_cfg", fromlist=["MCMCCfg"]).MCMCCfg(
            chain_length=1, burn_in=10**9, hmc_integration_length=64,
            hmc_step_size_mode="izmailov", update_mode="parallel",
            num_chains=4, seed=0,
        )
    )

    def k_sweeps(c, X_, y_):
        def body(ci, _):
            ci, s = jax.lax.map(lambda cj: sweep1(cj, X_, y_), ci)
            return ci, s

        c, ss = jax.lax.scan(body, c, None, length=K)
        return c, ss

    ksweep = jax.jit(k_sweeps)
    t0 = time.time()
    carry2, ss = ksweep(carry, X, y)
    sync(ss)
    log(f"k-sweep compile {time.time()-t0:.0f}s")
    box = {"c": carry2}

    def runk():
        c = box["c"]
        c, s = ksweep(c, X, y)
        sync(s)
        box["c"] = c

    dt = timed(runk) / K
    r["scan8"] = dt
    log(f"{'scan8-in-one-call':>18}: {dt*1e3:7.1f} ms/sweep")

    log(json.dumps({k: round(v * 1e3, 1) for k, v in r.items()}))

    # profiler trace of 3 sweeps (offline op attribution)
    try:
        net, sweep, carry, X, y = build(64, 64, 4096, 32, 1, 4, 64)
        carry, s = sweep(carry, X, y)
        sync(s)
        with jax.profiler.trace("/tmp/jax_trace"):
            for _ in range(3):
                carry, s = sweep(carry, X, y)
            sync(s)
        log("trace written to /tmp/jax_trace")
    except Exception as e:
        log(f"profiler failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
