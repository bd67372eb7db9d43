"""Combined TPU diagnostics (one process = one tunnel claim).

  A. flagship sweep, chains via lax.map (bench baseline) vs jax.vmap —
     if per-op sequencing overhead dominates (diag_overhead), folding the
     chain axis into each op divides the overhead by C.
  B. sweeps_per_call batching: K sweeps inside one compiled call (scan)
     — removes per-call dispatch/readback.
  C. packed genome-scale sweep (BENCH_r02 17-steps/s mystery): per-sweep
     timing + feature bisection (izmailov / no-mass / parallel).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    import jax

    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


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

    # ---------------- A/B: flagship chain-axis strategy -------------------
    G, m, n, h, depth, C, L = 64, 64, 4096, 32, 1, 4, 64
    sweeps = 10
    F_TRUE = 3 * (2 * n * (m * h + h * h + h)) - 2 * n * m * h
    arch = NetArch.uniform(G, m, h, depth, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    Xf_np = np.zeros((G, arch.m_pad, n), np.float32)
    Xf_np[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
    Xf = D.FeatX(jnp.asarray(Xf_np))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=L,
        hmc_step_size_mode="izmailov", update_mode="parallel",
        num_chains=C, seed=0,
    )
    sweep1 = net.make_sweep(cfg)
    keys = jax.random.split(jax.random.key(0), C)
    carry0 = jax.jit(
        lambda s, X_, y_, ks: jax.vmap(
            lambda k: net.init_carry(X_, y_, k, state=s)
        )(ks)
    )(net.state, Xf, y, keys)
    jax.block_until_ready(carry0)

    def bench_sweep(tag, sweep, carry, k_inner=1):
        t0 = time.time()
        carry1, stats = sweep(carry, Xf, y)
        sync(stats)
        log(f"[{tag}] compile+first: {time.time() - t0:.1f}s")
        times = []
        for _ in range(3):
            c = carry1
            t0 = time.time()
            for _ in range(sweeps // k_inner):
                c, stats = sweep(c, Xf, y)
            sync(stats)
            times.append(time.time() - t0)
        dt = float(np.median(times))
        steps = sweeps * C * G * L
        log(f"[{tag}] median {dt:.3f}s [{min(times):.3f},{max(times):.3f}] "
            f"-> {steps/dt:,.0f} steps/s; "
            f"{steps/dt*F_TRUE/1e12:.1f} TF/s ({100*steps/dt*F_TRUE/1e12/197:.1f}% peak)")

    sweep_map = jax.jit(
        lambda c, X_, y_: jax.lax.map(lambda ci: sweep1(ci, X_, y_), c)
    )
    bench_sweep("A1 chains=lax.map (baseline)", sweep_map, carry0)

    sweep_vmap = jax.jit(jax.vmap(sweep1, in_axes=(0, None, None)))
    bench_sweep("A2 chains=vmap", sweep_vmap, carry0)

    # B: K sweeps per compiled call (lax.map chains, scan over sweeps)
    K = 10

    def multi(c, X_, y_):
        def one_chain(ci):
            def body(cc, _):
                cc, st = sweep1(cc, X_, y_)
                return cc, st

            cc, sts = jax.lax.scan(body, ci, None, length=K)
            return cc, jax.tree.map(lambda a: a[-1], sts)

        return jax.lax.map(one_chain, c)

    sweep_multi = jax.jit(multi)
    bench_sweep(f"B chains=lax.map, {K} sweeps/call", sweep_multi, carry0,
                k_inner=K)

    # B2: vmap chains AND K sweeps per call
    def multi_v(c, X_, y_):
        def body(cc, _):
            cc, st = jax.vmap(sweep1, in_axes=(0, None, None))(cc, X_, y_)
            return cc, st

        cc, sts = jax.lax.scan(body, c, None, length=K)
        return cc, jax.tree.map(lambda a: a[-1], sts)

    bench_sweep(f"B2 chains=vmap, {K} sweeps/call", jax.jit(multi_v), carry0,
                k_inner=K)

    # ---------------- C: packed genome-scale ------------------------------
    from rs_bann_tpu.models.density import PackedX

    pG, pm_, pn, pL = 100, 100, 100_000, 30
    cache = Path("/tmp/diag_packed_cache.npz")
    if cache.exists():
        z = np.load(cache)
        by, scale, shift, yy = z["by"], z["scale"], z["shift"], z["y"]
        log("packed cache hit")
    else:
        from rs_bann_tpu.io.bed import BedVM
        from rs_bann_tpu.group.grouping import UniformGrouping
        from rs_bann_tpu.models.data import pack_stacked

        t0 = time.time()
        bed = BedVM.random(pn, pG * pm_, seed=1)
        log(f"BedVM.random: {time.time() - t0:.0f}s")
        parch0 = NetArch.from_width_rules(
            [pm_] * pG, 0, ("fixed", 10), ("like_hidden",),
            activation="identity",
        )
        t0 = time.time()
        pdata0 = pack_stacked(
            parch0, bed, UniformGrouping(pG, pm_),
            rng.standard_normal(pn).astype(np.float32),
        )
        log(f"pack_stacked: {time.time() - t0:.0f}s")
        by = np.asarray(pdata0.X.bytes)
        scale = np.asarray(pdata0.X.w_scale)
        shift = np.asarray(pdata0.X.shift)
        yy = np.asarray(pdata0.y)
        np.savez(cache, by=by, scale=scale, shift=shift, y=yy)

    parch = NetArch.from_width_rules(
        [pm_] * pG, 0, ("fixed", 10), ("like_hidden",), activation="identity"
    )
    pX = PackedX(jnp.asarray(by), jnp.asarray(scale), jnp.asarray(shift), pn)
    pyj = jnp.asarray(yy)
    log(f"packed arch m_pad={parch.m_pad} bytes={by.nbytes/1e9:.2f} GB")

    def prun(tag, **cfg_kw):
        pstate, _ = init_net(parch, "ridge_ard", InitCfg(seed=0))
        pnet = Net("ridge_ard", parch, D.Hyperparameters(), pstate)
        pcfg = MCMCCfg(
            chain_length=1, burn_in=10**9, hmc_integration_length=pL,
            seed=0, **cfg_kw,
        )
        psweep = jax.jit(pnet.make_sweep(pcfg))
        pcarry = jax.jit(
            lambda s, X_, y_, k: pnet.init_carry(
                X_, y_, k,
                mass_adaptation=cfg_kw.get("mass_adaptation", False),
                state=s,
            )
        )(pnet.state, pX, pyj, jax.random.key(0))
        jax.block_until_ready(pcarry)
        t0 = time.time()
        pcarry, pstats = psweep(pcarry, pX, pyj)
        sync(pstats)
        log(f"[{tag}] compile+first sweep: {time.time() - t0:.1f}s")
        times = []
        for i in range(4):
            t0 = time.time()
            pcarry, pstats = psweep(pcarry, pX, pyj)
            sync(pstats)
            times.append(time.time() - t0)
            log(f"[{tag}] sweep {i}: {times[-1]:.2f}s")
            if times[-1] > 30 and i >= 1:
                break
        best = min(times)
        log(f"[{tag}] min {best:.2f}s/sweep = {pG*pL/best:,.0f} steps/s")

    prun("C1 bench-config (hybrid+da+mass)",
         hmc_step_size_mode="dual_averaging", update_mode="hybrid",
         mass_adaptation=True)
    prun("C2 hybrid izmailov", hmc_step_size_mode="izmailov",
         update_mode="hybrid")
    prun("C3 parallel da+mass", hmc_step_size_mode="dual_averaging",
         update_mode="parallel", mass_adaptation=True)


if __name__ == "__main__":
    main()
