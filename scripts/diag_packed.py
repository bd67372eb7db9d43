"""Diagnose the packed genome-scale sweep throughput (VERDICT r2 #2).

BENCH_r02.json records 174 s/sweep for the packed hybrid config while
docs/GENOME_SCALE.md implies ~1.5-3 s/sweep for the same shape. This script
reproduces the bench's exact packed path with per-sweep timing and bisects
config features (mass adaptation, dual averaging, update mode) to localize
the slowdown. Single TPU process; run alone (tunnel is single-client).
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
    from rs_bann_tpu.models.density import PackedX
    from rs_bann_tpu.models.data import StackedData
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    log("device:", jax.devices()[0].device_kind)
    t0 = time.time()
    sync(jnp.zeros(8) + 1.0)
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    pG, pm_, pn, pL = 100, 100, 100_000, 30
    cache = Path("/tmp/diag_packed_cache.npz")
    if cache.exists():
        z = np.load(cache)
        by, scale, shift, y = z["by"], z["scale"], z["shift"], z["y"]
        log("cache hit")
    else:
        from rs_bann_tpu.io.bed import BedVM
        from rs_bann_tpu.group.grouping import UniformGrouping
        from rs_bann_tpu.models.data import pack_stacked

        t0 = time.time()
        bed = BedVM.random(pn, pG * pm_, seed=1)
        log(f"BedVM.random: {time.time() - t0:.0f}s")
        arch0 = NetArch.from_width_rules(
            [pm_] * pG, 0, ("fixed", 10), ("like_hidden",), activation="identity"
        )
        rng = np.random.default_rng(0)
        t0 = time.time()
        pdata = pack_stacked(
            arch0, bed, UniformGrouping(pG, pm_),
            rng.standard_normal(pn).astype(np.float32),
        )
        log(f"pack_stacked: {time.time() - t0:.0f}s")
        by = np.asarray(pdata.X.bytes)
        scale = np.asarray(pdata.X.w_scale)
        shift = np.asarray(pdata.X.shift)
        y = np.asarray(pdata.y)
        np.savez(cache, by=by, scale=scale, shift=shift, y=y)

    arch = NetArch.from_width_rules(
        [pm_] * pG, 0, ("fixed", 10), ("like_hidden",), activation="identity"
    )
    X = PackedX(jnp.asarray(by), jnp.asarray(scale), jnp.asarray(shift), pn)
    yj = jnp.asarray(y)
    log(f"arch m_pad={arch.m_pad} s_pad={getattr(arch, 's_pad', '?')} "
        f"bytes={by.nbytes/1e9:.2f} GB")

    def run(tag, **cfg_kw):
        pstate, _ = init_net(arch, "ridge_ard", InitCfg(seed=0))
        pnet = Net("ridge_ard", arch, D.Hyperparameters(), pstate)
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
        )(pnet.state, X, yj, jax.random.key(0))
        jax.block_until_ready(pcarry)
        t0 = time.time()
        pcarry, pstats = psweep(pcarry, X, yj)
        sync(pstats)
        log(f"[{tag}] compile+first sweep: {time.time() - t0:.1f}s")
        times = []
        nsweeps = 4
        for i in range(nsweeps):
            t0 = time.time()
            pcarry, pstats = psweep(pcarry, X, yj)
            sync(pstats)
            times.append(time.time() - t0)
            log(f"[{tag}] sweep {i}: {times[-1]:.2f}s")
            if times[-1] > 30 and i >= 1:
                break  # slow case confirmed; don't burn the budget
        best = min(times)
        log(f"[{tag}] min {best:.2f}s/sweep = {pG*pL/best:,.0f} steps/s")
        return best

    deadline = time.time() + 22 * 60

    # the exact BENCH_r02 config
    run("bench-config", hmc_step_size_mode="dual_averaging",
        update_mode="hybrid", mass_adaptation=True)
    # bisect features
    for tag, kw in [
        ("hybrid-izmailov", dict(hmc_step_size_mode="izmailov",
                                 update_mode="hybrid")),
        ("hybrid-da-nomass", dict(hmc_step_size_mode="dual_averaging",
                                  update_mode="hybrid")),
        ("parallel-da-mass", dict(hmc_step_size_mode="dual_averaging",
                                  update_mode="parallel",
                                  mass_adaptation=True)),
    ]:
        if time.time() > deadline:
            log(f"deadline hit; skipping {tag}")
            continue
        run(tag, **kw)


if __name__ == "__main__":
    main()
