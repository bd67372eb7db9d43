"""Second r3 TPU session (one process, one tunnel claim):

  1. fused-kernel flagship sweep validation: the ops/branch_mlp.py Pallas
     kernel must lower and run on the real chip, and the sweep should drop
     from ~45 ms (autodiff, 8 X-streams/step) toward the single-stream
     bound; timed vs the kernel forced off
  2. profiler trace of 3 packed genome-scale sweeps (the 8.25 ms/block-step
     mystery: byte streams and intermediates only account for ~0.7 ms)
  3. clus-4chain battery rerun (vis.posterior_predictions now pools
     chain<k>/ subdirs)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
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


def flagship(fused: bool):
    import jax
    import jax.numpy as jnp

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.ops import branch_mlp
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    branch_mlp.FORCE = None if fused else "off"
    G, m, n, h, C, L = 64, 64, 4096, 32, 4, 64
    arch = NetArch.uniform(G, m, h, 1, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    Xf = np.zeros((G, arch.m_pad, n), np.float32)
    Xf[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
    X = D.FeatX(jnp.asarray(Xf, dtype=jnp.bfloat16))
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
    t0 = time.time()
    carry, stats = sweep(carry, X, y)
    sync(stats)
    comp = time.time() - t0
    box = {"c": carry}
    sweeps = 10

    def run():
        c = box["c"]
        for _ in range(sweeps):
            c, s = sweep(c, X, y)
        sync(s)
        box["c"] = c

    dt = timed(run) / sweeps
    mse = np.asarray(box["c"].residual).std()
    sps = C * G * L / dt
    log(f"flagship fused={fused}: {dt*1e3:6.1f} ms/sweep  {sps:,.0f} steps/s "
        f"(compile {comp:.0f}s, resid-std {mse:.3f})")
    branch_mlp.FORCE = None
    return dt


def packed_profile():
    import jax
    import jax.numpy as jnp

    from rs_bann_tpu.group.grouping import UniformGrouping
    from rs_bann_tpu.io.bed import BedVM
    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.data import pack_stacked
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    pG, pm_, pn, pL = 100, 100, 100_000, 30
    rng = np.random.default_rng(0)
    bed = BedVM.random(pn, pG * pm_, seed=1)
    grouping = UniformGrouping(pG, pm_)
    parch = NetArch.from_width_rules(
        [pm_] * pG, 0, ("fixed", 10), ("like_hidden",), activation="identity"
    )
    pstate, _ = init_net(parch, "ridge_ard", InitCfg(seed=0))
    pnet = Net("ridge_ard", parch, D.Hyperparameters(), pstate)
    pdata = pack_stacked(
        parch, bed, grouping, rng.standard_normal(pn).astype(np.float32)
    )
    pcfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=pL,
        hmc_step_size_mode="dual_averaging", update_mode="hybrid",
        mass_adaptation=True, seed=0,
    )
    psweep = jax.jit(pnet.make_sweep(pcfg))
    pcarry = jax.jit(
        lambda s, X_, y_, k: pnet.init_carry(
            X_, y_, k, mass_adaptation=True, state=s
        )
    )(pnet.state, pdata.X, pdata.y, jax.random.key(0))
    t0 = time.time()
    pcarry, pstats = psweep(pcarry, pdata.X, pdata.y)
    sync(pstats)
    log(f"packed compile+first sweep: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        pcarry, pstats = psweep(pcarry, pdata.X, pdata.y)
    sync(pstats)
    log(f"packed 3 sweeps: {(time.time()-t0)/3*1e3:.0f} ms/sweep")
    with jax.profiler.trace("/tmp/jax_trace_packed"):
        for _ in range(3):
            pcarry, pstats = psweep(pcarry, pdata.X, pdata.y)
        sync(pstats)
    log("packed trace -> /tmp/jax_trace_packed")


def main():
    import jax
    import jax.numpy as jnp

    log("device:", jax.devices()[0].device_kind)
    t0 = time.time()
    sync(jnp.zeros(8) + 1.0)
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    for step in sys.argv[1:] or ["flagship", "packed", "4chain"]:
        try:
            if step == "flagship":
                try:
                    d_f = flagship(True)
                except Exception as e:
                    import traceback

                    traceback.print_exc()
                    log(f"fused flagship FAILED: {type(e).__name__}: {e}")
                    d_f = None
                d_e = flagship(False)
                if d_f:
                    log(f"fused speedup: {d_e/d_f:.2f}x")
            elif step == "packed":
                packed_profile()
            elif step == "4chain":
                import r3_experiments

                r3_experiments.run("clus-4chain-v2", [
                    "--causal-branches", "20", "--chain-length", "400",
                    "--step-size-mode", "dual_averaging", "--update-mode",
                    "hybrid", "--mass-adaptation", "--num-chains", "4",
                    "--spike-slab", "--ss-warmup", "0"])
        except Exception as e:
            import traceback

            traceback.print_exc()
            log(f"step {step} FAILED: {type(e).__name__}: {e}")
    log("SESSION2 DONE")


if __name__ == "__main__":
    main()
