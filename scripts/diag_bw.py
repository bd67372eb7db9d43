"""HBM-bandwidth diagnosis of the flagship sweep (round 3).

BENCH r3 pre-run: feature-major sweep achieves 22.2 TF/s true (11.2% MFU)
while the MXU-issue model allows 62 TF/s (32%). Hypothesis: the sweep is
HBM-bandwidth-bound on X reads — chains run under lax.map, so X
([G, m_pad, n] = 67 MB f32) is read twice per leapfrog step PER CHAIN:
4 chains x 64 steps x 134 MB / 0.44 s = 780 GB/s = v5e HBM speed of light.

Variants timed here (each 10 sweeps x 3 reps, median):
  map-f32   : current bench path (lax.map chains, f32 X)      [control]
  map-bf16  : lax.map chains, X stored bf16 + bf16 matmul inputs  (2x bytes)
  vmap-f32  : vmap chains — dot_general's batch rule folds a lhs-only
              batch dim into the GEMM, so X is read ONCE for all chains
  vmap-bf16 : both (8x fewer X bytes per chain-step)
  dot-micro : raw layer-0 GEMM pair (fwd + dW) at the folded shapes —
              the speed-of-light reference for this sweep
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, flush=True)


def sync(tree):
    # NOT block_until_ready: on the experimental axon tunnel platform it can
    # return before execution finishes — a host copy is the only real fence.
    import jax

    return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])


def timed(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


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

    G, m, n, h, C, L = 64, 64, 4096, 32, 4, 64
    sweeps = 10
    arch = NetArch.uniform(G, m, h, 1, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    Xf = np.zeros((G, arch.m_pad, n), np.float32)
    Xf[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=L,
        hmc_step_size_mode="izmailov", update_mode="parallel",
        num_chains=C, seed=0,
    )
    sweep1 = net.make_sweep(cfg)
    keys = jax.random.split(jax.random.key(0), C)

    def bench_variant(tag, X, chain_combinator):
        sweep = jax.jit(
            lambda c, X_, y_: chain_combinator(lambda ci: sweep1(ci, X_, y_), c)
        )
        carry = jax.jit(
            lambda s, X_, y_, ks: jax.vmap(
                lambda k: net.init_carry(X_, y_, k, state=s)
            )(ks)
        )(net.state, X, y, keys)
        sync(carry)
        t0 = time.time()
        carry, stats = sweep(carry, X, y)
        sync(stats)
        compile_s = time.time() - t0
        box = {"c": carry}

        def run():
            c = box["c"]
            for _ in range(sweeps):
                c, s = sweep(c, X, y)
            sync(s)
            box["c"] = c

        dt = timed(run)
        sps = sweeps * C * G * L / dt
        log(f"{tag:>10}: {dt/sweeps*1e3:7.1f} ms/sweep  {sps:12,.0f} steps/s  "
            f"(compile {compile_s:.1f}s)")
        return sps

    Xf32 = D.FeatX(jnp.asarray(Xf))
    Xbf = D.FeatX(jnp.asarray(Xf, dtype=jnp.bfloat16))

    r = {}
    r["map-f32"] = bench_variant("map-f32", Xf32, jax.lax.map)
    D.set_compute_dtype("bfloat16")
    r["map-bf16"] = bench_variant("map-bf16", Xbf, jax.lax.map)
    D.set_compute_dtype(None)
    r["vmap-f32"] = bench_variant("vmap-f32", Xf32, lambda f, c: jax.vmap(f)(c))
    D.set_compute_dtype("bfloat16")
    r["vmap-bf16"] = bench_variant("vmap-bf16", Xbf, lambda f, c: jax.vmap(f)(c))
    D.set_compute_dtype(None)

    # --- speed-of-light: the two layer-0 GEMMs at the chain-folded shapes
    # fwd: [C*h, m] @ [m, n]  per branch (batch G); bwd dW: [C*h, n] @ [n, m]
    Wf = jnp.asarray(rng.standard_normal((G, C * h, arch.m_pad)), jnp.bfloat16)
    Xb = Xbf.xT
    Da = jnp.asarray(rng.standard_normal((G, C * h, n)), jnp.bfloat16)

    @jax.jit
    def dots(Wf, Xb, Da):
        z = jax.lax.dot_general(
            Wf, Xb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dW = jax.lax.dot_general(
            Da, Xb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return z.sum() + dW.sum()

    sync(dots(Wf, Xb, Da))
    reps_in = 20

    def run_dots():
        for _ in range(reps_in):
            s = dots(Wf, Xb, Da)
        sync(s)

    dt = timed(run_dots)
    flops = 2 * G * C * h * m * n * 2  # two GEMMs
    log(f" dot-micro: {dt/reps_in*1e3:7.2f} ms/pair  "
        f"{flops*reps_in/dt/1e12:6.1f} TF/s true "
        f"(= {L*G*C*reps_in/dt:,.0f} equivalent layer0 steps/s)")

    log("\nspeedups vs map-f32: " + "  ".join(
        f"{k}:{v/r['map-f32']:.2f}x" for k, v in r.items()))


if __name__ == "__main__":
    main()
