"""Packed (2-bit fused Pallas) vs dense-f32 full-sweep benchmark on TPU.

The packed path's goal is to match dense speed while using 16x less HBM for
X (the enabler for genome-scale residency). Roadmap item #1 tracked a ~2x
sweep-level gap caused by lost XLA fusion at the pallas_call boundary; this
script measures the sweep-level ratio before/after the fused layer-0 kernel
(ops/packed_matmul.py packed_linear).

Usage: JAX_PLATFORMS='' python scripts/bench_packed.py [G m n h L sweeps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from rs_bann_tpu.io.bed import BedVM
    from rs_bann_tpu.io.genotypes import CompressedGenotypes
    from rs_bann_tpu.group.grouping import UniformGrouping
    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.data import pack_stacked
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    args = [int(a) for a in sys.argv[1:]]
    G, m, n, h, L, sweeps = (args + [16, 512, 16384, 32, 64, 10][len(args):])

    print(f"G={G} m={m} n={n} h={h} L={L} sweeps={sweeps}", file=sys.stderr)
    bed = BedVM.random(n, G * m, seed=0)
    grouping = UniformGrouping(G, m)
    arch = NetArch.uniform(G, m, h, 1, h)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    gen = CompressedGenotypes(bed, grouping)
    dense = gen.to_stacked(arch, np.asarray(y))
    packed = pack_stacked(arch, bed, grouping, np.asarray(y))

    cfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=L,
        hmc_step_size_mode="izmailov", update_mode="parallel", seed=0,
    )
    def sync(tree):
        """True barrier: block_until_ready is unreliable through the axon
        tunnel (returns before execution completes) — force a host readback."""
        return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])

    results = {}
    for name, data in (("dense", dense), ("packed", packed)):
        state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
        net = Net("ridge_base", arch, D.Hyperparameters(), state)
        sweep = jax.jit(net.make_sweep(cfg))
        carry = net.init_carry(data.X, data.y, jax.random.key(0))
        t0 = time.time()
        carry, stats = sweep(carry, data.X, data.y)
        sync(stats)
        print(f"{name}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for _ in range(sweeps):
            carry, stats = sweep(carry, data.X, data.y)
        sync(stats)
        dt = time.time() - t0
        results[name] = dt / sweeps
        print(f"{name}: {dt/sweeps*1e3:.1f} ms/sweep", file=sys.stderr)

    ratio = results["packed"] / results["dense"]
    print(f"packed/dense sweep-time ratio: {ratio:.2f}x")


if __name__ == "__main__":
    main()
