"""Flagship-shaped sweep on PACKED genotype input (fused kernel) vs the
dense-bf16 FeatX XLA path. Genotypes are {0,1,2} by nature — if the packed
fused path wins at the flagship shape too, the bench's flagship workload
should be packed genotypes (the domain-honest input), keeping the
sequential self-baseline on the dense form (the reference's own layout).
"""

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


def main():
    import jax
    import jax.numpy as jnp

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.ops.packed_matmul import pack_strided
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    log("device:", jax.devices()[0].device_kind)
    t0 = time.time()
    sync(jnp.zeros(8) + 1.0)
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    G, m, n, h, C, L = 64, 64, 4096, 32, 4, 64
    arch = NetArch.uniform(G, m, h, 1, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    raw = rng.binomial(2, 0.3, size=(G, arch.m_pad, n)).astype(np.float32)
    raw[:, m:, :] = 0.0
    by = np.stack([pack_strided(raw[g]) for g in range(G)])
    mu = raw.mean(axis=2)
    sd = raw.std(axis=2)
    scale = np.where(sd > 0, 1.0 / np.where(sd > 0, sd, 1.0), 0.0)
    scale[:, m:] = 0.0
    mu[:, m:] = 0.0
    Xp = D.PackedX(jnp.asarray(by), jnp.asarray(scale.astype(np.float32)),
                   jnp.asarray(mu.astype(np.float32)), n)
    dense = (scale[:, :, None] * (raw - mu[:, :, None])).astype(np.float32)
    Xd = D.FeatX(jnp.asarray(dense, dtype=jnp.bfloat16))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=L,
        hmc_step_size_mode="izmailov", update_mode="parallel",
        num_chains=C, seed=0,
    )
    keys = jax.random.split(jax.random.key(0), C)

    for tag, X in [("packed-fused", Xp), ("dense-featmajor", Xd)]:
        sweep1 = net.make_sweep(cfg)
        sweep = jax.jit(
            lambda c, X_, y_: jax.lax.map(lambda ci: sweep1(ci, X_, y_), c)
        )
        carry = jax.jit(
            lambda s, X_, y_, ks: jax.vmap(
                lambda k: net.init_carry(X_, y_, k, state=s)
            )(ks)
        )(net.state, X, y, keys)
        t0 = time.time()
        try:
            carry, stats = sweep(carry, X, y)
            sync(stats)
        except Exception as e:
            import traceback

            traceback.print_exc()
            log(f"{tag} FAILED: {type(e).__name__}: {e}")
            continue
        comp = time.time() - t0
        box = {"c": carry}

        def run():
            c = box["c"]
            for _ in range(10):
                c, s = sweep(c, X, y)
            sync(s)
            box["c"] = c

        ts = []
        for _ in range(3):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        dt = float(np.median(ts)) / 10
        log(f"{tag:>16}: {dt*1e3:6.1f} ms/sweep  {C*G*L/dt:,.0f} steps/s "
            f"(compile {comp:.0f}s)")


if __name__ == "__main__":
    main()
