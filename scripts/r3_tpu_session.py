"""One TPU process: dump optimized sweep HLOs, then run the r3 batteries.

The tunnel charges minutes-long claim handoffs per process (measured up to
18 min), so everything TPU-bound this session runs from this single script:
  1. optimized-HLO dump of the flagship sweep under lax.map chains and
     vmapped chains (to attribute the measured 2.4x vmap slowdown and
     check whether layer-0 runs on the MXU at all) -> /tmp/hlo_{map,vmap}.txt
  2. scripts/r3_experiments batteries (rebase, clustered, ssrows, ukb)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, flush=True)


def dump_hlos():
    import jax
    import jax.numpy as jnp

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

    G, m, n, h, C, L = 64, 64, 4096, 32, 4, 64
    arch = NetArch.uniform(G, m, h, 1, h)
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
    keys = jax.random.split(jax.random.key(0), C)
    carry = jax.jit(
        lambda s, X_, y_, ks: jax.vmap(
            lambda k: net.init_carry(X_, y_, k, state=s)
        )(ks)
    )(net.state, X, y, keys)

    for tag, comb in [
        ("map", lambda f, c: jax.lax.map(f, c)),
        ("vmap", lambda f, c: jax.vmap(f)(c)),
    ]:
        t0 = time.time()
        fn = jax.jit(lambda c, X_, y_: comb(lambda ci: sweep1(ci, X_, y_), c))
        txt = fn.lower(carry, X, y).compile().as_text()
        Path(f"/tmp/hlo_{tag}.txt").write_text(txt)
        log(f"hlo_{tag}: {len(txt)} chars in {time.time()-t0:.0f}s")


def main():
    import jax
    import jax.numpy as jnp

    log("device:", jax.devices()[0].device_kind)
    t0 = time.time()
    float(np.asarray(jnp.zeros(8) + 1.0)[0])
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    try:
        dump_hlos()
    except Exception as e:
        log(f"hlo dump failed: {type(e).__name__}: {e}")

    import r3_experiments

    for p in sys.argv[1:] or ["rebase", "clustered", "ssrows", "ukb"]:
        r3_experiments.BATTERIES[p]()
    log("SESSION DONE")


if __name__ == "__main__":
    main()
