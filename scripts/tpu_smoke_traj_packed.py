"""TPU smoke test for the packed whole-trajectory kernel (r5).

Small genome-recipe shape: checks Mosaic compilation, finiteness, and
rough agreement (bf16 tolerance) of the folded packed sweep vs the
per-step path on the REAL chip. The exact (f32) equivalence lives in the
CPU interpret tests (tests/test_leapfrog_packed.py, tests/test_leapfrog.py).

Single TPU client — run alone.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rs_bann_tpu.group.grouping import UniformGrouping
from rs_bann_tpu.io.bed import BedVM
from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.data import pack_stacked
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net, chain_fold_eligible
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg


def run(C=2, G=8, m=24, n=2048, L=5):
    print("backend:", jax.default_backend(), jax.devices())
    bed = BedVM.random(n, G * m, seed=1)
    grouping = UniformGrouping(G, m)
    arch = NetArch.from_width_rules(
        [m] * G, 0, ("fixed", 8), ("like_hidden",), activation="identity"
    )
    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=0))
    net = Net("ridge_ard", arch, D.Hyperparameters(), state)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(n).astype(np.float32)
    data = pack_stacked(arch, bed, grouping, y)
    cfg = MCMCCfg(
        chain_length=1, burn_in=4, hmc_integration_length=L,
        hmc_step_size_mode="dual_averaging", update_mode="hybrid",
        block_size=4, mass_adaptation=True, num_chains=C, seed=0,
    )
    assert chain_fold_eligible("ridge_ard", "identity", cfg, data.X)
    keys = jax.random.split(jax.random.key(0), C)

    sweep = net.make_sweep(cfg)
    mk = jax.vmap(lambda k: net.init_carry(data.X, data.y, k,
                                           mass_adaptation=True))

    t0 = time.time()
    folded = jax.jit(jax.vmap(sweep, in_axes=(0, None, None)))
    c_f = mk(keys)
    c_f, st_f = folded(c_f, data.X, data.y)
    jax.block_until_ready(c_f)
    print(f"folded compile+run: {time.time()-t0:.1f}s "
          f"mse={np.asarray(st_f.mse_train)}")

    os.environ["RS_BANN_FOLD"] = "off"
    try:
        sweep2 = net.make_sweep(cfg)
        t0 = time.time()
        ref = jax.jit(jax.vmap(sweep2, in_axes=(0, None, None)))
        c_r = mk(keys)
        c_r, st_r = ref(c_r, data.X, data.y)
        jax.block_until_ready(c_r)
        print(f"per-step compile+run: {time.time()-t0:.1f}s "
              f"mse={np.asarray(st_r.mse_train)}")
    finally:
        del os.environ["RS_BANN_FOLD"]

    rf, rr = np.asarray(c_f.residual), np.asarray(c_r.residual)
    assert np.all(np.isfinite(rf)) and np.all(np.isfinite(rr))
    # bf16 leapfrogs diverge trajectory-wise; require same scale + high
    # correlation over one sweep
    for c in range(C):
        corr = np.corrcoef(rf[c], rr[c])[0, 1]
        print(f"chain {c}: residual corr folded-vs-perstep {corr:.5f} "
              f"|rf|={np.linalg.norm(rf[c]):.3f} |rr|={np.linalg.norm(rr[c]):.3f}")
        assert corr > 0.99, corr
    print("SMOKE OK")


if __name__ == "__main__":
    run()
