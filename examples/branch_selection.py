"""Branch selection: which SNP groups affect the trait?

Spike-and-slab inclusion indicators over SNP groups — an exact collapsed
conjugate Gibbs move on each branch's output layer — give posterior
inclusion probabilities (PIPs) alongside the usual posterior predictive.
The reference (rs-bann) can only sparsify at initialization; here group
relevance is a sampled quantity with calibrated uncertainty.

Simulates a clustered genetic architecture (only 3 of 12 SNP groups causal),
trains with --spike-slab semantics through the Python API, and prints the
PIP per group.

Run:  python examples/branch_selection.py [--cpu]
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rs_bann_tpu import Hyperparameters, InitCfg, MCMCCfg, Net, NetArch, init_net
    from rs_bann_tpu.models.data import stack_standardized
    from rs_bann_tpu.train import train

    # ---- simulate: 12 groups x 20 SNPs, only groups 0, 4, 9 causal
    G, m, n, h2 = 12, 20, 2000, 0.6
    causal_groups = (0, 4, 9)
    rng = np.random.default_rng(3)
    maf = rng.uniform(0.1, 0.5, G * m)
    X = rng.binomial(2, maf, size=(n, G * m)).astype(np.float32)
    Xs = (X - X.mean(0)) / np.where(X.std(0) > 0, X.std(0), 1.0)
    beta = np.zeros(G * m, np.float32)
    for g in causal_groups:
        beta[g * m : (g + 1) * m] = rng.standard_normal(m) * 0.3
    gv = Xs @ beta
    y = gv + rng.standard_normal(n) * np.sqrt(gv.var() * (1 / h2 - 1))
    y = ((y - y.mean()) / y.std()).astype(np.float32)

    arch = NetArch.uniform(G, m, 8, 0, 8, activation="identity")
    cols = [X[:, g * m : (g + 1) * m] for g in range(G)]
    data = stack_standardized(arch, cols, y)

    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=1))
    net = Net("ridge_ard", arch, Hyperparameters(), state)

    with tempfile.TemporaryDirectory() as td:
        cfg = MCMCCfg(
            chain_length=200, burn_in=100, hmc_integration_length=20,
            hmc_step_size_mode="dual_averaging",
            spike_slab=True, ss_warmup=0,  # strongly clustered: no warmup
            update_mode="hybrid", block_size=3,
            seed=11, outpath=f"{td}/run",
        )
        net, stats = train(net, data, cfg, report_interval=50)
        rec = json.load(open(f"{td}/run/inclusion_probs"))

    print(f"\nposterior inclusion probability per SNP group "
          f"(truth: groups {causal_groups} causal):")
    for g, p in enumerate(rec["pip"]):
        flag = "*" if g in causal_groups else " "
        print(f"  group {g:2d} {flag} PIP = {p:.2f}  {'#' * int(round(p * 40))}")
    print(f"\nposterior inclusion fraction pi = {rec['pi']:.2f} "
          f"(truth: {len(causal_groups)}/{G} = {len(causal_groups)/G:.2f})")
    hits = sum(rec["pip"][g] > 0.5 for g in causal_groups)
    fps = sum(
        p > 0.5 for g, p in enumerate(rec["pip"]) if g not in causal_groups
    )
    print(f"recovered {hits}/{len(causal_groups)} causal groups, "
          f"{fps} false positives (PIP > 0.5)")


if __name__ == "__main__":
    main()
