"""Quickstart: the full genomic-prediction workflow through the Python API.

Simulates a grouped-SNP phenotype, trains a Bayesian branch network with
adaptive HMC-within-Gibbs, and evaluates the posterior predictive.

Run:  python examples/quickstart.py [--cpu]
"""

import argparse
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

    from rs_bann_tpu import (
        Hyperparameters,
        InitCfg,
        MCMCCfg,
        Net,
        NetArch,
        init_net,
        simulate_xy,
    )
    from rs_bann_tpu.train import train
    from rs_bann_tpu.vis import expected_r2, posterior_predictions

    with tempfile.TemporaryDirectory() as td:
        # 1. simulate: 8 SNP groups x 25 markers, 1500 individuals, h2 = 0.7
        sim = simulate_xy(
            td, "ridge_base", "tanh",
            num_markers_per_branch=25, num_branches=8, num_individuals=1500,
            hidden_layer_width=8, branch_depth=0, heritability=0.7,
            init_gamma_shape=3.0, init_gamma_scale=0.5, seed=42,
        )
        print(f"simulated -> {sim.outdir}")

        # 2. build the training model (widths need not match the truth)
        arch = NetArch.from_width_rules(
            sim.gen_train.num_markers_per_group(), depth=0,
            hidden_rule=("fraction_of_input", 0.5), summary_rule=("like_hidden",),
        )
        state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
        net = Net("ridge_base", arch, Hyperparameters(), state)

        # 3. train: adaptive step sizes, hybrid branch schedule, 2 chains
        cfg = MCMCCfg(
            chain_length=200, burn_in=100, hmc_integration_length=50,
            hmc_step_size_mode="dual_averaging",
            update_mode="hybrid", block_size=4,
            num_chains=2, seed=7, outpath=f"{td}/run",
        )
        dtr = sim.gen_train.to_stacked(arch, sim.y_train)
        dte = sim.gen_test.to_stacked(arch, sim.y_test)
        net, stats = train(net, dtr, cfg, test_data=dte, report_interval=50)

        # 4. posterior predictive from the saved samples
        preds = posterior_predictions(f"{td}/run/models/chain0", dte.X)
        post_mean = preds.mean(axis=0)
        r2 = np.corrcoef(post_mean, sim.y_test)[0, 1] ** 2
        m, n = sum(arch.m), dtr.X.shape[1]
        ceiling = 0.7 * float(expected_r2(m, n, 0.7))
        print(
            f"posterior-mean test r2 = {r2:.3f} "
            f"(h2 = 0.7, achievable ~ {ceiling:.3f}); "
            f"acceptance = {stats.acceptance_rate():.2f}"
        )
        print(
            "posterior sd of genetic-value predictions: "
            f"{preds.std(axis=0).mean():.3f} (mean over individuals)"
        )


if __name__ == "__main__":
    main()
