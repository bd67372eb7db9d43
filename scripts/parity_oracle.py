"""Statistical parity: JAX sequential sampler vs the NumPy reference oracle.

Runs the reference's canonical sim_train_pred.sh workload (lasso-base, b=1,
m=20, n=1000, w=10, d=0, il=300, gamma(3,1) init; h2 in {0.25,0.5,0.8,0.95})
R times per side with fresh seeds:

  * side A: rs_bann_tpu sequential trainer (the reference-exact schedule)
  * side B: rs_bann_tpu.oracle.OracleNet — a pure-NumPy mirror of the
    reference binary's exact update order (see oracle.py docstring)

and compares, per h2: posterior-mean test r2, acceptance rate, early
rejection rate, final train mse. Verdict per metric: |dmean| <= 2 * combined
standard error. Writes PARITY.json (merged into BASELINE_SELF.json by
--merge).

Forces CPU: parity is backend-independent and the tunneled TPU is a
single-client resource.

Usage: python scripts/parity_oracle.py [--reps 8] [--quick] [--merge]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def run_oracle(Xg_tr, y_tr, Xg_te, y_te, cl, il, seed):
    from rs_bann_tpu.oracle import OracleCfg, OracleHyper, OracleNet

    net = OracleNet.build(
        "lasso_base", [x.shape[1] for x in Xg_tr], hidden=10, depth=0,
        summary=10, init_gamma=(3.0, 1.0), seed=seed + 1000,
    )
    cfg = OracleCfg(chain_length=cl, burn_in=cl // 2, hmc_integration_length=il)
    t0 = time.time()
    net.train(Xg_tr, y_tr, cfg, seed=seed)
    wall = time.time() - t0
    preds = net.posterior_predict(Xg_te)
    pm = preds.mean(axis=0)
    r2 = float(np.corrcoef(pm, y_te)[0, 1] ** 2)
    tot = net.counts.sum()
    return {
        "test_r2": r2,
        "acc": float(net.counts[0] / tot),
        "early": float(net.counts[2] / tot),
        "mse_train_final": net.mse_train[-1],
        "wall_s": wall,
    }


def run_jax(dtr, dte, arch_m, cl, il, seed, outdir):
    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
    from rs_bann_tpu.train import train
    from rs_bann_tpu.vis import posterior_predictions

    arch = NetArch.from_width_rules(arch_m, 0, ("fixed", 10), ("like_hidden",))
    state, _ = init_net(
        arch, "lasso_base",
        InitCfg(seed=seed + 1000, init_gamma_shape=3.0, init_gamma_scale=1.0),
    )
    net = Net("lasso_base", arch, D.Hyperparameters(), state)
    cfg = MCMCCfg(
        chain_length=cl, burn_in=cl // 2, hmc_integration_length=il,
        hmc_step_size_mode="izmailov", update_mode="sequential",
        outpath=outdir, seed=seed,
    )
    t0 = time.time()
    net, stats = train(net, dtr, cfg, verbose=False)
    wall = time.time() - t0
    preds = posterior_predictions(f"{outdir}/models", dte.X)
    pm = preds.mean(axis=0)
    r2 = float(np.corrcoef(pm, np.asarray(dte.y))[0, 1] ** 2)
    return {
        "test_r2": r2,
        "acc": stats.acceptance_rate(),
        "early": stats.early_rejection_rate(),
        "mse_train_final": stats.mse_train[-1],
        "wall_s": wall,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cl", type=int, default=100)
    ap.add_argument("--il", type=int, default=300)
    ap.add_argument("--merge", action="store_true",
                    help="merge the parity table into BASELINE_SELF.json")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "PARITY.json"))
    args = ap.parse_args()

    import tempfile

    from rs_bann_tpu.sim import simulate_xy

    h2s = [0.8] if args.quick else [0.25, 0.5, 0.8, 0.95]
    reps = 2 if args.quick else args.reps
    cl, il = (20, 50) if args.quick else (args.cl, args.il)
    m, b, n, w, d = 20, 1, 1000, 10, 0

    table = []
    for h2 in h2s:
        rows_j, rows_o = [], []
        for rep in range(reps):
            with tempfile.TemporaryDirectory() as td:
                sim = simulate_xy(
                    td, "lasso_base", "tanh", m, b, n, w, d, heritability=h2,
                    init_gamma_shape=3.0, init_gamma_scale=1.0, seed=100 * rep + 11,
                )
                dtr = sim.gen_train.to_stacked(sim.arch, sim.y_train)
                dte = sim.gen_test.to_stacked(sim.arch, sim.y_test)
                # oracle sees the SAME standardized per-branch matrices
                mks = sim.gen_train.num_markers_per_group()
                Xg_tr = [np.asarray(dtr.X[g][:, : mks[g]]) for g in range(b)]
                Xg_te = [np.asarray(dte.X[g][:, : mks[g]]) for g in range(b)]
                y_tr = np.asarray(dtr.y)
                y_te = np.asarray(dte.y)
                rows_j.append(
                    run_jax(dtr, dte, mks, cl, il, seed=rep, outdir=f"{td}/run")
                )
                rows_o.append(run_oracle(Xg_tr, y_tr, Xg_te, y_te, cl, il, seed=rep))
                print(
                    f"h2={h2} rep={rep}: jax r2={rows_j[-1]['test_r2']:.3f} "
                    f"acc={rows_j[-1]['acc']:.2f} early={rows_j[-1]['early']:.2f} | "
                    f"oracle r2={rows_o[-1]['test_r2']:.3f} "
                    f"acc={rows_o[-1]['acc']:.2f} early={rows_o[-1]['early']:.2f}",
                    flush=True,
                )
        rec = {"h2": h2, "reps": reps, "chain_length": cl, "il": il}
        for key in ("test_r2", "acc", "early", "mse_train_final"):
            a = np.array([r[key] for r in rows_j])
            o = np.array([r[key] for r in rows_o])
            se = float(np.sqrt(a.var(ddof=1) / len(a) + o.var(ddof=1) / len(o)))
            diff = float(a.mean() - o.mean())
            rec[key] = {
                "jax_mean": round(float(a.mean()), 4),
                "oracle_mean": round(float(o.mean()), 4),
                "diff": round(diff, 4),
                "combined_se": round(se, 4),
                "verdict": "pass" if abs(diff) <= 2.0 * se else "FAIL",
            }
        table.append(rec)
        print(json.dumps(rec), flush=True)

    out = {
        "workload": "sim_train_pred.sh lasso-base b=1 m=20 n=1000 w=10 d=0 gamma(3,1)",
        "comparison": "rs_bann_tpu sequential sampler vs NumPy reference-mirror oracle",
        "tolerance": "2 x combined standard error over fresh-seed replicates",
        "rows": table,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")

    if args.merge:
        bs_path = Path(__file__).resolve().parent.parent / "BASELINE_SELF.json"
        bs = json.loads(bs_path.read_text())
        bs["oracle_parity"] = out
        bs_path.write_text(json.dumps(bs, indent=2))
        print(f"merged into {bs_path}")


if __name__ == "__main__":
    main()
