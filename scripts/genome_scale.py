"""Genome-scale accuracy experiment driver.

The workload behind BASELINE_SELF.json's ``genome_scale`` section
(the rebuild's stand-in for the reference's UKB-scale study,
/root/reference/scripts/sim_random_phen.r): a sparse linear trait over
``--snps`` markers split into ``--branches`` uniform groups, h² controlled,
trained with any model/update-mode/sampler configuration, reporting the
posterior-mean test r² against the closed-form ridge-BLUP baseline and the
sparse-oracle ceiling.

Truth: X_ij ~ Binomial(2, maf_j), maf_j ~ U(0.05, 0.5); a ``--causal-frac``
random subset of standardized markers gets β_j ~ N(0, 1), g = X_std β scaled
so var(g)/var(y) = h². Truth and MCMC seeds are separate so replications can
vary either independently.

Usage examples:
  python scripts/genome_scale.py --update-mode hybrid --block-size 10 \
      --chain-length 400                       # the r²≈0.34-0.39 config
  python scripts/genome_scale.py --update-mode hybrid --block-size 10 \
      --chain-length 400 --mass-adaptation --step-size-mode dual_averaging
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_data(args):
    rng = np.random.default_rng(args.seed_truth)
    m_tot = args.snps
    n = args.n_train + args.n_test
    maf = rng.uniform(0.05, 0.5, m_tot)
    X = rng.binomial(2, maf, size=(n, m_tot)).astype(np.float32)
    mu, sd = X.mean(0), X.std(0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    ncausal = max(1, int(round(args.causal_frac * m_tot)))
    if args.causal_branches > 0:
        # clustered architecture (the gene-grouping premise): causal markers
        # confined to a random subset of branches — the regime where
        # branch-level spike-and-slab selection has signal to find
        m = m_tot // args.branches
        picked = rng.choice(args.branches, args.causal_branches, replace=False)
        pool = np.concatenate([np.arange(b * m, (b + 1) * m) for b in picked])
        causal = rng.choice(pool, min(ncausal, pool.size), replace=False)
    else:
        causal = rng.choice(m_tot, ncausal, replace=False)
    beta = np.zeros(m_tot, np.float32)
    beta[causal] = rng.standard_normal(ncausal)
    g = Xs @ beta
    if args.epistasis > 0:
        # VERDICT r3 #6: within-group pairwise interactions — the regime
        # nonlinear branch MLPs (architectures.rs:31) exist for. A fraction
        # ``--epistasis`` of the genetic variance comes from products of
        # standardized causal-marker pairs drawn INSIDE the same branch
        # (interactions never cross group boundaries, so a branch net can
        # in principle represent its own group's term); the rest stays
        # additive. Pair effects ~ N(0,1) on standardized products.
        m = m_tot // args.branches
        by_branch = {}
        for j in causal:
            by_branch.setdefault(j // m, []).append(j)
        pairs = []
        for js in by_branch.values():
            js = np.asarray(js)
            if js.size < 2:
                continue
            npairs = max(1, js.size // 2)
            for _ in range(npairs):
                a, b = rng.choice(js, 2, replace=False)
                pairs.append((a, b))
        if pairs:
            P = np.stack([Xs[:, a] * Xs[:, b] for a, b in pairs], axis=1)
            P = (P - P.mean(0)) / np.where(P.std(0) > 0, P.std(0), 1.0)
            g_epi = P @ rng.standard_normal(len(pairs)).astype(np.float32)
            add_sd = g.std() if g.std() > 0 else 1.0
            epi_sd = g_epi.std() if g_epi.std() > 0 else 1.0
            w_epi = np.sqrt(args.epistasis)
            w_add = np.sqrt(1.0 - args.epistasis)
            g = w_add * (g / add_sd) + w_epi * (g_epi / epi_sd)
    noise = rng.standard_normal(n) * np.sqrt(g.var() * (1 / args.h2 - 1))
    y = (g + noise).astype(np.float32)
    y = (y - y.mean()) / y.std()
    realized_h2 = float(g.var() / (g + noise).var())
    tr = slice(0, args.n_train)
    te = slice(args.n_train, n)
    return X[tr], y[tr], X[te], y[te], g[te], realized_h2


def blup_r2(X_tr, y_tr, X_te, y_te, h2):
    """Closed-form ridge/BLUP baseline: λ = m(1−h²)/h², solved in the
    n×n dual form (m ≫ n territory is the whole point of BLUP)."""
    mu, sd = X_tr.mean(0), X_tr.std(0)
    sd[sd == 0] = 1.0
    Z_tr = (X_tr - mu) / sd
    Z_te = (X_te - mu) / sd
    m = X_tr.shape[1]
    lam = m * (1 - h2) / h2
    K = Z_tr @ Z_tr.T
    alpha = np.linalg.solve(K + lam * np.eye(K.shape[0]), y_tr - y_tr.mean())
    pred = Z_te @ (Z_tr.T @ alpha) + y_tr.mean()
    return float(np.corrcoef(pred, y_te)[0, 1] ** 2)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--snps", type=int, default=10_000)
    ap.add_argument("--branches", type=int, default=100)
    ap.add_argument("--n-train", type=int, default=8000)
    ap.add_argument("--n-test", type=int, default=1600)
    ap.add_argument("--h2", type=float, default=0.6)
    ap.add_argument("--causal-frac", type=float, default=0.05)
    ap.add_argument("--epistasis", type=float, default=0.0,
                    help="fraction of genetic variance from within-group "
                    "pairwise interaction terms (0 = purely additive)")
    ap.add_argument("--interactions", type=int, default=0,
                    help="append the top-K within-branch pairwise product "
                    "features per branch (screened by |corr(x_a*x_b, y)| "
                    "on the training data - sure-independence screening "
                    "for interactions). Makes pure-epistatic truth "
                    "(--epistasis 1.0) representable by the identity "
                    "model; dense paths only")
    ap.add_argument("--causal-branches", type=int, default=0,
                    help="confine causal markers to this many random "
                    "branches (0 = diffuse over all)")
    ap.add_argument("--model", default="ridge_ard")
    ap.add_argument("--activation", default="identity")
    ap.add_argument("--depth", type=int, default=0)
    ap.add_argument("--summary-width", type=int, default=8)
    ap.add_argument("--hidden-width", type=int, default=8)
    ap.add_argument("--update-mode", default="hybrid",
                    choices=["sequential", "parallel", "hybrid"])
    ap.add_argument("--block-size", type=int, default=10)
    ap.add_argument("--chain-length", type=int, default=400)
    ap.add_argument("--burn-in", type=int, default=None)
    ap.add_argument("--integration-length", type=int, default=30)
    ap.add_argument("--step-size", type=float, default=1.0)
    ap.add_argument("--step-size-mode", default="izmailov")
    ap.add_argument("--mass-adaptation", action="store_true")
    ap.add_argument("--spike-slab", action="store_true")
    ap.add_argument("--ss-pi", type=float, default=0.5)
    ap.add_argument("--ss-warmup", type=int, default=-1)
    ap.add_argument("--ss-markers", action="store_true",
                    help="per-marker (within-branch) spike-and-slab: exact "
                    "collapsed conjugate move on layer-0 rows (identity "
                    "depth-0 ridge/std_normal only)")
    ap.add_argument("--ssm-pi", type=float, default=0.5)
    ap.add_argument("--ssm-fixed-pi", action="store_true")
    ap.add_argument("--ssm-warmup", type=int, default=0)
    ap.add_argument("--ss-rows", action="store_true",
                    help="per-marker selection for nonlinear branches "
                    "(two-component ARD row-prior mixture, ridge_ard any "
                    "depth/activation)")
    ap.add_argument("--ssr-pi", type=float, default=0.5)
    ap.add_argument("--ssr-fixed-pi", action="store_true")
    ap.add_argument("--ssr-spike", type=float, default=1e4)
    ap.add_argument("--ssr-warmup", type=int, default=0)
    ap.add_argument("--ssr-shape", type=float, default=1.0)
    ap.add_argument("--ssr-scale", type=float, default=1.0)
    ap.add_argument("--traj-length-mode", default="fixed",
                    choices=["fixed", "jittered", "uturn"])
    ap.add_argument("--gd-warmup", type=int, default=0)
    ap.add_argument("--num-chains", type=int, default=1)
    ap.add_argument("--tempering", action="store_true",
                    help="parallel tempering over the chain axis (needs "
                    "--num-chains >= 2; samples come from the cold chain)")
    ap.add_argument("--max-temperature", type=float, default=4.0)
    ap.add_argument("--seed-truth", type=int, default=1)
    ap.add_argument("--seed-init", type=int, default=1)
    ap.add_argument("--seed-mcmc", type=int, default=3)
    ap.add_argument("--blup", action="store_true", help="also run ridge BLUP")
    ap.add_argument("--packed", action="store_true",
                    help="keep train genotypes 2-bit packed in HBM (fused "
                    "Pallas decode; 16x less device memory - the large-n "
                    "UKB-scale path)")
    ap.add_argument("--feat-major", action="store_true",
                    help="dense feature-major bf16 genotypes [G, m_pad, n] "
                    "(8x the packed HBM footprint but no per-step 2-bit "
                    "decode; fits to ~n=100k at 10k SNPs on 16 GB)")
    ap.add_argument("--no-live-accept", action="store_true",
                    help="restore the stale-residual accept for the "
                    "parallel/hybrid schedules (pre-r3 approximate kernel; "
                    "bisection/debug aid)")
    ap.add_argument("--checkpoint-interval", type=int, default=0,
                    help="write <outdir>/checkpoint.npz every N iterations "
                    "(full carry incl. RNG state; resumes bit-for-bit)")
    ap.add_argument("--resume-from", default=None,
                    help="checkpoint.npz to restore and continue from")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--outdir", default=None, help="keep run artifacts here")
    ap.add_argument("--json-out", default=None, help="append result line here")
    args = ap.parse_args(argv)

    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s [%(name)s] %(message)s",
        stream=sys.stderr,
    )
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.data import stack_standardized
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
    from rs_bann_tpu.train import train
    from rs_bann_tpu.vis import posterior_predictions

    # Full-input cache for the packed path: UKB-scale simulation + packing
    # is ~45 min on this 2-vCPU box, entirely deterministic in these args.
    cache = None
    if args.packed:
        import hashlib

        epi = f":{args.epistasis}" if args.epistasis > 0 else ""
        key = hashlib.sha1(
            f"v2:{args.snps}:{args.branches}:{args.n_train}:{args.n_test}:"
            f"{args.h2}:{args.causal_frac}:{args.causal_branches}:"
            f"{args.seed_truth}{epi}".encode()
        ).hexdigest()[:12]
        cache = Path(f"/tmp/gscache_{key}.npz")

    if cache is not None and cache.exists():
        z = np.load(cache)
        by, scale, shift = z["by"], z["scale"], z["shift"]
        y_tr, y_te, g_te = z["y_tr"], z["y_te"], z["g_te"]
        Xte_std = z["Xte_std"]  # [G, n_te, m_pad], train moments
        realized_h2 = float(z["realized_h2"])
        X_tr = X_te = None
        print(f"genome-scale cache hit: {cache}", file=sys.stderr, flush=True)
    else:
        X_tr, y_tr, X_te, y_te, g_te, realized_h2 = make_data(args)
        Xte_std = None
    oracle = float(np.corrcoef(g_te, y_te)[0, 1] ** 2)
    print(f"realized h2 = {realized_h2:.3f}, oracle (true-g) test r2 = "
          f"{oracle:.3f}", file=sys.stderr, flush=True)

    rec = {
        "workload": f"G={args.branches} x m={args.snps // args.branches} "
        f"({args.snps} SNPs), n={args.n_train}/{args.n_test}, "
        f"{args.causal_frac:.0%} causal, h2={args.h2}",
        "realized_h2": round(realized_h2, 3),
        "oracle_r2": round(oracle, 3),
        "model": args.model,
        "activation": args.activation,
        "depth": args.depth,
        "hidden_width": args.hidden_width,
        "summary_width": args.summary_width,
        "update_mode": args.update_mode,
        "block_size": args.block_size,
        "chain_length": args.chain_length,
        "step_size_mode": args.step_size_mode,
        "mass_adaptation": args.mass_adaptation,
        "spike_slab": args.spike_slab,
        "ss_markers": args.ss_markers,
        "ss_rows": args.ss_rows,
        "packed": args.packed,
        "feat_major": args.feat_major,
        "epistasis": args.epistasis,
        "n_train": args.n_train,
        "traj_length_mode": args.traj_length_mode,
        "causal_branches": args.causal_branches,
        "tempering": args.tempering,
        "num_chains": args.num_chains,
        "seeds": [args.seed_truth, args.seed_init, args.seed_mcmc],
    }
    if args.resume_from:
        rec["resumed_from"] = args.resume_from

    if args.blup:
        t0 = time.time()
        rec["blup_r2"] = round(blup_r2(X_tr, y_tr, X_te, y_te, args.h2), 3)
        print(f"ridge BLUP test r2 = {rec['blup_r2']} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    G = args.branches
    m = args.snps // G
    cols_tr = None if X_tr is None else [X_tr[:, g * m:(g + 1) * m] for g in range(G)]
    cols_te = None if X_te is None else [X_te[:, g * m:(g + 1) * m] for g in range(G)]
    if args.interactions > 0:
        assert not args.packed, "--interactions needs a dense path"
        assert cols_tr is not None
        K = args.interactions
        yc = (y_tr - y_tr.mean()) / y_tr.std()
        n_scr = len(yc)
        kept_pairs = []
        for g in range(G):
            Z = cols_tr[g].astype(np.float32)
            mu, sd = Z.mean(0), Z.std(0)
            Z = (Z - mu) / np.where(sd > 0, sd, 1.0)
            # all m(m-1)/2 products' correlation with y, vectorized:
            # corr(z_a z_b, y) ∝ (z_a ⊙ z_b)·y = sum_i z_ia z_ib y_i
            # = (Zᵀ diag(y) Z)[a, b]
            S = Z.T @ (Z * yc[:, None]) / n_scr          # E[z_a z_b y]
            P2 = (Z * Z).T @ (Z * Z) / n_scr             # E[(z_a z_b)^2]
            M = Z.T @ Z / n_scr                          # E[z_a z_b]
            # |corr(z_a z_b, y)| (y standardized): the product's mean is
            # the marker correlation, its variance P2 - M^2
            with np.errstate(invalid="ignore", divide="ignore"):
                C2 = np.abs(S - M * 0.0) / np.sqrt(
                    np.maximum(P2 - M * M, 1e-9)
                )
            iu = np.triu_indices(Z.shape[1], 1)
            score = C2[iu]
            top = np.argsort(-score)[:K]
            pairs = [(iu[0][t], iu[1][t]) for t in top]
            kept_pairs.append((pairs, mu, sd))
            prod_tr = np.stack(
                [Z[:, a] * Z[:, b] for a, b in pairs], axis=1
            ).astype(np.float32)
            cols_tr[g] = np.concatenate([cols_tr[g], prod_tr], axis=1)
            Zt = (cols_te[g].astype(np.float32) - mu) / np.where(sd > 0, sd, 1.0)
            prod_te = np.stack(
                [Zt[:, a] * Zt[:, b] for a, b in pairs], axis=1
            ).astype(np.float32)
            cols_te[g] = np.concatenate([cols_te[g], prod_te], axis=1)
        m = m + K
        rec["interactions"] = K
        print(f"interaction screening: +{K} product features/branch "
              f"(input width {m})", file=sys.stderr, flush=True)
    arch = NetArch.uniform(
        G, m, args.hidden_width, args.depth, args.summary_width,
        activation=args.activation,
    )
    if args.packed:
        # 2-bit packed HBM-resident train genotypes; standardization folds
        # into the fused decode kernel (scale = 1/sigma, shift = mu)
        import jax.numpy as jnp

        from rs_bann_tpu.models.density import PackedX
        from rs_bann_tpu.models.data import StackedData
        from rs_bann_tpu.ops.packed_matmul import GBYTES, GROUP, pack_strided

        n_tr = args.n_train
        if cols_tr is not None:  # cache miss: pack + build + persist
            B = -(-n_tr // GROUP) * GBYTES
            by = np.empty((G, arch.m_pad, B), np.uint8)
            scale = np.zeros((G, arch.m_pad), np.float32)
            shift = np.zeros((G, arch.m_pad), np.float32)
            raw = np.zeros((arch.m_pad, n_tr), np.float32)
            for g in range(G):
                raw[:] = 0.0
                raw[: arch.m[g]] = cols_tr[g].T
                by[g] = pack_strided(raw)
                sd_g = cols_tr[g].std(0)
                scale[g, : arch.m[g]] = np.where(sd_g > 0, 1.0 / np.where(sd_g > 0, sd_g, 1.0), 0.0)
                shift[g, : arch.m[g]] = cols_tr[g].mean(0)
            Xte_std = np.zeros((G, args.n_test, arch.m_pad), np.float32)
            for g in range(G):
                mu_g = cols_tr[g].mean(0)
                sd_g = np.where(cols_tr[g].std(0) == 0, 1, cols_tr[g].std(0))
                Xte_std[g, :, :m] = (cols_te[g] - mu_g) / sd_g
            np.savez(
                cache, by=by, scale=scale, shift=shift, y_tr=y_tr,
                y_te=y_te, g_te=g_te, Xte_std=Xte_std,
                realized_h2=realized_h2,
            )
        dtr = StackedData(
            PackedX(jnp.asarray(by), jnp.asarray(scale), jnp.asarray(shift), n_tr),
            jnp.asarray(y_tr),
        )
    elif args.feat_major:
        import jax.numpy as jnp

        dtr = stack_standardized(
            arch, cols_tr, y_tr, dtype=jnp.bfloat16, feature_major=True
        )
    else:
        dtr = stack_standardized(arch, cols_tr, y_tr)
    # test matrices standardized with TRAIN moments (bed.rs:304-323 contract)
    if Xte_std is not None:
        import jax.numpy as jnp

        from rs_bann_tpu.models.data import StackedData

        dte = StackedData(jnp.asarray(Xte_std), jnp.asarray(y_te))
    else:
        mu = [c.mean(0) for c in cols_tr]
        sd = [np.where(c.std(0) == 0, 1, c.std(0)) for c in cols_tr]
        cols_te_std = [
            ((c - mu[g]) / sd[g]).astype(np.float32) for g, c in enumerate(cols_te)
        ]
        dte = stack_standardized(arch, cols_te_std, y_te, standardize=False)

    state, _ = init_net(arch, args.model, InitCfg(seed=args.seed_init))
    net = Net(args.model, arch, D.Hyperparameters(), state)
    import tempfile

    outdir = args.outdir or tempfile.mkdtemp(prefix="gscale_")
    cl = args.chain_length
    cfg = MCMCCfg(
        chain_length=cl,
        burn_in=cl // 2 if args.burn_in is None else args.burn_in,
        hmc_integration_length=args.integration_length,
        hmc_step_size_factor=args.step_size,
        hmc_step_size_mode=args.step_size_mode,
        update_mode=args.update_mode,
        block_size=args.block_size,
        gd_warmup=args.gd_warmup,
        mass_adaptation=args.mass_adaptation,
        spike_slab=args.spike_slab,
        ss_pi=args.ss_pi,
        ss_warmup=args.ss_warmup,
        ss_markers=args.ss_markers,
        ssm_pi=args.ssm_pi,
        ssm_fixed_pi=args.ssm_fixed_pi,
        ssm_warmup=args.ssm_warmup,
        ss_rows=args.ss_rows,
        ssr_pi=args.ssr_pi,
        ssr_fixed_pi=args.ssr_fixed_pi,
        ssr_spike=args.ssr_spike,
        ssr_warmup=args.ssr_warmup,
        ssr_shape=args.ssr_shape,
        ssr_scale=args.ssr_scale,
        hmc_traj_length_mode=args.traj_length_mode,
        tempering=args.tempering,
        max_temperature=args.max_temperature,
        num_chains=args.num_chains,
        live_accept=not args.no_live_accept,
        outpath=outdir,
        seed=args.seed_mcmc,
    )
    t0 = time.time()
    net, stats = train(
        net, dtr, cfg, test_data=dte, verbose=True,
        checkpoint_interval=args.checkpoint_interval,
        resume_from=args.resume_from,
    )
    rec["wall_s"] = round(time.time() - t0, 1)
    rec["acceptance_rate"] = round(stats.acceptance_rate(), 3)
    preds = posterior_predictions(f"{outdir}/models", dte.X)
    pm = preds.mean(axis=0)
    rec["test_r2"] = round(float(np.corrcoef(pm, y_te)[0, 1] ** 2), 3)
    import os as _os

    if (args.spike_slab or args.ss_markers or args.ss_rows) and _os.path.exists(
        f"{outdir}/inclusion_probs"
    ):
        ip = json.load(open(f"{outdir}/inclusion_probs"))
        if args.spike_slab:
            rec["inclusion_pi"] = round(ip["pi"], 3)
            pip = np.asarray(ip["pip"])
            rec["branches_pip_gt_half"] = int((pip > 0.5).sum())
        if (args.ss_markers or args.ss_rows) and "pip_markers" in ip:
            flat = np.concatenate([np.asarray(r) for r in ip["pip_markers"]])
            rec["ssm_pi"] = round(ip.get("pi_markers", args.ssm_pi), 4)
            rec["markers_pip_gt_half"] = int((flat > 0.5).sum())
    print(json.dumps(rec), flush=True)
    if args.json_out:
        with open(args.json_out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
