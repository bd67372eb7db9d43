"""Posterior analysis utilities.

Rebuild of the reference's out-of-repo tooling ``py-vis/vis.py`` (trace /
trajectory / training-stats parsing and posterior-vs-truth comparison) and
the expected-r² formulas of ``py-vis/sim.py:151-169``.

All loaders return plain numpy structures; plotting helpers use matplotlib
lazily and are optional.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


# --------------------------------------------------------------- loaders


def load_training_stats(outdir) -> dict:
    with open(Path(outdir) / "training_stats") as f:
        return json.load(f)


def load_hyperparams(outdir) -> dict:
    with open(Path(outdir) / "hyperparams") as f:
        return json.load(f)


def load_trace(outdir):
    """trace JSONL -> list (iterations) of list (branches) of dicts
    (net.rs:349-352 schema: params + precisions per branch)."""
    out = []
    with open(Path(outdir) / "trace") as f:
        for line in f:
            if line.strip():
                out.append(json.loads(line))
    return out


def trace_param_matrix(trace, branch_ix: int) -> np.ndarray:
    """[iterations, num_params] flattened in reference param_vec order
    (weights column-major per layer, then biases)."""
    rows = []
    for it in trace:
        b = it[branch_ix]
        vec = []
        for w in b["params"]["weights"]:
            vec.extend(w)
        for bias in b["params"]["biases"]:
            vec.extend(bias)
        rows.append(vec)
    return np.asarray(rows, np.float32)


def trace_precision_matrix(trace, branch_ix: int) -> np.ndarray:
    rows = []
    for it in trace:
        b = it[branch_ix]
        vec = []
        for w in b["precisions"]["weight_precisions"]:
            vec.extend(w)
        for bias in b["precisions"]["bias_precisions"]:
            vec.extend(bias)
        vec.extend(b["precisions"]["error_precision"])
        rows.append(vec)
    return np.asarray(rows, np.float32)


def load_true_params(sim_outdir):
    """model.params written by simulate-* (list of branch dicts)."""
    with open(Path(sim_outdir) / "model.params") as f:
        return json.load(f)


def load_trajectories(outdir):
    """traj JSONL -> list of per-hmc-step records (trajectory.rs:4-43)."""
    out = []
    with open(Path(outdir) / "traj") as f:
        for line in f:
            if line.strip():
                out.append(json.loads(line))
    return out


def posterior_predictions(models_dir, X) -> np.ndarray:
    """[samples, n] predictions from every saved model sample.

    Multi-chain runs store per-chain sample streams in ``chain<k>/``
    subdirectories (train.py save_sample); these are pooled — the posterior
    mean over the pooled store is the multi-chain consensus predictor."""
    from .models.net import Net

    files = sorted(
        (p for p in Path(models_dir).iterdir() if p.suffix == ".npz"),
        key=lambda p: int(p.stem),
    )
    if not files:
        files = sorted(
            (
                p
                for d in sorted(Path(models_dir).glob("chain*"))
                for p in d.iterdir()
                if p.suffix == ".npz"
            ),
            key=lambda p: (p.parent.name, int(p.stem)),
        )
    return np.stack([np.asarray(Net.load(str(p)).predict(X)) for p in files])


# -------------------------------------------------- per-layer trace slices


def _layer_sizes(branch_rec) -> list:
    """Per-layer (n_weights, n_biases) from one trace branch record."""
    ws = branch_rec["params"]["weights"]
    bs = branch_rec["params"]["biases"]
    return [
        (len(ws[l]), len(bs[l]) if l < len(bs) else 0) for l in range(len(ws))
    ]


def trace_layer_weights(trace, branch_ix: int, layer_ix: int) -> np.ndarray:
    """[iterations, n_w(layer)] weight values of one layer (column-major
    flat, same order the reference's Trace.layer_weights yields,
    py-vis/vis.py:219-268)."""
    return np.asarray(
        [it[branch_ix]["params"]["weights"][layer_ix] for it in trace],
        np.float32,
    )


def trace_layer_biases(trace, branch_ix: int, layer_ix: int) -> np.ndarray:
    return np.asarray(
        [it[branch_ix]["params"]["biases"][layer_ix] for it in trace],
        np.float32,
    )


def trace_layer_weight_precisions(trace, branch_ix, layer_ix) -> np.ndarray:
    return np.asarray(
        [it[branch_ix]["precisions"]["weight_precisions"][layer_ix]
         for it in trace],
        np.float32,
    )


def trace_layer_bias_precisions(trace, branch_ix, layer_ix) -> np.ndarray:
    return np.asarray(
        [it[branch_ix]["precisions"]["bias_precisions"][layer_ix]
         for it in trace],
        np.float32,
    )


def trace_error_precision(trace, branch_ix: int = 0) -> np.ndarray:
    return np.asarray(
        [it[branch_ix]["precisions"]["error_precision"][0] for it in trace],
        np.float32,
    )


# ------------------------------------------------------ baseline regressors


def _ridge_fit_predict(x_tr, y_tr, x_te, alpha=1.0):
    """Closed-form ridge (the reference baselines use sklearn Ridge(1.0),
    py-vis/vis.py:867-903; numpy normal equations here — same estimator:
    X and y centered so the intercept is unpenalized, exactly what
    sklearn's fit_intercept=True does). Solved in whichever of the
    primal/dual forms is smaller."""
    x_tr = np.asarray(x_tr, np.float64)
    x_te = np.asarray(x_te, np.float64)
    y_tr = np.asarray(y_tr, np.float64)
    xm = x_tr.mean(axis=0)
    xc = x_tr - xm
    mu = y_tr.mean()
    yc = y_tr - mu
    n, m = x_tr.shape
    if m <= n:
        a = xc.T @ xc + alpha * np.eye(m)
        beta = np.linalg.solve(a, xc.T @ yc)
    else:
        k = xc @ xc.T + alpha * np.eye(n)
        beta = xc.T @ np.linalg.solve(k, yc)
    return xc @ beta + mu, (x_te - xm) @ beta + mu


def r2_score(y_pred, y_true) -> float:
    """1 - SSR/SST (the reference's r2, py-vis/vis.py:904-907)."""
    y_true = np.asarray(y_true, np.float64)
    y_pred = np.asarray(y_pred, np.float64)
    return float(
        1 - np.sum((y_true - y_pred) ** 2)
        / np.sum((y_true - y_true.mean()) ** 2)
    )


def ridge_r2(x_tr, y_tr, x_te, y_te, alpha=1.0):
    p_tr, p_te = _ridge_fit_predict(x_tr, y_tr, x_te, alpha)
    return r2_score(p_tr, y_tr), r2_score(p_te, y_te)


def ridge_mse(x_tr, y_tr, x_te, y_te, alpha=1.0):
    p_tr, p_te = _ridge_fit_predict(x_tr, y_tr, x_te, alpha)
    return (
        float(((p_tr - y_tr) ** 2).mean()),
        float(((p_te - y_te) ** 2).mean()),
    )


def linreg_r2(x_tr, y_tr, x_te, y_te):
    """OLS baseline (mse_linreg / LinearRegression upstream): X and y
    centered (= free intercept), solved via lstsq for rank safety."""
    x_tr = np.asarray(x_tr, np.float64)
    xm = x_tr.mean(axis=0)
    mu = np.asarray(y_tr, np.float64).mean()
    beta, *_ = np.linalg.lstsq(x_tr - xm, np.asarray(y_tr) - mu, rcond=None)
    return (
        r2_score((x_tr - xm) @ beta + mu, y_tr),
        r2_score((np.asarray(x_te, np.float64) - xm) @ beta + mu, y_te),
    )


# -------------------------------------------------------- sim-dir loaders


def load_phen_stats(sim_outdir, split: str = "train") -> dict:
    with open(Path(sim_outdir) / f"{split}_phen_stats.json") as f:
        return json.load(f)


def load_genetic_values(sim_outdir):
    """(g_train, g_test) written by simulate-xy (vis.py:496-502)."""
    with open(Path(sim_outdir) / "genetic_values_train.json") as f:
        g_tr = np.asarray(json.load(f)["y"], np.float32)
    with open(Path(sim_outdir) / "genetic_values_test.json") as f:
        g_te = np.asarray(json.load(f)["y"], np.float32)
    return g_tr, g_te


def load_predictions_csv(path) -> np.ndarray:
    """[samples, n] matrix from a predict-CLI CSV (one row per posterior
    sample, rs-bann.rs:308-310)."""
    return np.loadtxt(path, delimiter=",", ndmin=2)


# --------------------------------------------------------------- summaries


def posterior_mean_vs_truth(trace, true_params, burn_in: int = 0) -> dict:
    """Per-branch correlation of posterior-mean params with the generating
    model's params (the reference's plot_single_branch_posterior_means,
    vis.py:385, as a numeric summary)."""
    out = {}
    for g in range(len(true_params)):
        mat = trace_param_matrix(trace, g)[burn_in:]
        post_mean = mat.mean(axis=0)
        tv = []
        for w in true_params[g]["params"]["weights"]:
            tv.extend(w)
        for b in true_params[g]["params"]["biases"]:
            tv.extend(b)
        tv = np.asarray(tv, np.float32)
        if tv.shape != post_mean.shape:
            raise ValueError(
                f"param count mismatch branch {g}: {tv.shape} vs {post_mean.shape}"
            )
        denom = post_mean.std() * tv.std()
        corr = float(((post_mean - post_mean.mean()) * (tv - tv.mean())).mean() / denom) if denom > 0 else float("nan")
        out[g] = {
            "corr": corr,
            "rmse": float(np.sqrt(((post_mean - tv) ** 2).mean())),
        }
    return out


def expected_r2(m: int, n: int, h2: float, formula: str = "daetwyler"):
    """Expected predictive r² in an independent sample (py-vis/sim.py:151-169).

    daetwyler: r² = k/(k+1) with k = n·h²/m.
    wray: the roots x of the quadratic k·x² − (1+k)·x + h² = 0 with
    k = m/(n+h²), returned as correlations √x, smaller (physical) root
    first. The physical root → h² as n → ∞ and decreases with m/n.

    Upstream-bug note: the reference's expression (py-vis/sim.py:163-166)
    misplaces the /(−2k) divisor (it divides only the discriminant, with a
    sign flip) and flips the discriminant's −4kh² term to +, so its second
    "root" goes negative and the outer sqrt emits NaN. Both expressions are
    attempts at the same quadratic-root formula; this is the well-formed one
    (minus root ≡ upstream's intent, verified against the n → ∞ limit).
    """
    if formula in ("daetwyler", "deatwyler"):
        k = n * h2 / m
        return k / (k + 1)
    if formula in ("wray", "wrey"):
        k = m / (n + h2)
        disc = np.sqrt((1 + k) ** 2 - 4 * k * h2)
        x1 = ((1 + k) - disc) / (2 * k)
        x2 = ((1 + k) + disc) / (2 * k)
        return np.sqrt([x1, x2])
    raise ValueError(formula)


# ----------------------------------------------------------------- plots


def plot_training_stats(outdir, save_to=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    st = load_training_stats(outdir)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].plot(st["mse_train"], label="train")
    if st.get("mse_test"):
        axes[0].plot(st["mse_test"], label="test")
    axes[0].set_xlabel("iteration")
    axes[0].set_ylabel("mse")
    axes[0].legend()
    axes[1].plot(st["lpd"])
    axes[1].set_xlabel("iteration")
    axes[1].set_ylabel("log posterior density")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


def plot_inclusion_probs(rundir, save_to=None):
    """Bar chart of per-branch posterior inclusion probabilities
    (<rundir>/inclusion_probs, written by spike-and-slab training runs)."""
    import json
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rec = json.load(open(os.path.join(rundir, "inclusion_probs")))
    # branch-level PIPs (--spike-slab), per-marker PIPs (--ss-markers), or
    # both (one panel per level for a run that used both)
    series = []
    if "pip" in rec:
        series.append(
            (np.asarray(rec["pip"]), rec["pi"], "branch (SNP group)")
        )
    if "pip_markers" in rec:
        series.append(
            (
                np.concatenate([np.asarray(r) for r in rec["pip_markers"]]),
                rec["pi_markers"],
                "marker",
            )
        )
    if not series:
        raise ValueError(f"no pip/pip_markers in {rundir}/inclusion_probs")
    width = max(6, min(20, 0.12 * max(len(p) for p, _, _ in series)))
    fig, axes = plt.subplots(
        len(series), 1, figsize=(width, 3.5 * len(series)), squeeze=False
    )
    for ax, (pip, pi, xlabel) in zip(axes[:, 0], series):
        ax.bar(np.arange(len(pip)), pip, width=0.9)
        ax.axhline(0.5, ls="--", lw=0.8, color="gray")
        ax.axhline(pi, ls=":", lw=0.8, color="tab:red", label=f"pi = {pi:.3f}")
        ax.set_xlabel(xlabel)
        ax.set_ylabel("posterior inclusion probability")
        ax.set_ylim(0, 1.02)
        ax.legend()
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


def plot_trajectory(outdir, record_ix=0, save_to=None):
    """One HMC trajectory record: the Hamiltonian series and per-parameter
    leapfrog paths (py-vis/vis.py trajectory plots; trajectory.rs:4-43)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rec = load_trajectories(outdir)[record_ix]
    params = np.asarray(rec["params"])  # [L, P]
    ham = np.asarray(rec["hamiltonian"])  # [L+1]
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].plot(ham, marker=".")
    axes[0].set_xlabel("leapfrog step")
    axes[0].set_ylabel("-H (log density - kinetic)")
    axes[0].set_title(f"branch {rec.get('branch_ix', '?')}")
    axes[1].plot(params, lw=0.8)
    axes[1].set_xlabel("leapfrog step")
    axes[1].set_ylabel("parameter value")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


def plot_grad_check(outdir, save_to=None):
    """Analytic vs numerical log-density gradients across all trajectory
    records (py-vis/vis.py gradient-check diff plots; requires a run with
    --num-grad-traj)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recs = load_trajectories(outdir)
    diffs = []
    for rec in recs:
        if not rec.get("num_ldg"):
            continue
        a = np.asarray(rec["ldg"])
        n = np.asarray(rec["num_ldg"])
        diffs.append(np.abs(a - n).max(axis=1))  # per-step max |diff|
    if not diffs:
        raise ValueError("no num_ldg in trajectories; run with --num-grad-traj")
    fig, ax = plt.subplots(figsize=(6, 4))
    for d in diffs:
        ax.plot(d, lw=0.7, alpha=0.6)
    ax.set_yscale("log")
    ax.set_xlabel("leapfrog step")
    ax.set_ylabel("max |analytic - numerical| gradient")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


def plot_posterior_means(trace, true_params, branch_ix=0, burn_in=0, save_to=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mat = trace_param_matrix(trace, branch_ix)[burn_in:]
    post_mean = mat.mean(axis=0)
    tv = []
    for w in true_params[branch_ix]["params"]["weights"]:
        tv.extend(w)
    for b in true_params[branch_ix]["params"]["biases"]:
        tv.extend(b)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(tv, post_mean, ".")
    lim = max(np.abs(tv).max(), np.abs(post_mean).max()) * 1.1
    ax.plot([-lim, lim], [-lim, lim], "k--", lw=0.5)
    ax.set_xlabel("true param")
    ax.set_ylabel("posterior mean")
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


def _r2_curves(rundir, sim_outdir):
    """R² trajectories from training_stats MSE series against phenotype
    variance (vis.py:553-558), plus the h² lines."""
    st = load_training_stats(rundir)
    tr = load_phen_stats(sim_outdir, "train")
    te = load_phen_stats(sim_outdir, "test")
    r2_tr = 1 - np.asarray(st["mse_train"]) / tr["variance"]
    r2_te = (
        1 - np.asarray(st["mse_test"]) / te["variance"]
        if st.get("mse_test") else None
    )
    h2_tr = (tr["variance"] - tr["env_variance"]) / tr["variance"]
    h2_te = (te["variance"] - te["env_variance"]) / te["variance"]
    return st, r2_tr, r2_te, h2_tr, h2_te


def _lam_e_panel(ax, lam_e, burn_in, env_var):
    """Shared error-precision trace panel: chain, posterior-mean line,
    1/env_variance truth line, log scale."""
    ax.plot(lam_e)
    ax.axhline(float(lam_e[burn_in:].mean()), color="r", ls="--",
               label="posterior mean")
    if env_var > 0:
        ax.axhline(1 / env_var, color="k", ls=":", label="true")
    ax.set_yscale("log")


def _r2_panel(ax, r2_tr, r2_te, h2_tr, h2_te, ridge_data=None,
              full_r2_yrange=False):
    """Shared R² panel: nn train/test curves, h² lines, optional gray
    ridge-baseline lines."""
    ax.plot(r2_tr, label="nn train")
    if r2_te is not None:
        ax.plot(r2_te, label="nn test")
    ax.axhline(h2_tr, ls="--", color="#35063e", label="h2 train")
    ax.axhline(h2_te, ls="-.", color="#35063e", label="h2 test")
    if ridge_data is not None:
        rr_tr, rr_te = ridge_r2(*ridge_data)
        ax.axhline(rr_tr, color="gray", ls="--", label="ridge train")
        ax.axhline(rr_te, color="gray", ls=":", label="ridge test")
    if not full_r2_yrange:
        ax.set_ylim(0.0, 1.0)
    ax.set_ylabel(r"$R^2$")


def plot_perf_r2(rundir, sim_outdir, burn_in=0, ridge_data=None,
                 full_r2_yrange=False, save_to=None):
    """3-panel run overview (vis.py:692-775): error-precision trace with
    posterior mean and 1/env_variance truth line; R² train/test with h²
    (and optional ridge-baseline) reference lines; LPD trace.

    ridge_data: optional (x_train, y_train, x_test, y_test) for the gray
    ridge baseline lines (the reference loads the bed fileset for this).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    trace = load_trace(rundir)
    lam_e = trace_error_precision(trace)
    st, r2_tr, r2_te, h2_tr, h2_te = _r2_curves(rundir, sim_outdir)
    env_var = load_phen_stats(sim_outdir, "train")["env_variance"]

    fig, axes = plt.subplots(3, 1, sharex=True, figsize=(7, 7))
    _lam_e_panel(axes[0], lam_e, burn_in, env_var)
    axes[0].set_ylabel(r"$\lambda_e$")
    axes[0].legend()

    _r2_panel(axes[1], r2_tr, r2_te, h2_tr, h2_te, ridge_data,
              full_r2_yrange)
    axes[1].legend(loc="center left", bbox_to_anchor=(1, 0.5))

    axes[2].plot(np.asarray(st["lpd"]))
    axes[2].set_ylabel(r"$\log P(\Theta, \Lambda | D)$")
    axes[2].set_xlabel("iteration")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120, bbox_inches="tight")
    return fig


def plot_r2_lpd(rundir, sim_outdir, ridge_data=None, full_r2_yrange=False,
                yscale=None, max_iter=None, save_to=None):
    """2-panel R² + LPD (vis.py:611-689)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    st, r2_tr, r2_te, h2_tr, h2_te = _r2_curves(rundir, sim_outdir)
    fig, axes = plt.subplots(2, 1, sharex=True, figsize=(7, 5))
    _r2_panel(axes[0], r2_tr, r2_te, h2_tr, h2_te, ridge_data,
              full_r2_yrange)
    axes[0].legend(loc="center left", bbox_to_anchor=(1, 0.5))
    axes[1].plot(np.asarray(st["lpd"]))
    axes[1].set_ylabel(r"$\log P(\Theta, \Lambda | D)$")
    axes[1].set_xlabel("iteration")
    for ax in axes:
        if yscale:
            ax.set_yscale(yscale)
        if max_iter:
            ax.set_xlim(0, max_iter)
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120, bbox_inches="tight")
    return fig


def plot_perf(rundir, sim_outdir, burn_in=0, ridge_data=None, save_to=None):
    """Error-precision + log-scale MSE panels (vis.py:777-828)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    trace = load_trace(rundir)
    lam_e = trace_error_precision(trace)
    st = load_training_stats(rundir)
    env_var = load_phen_stats(sim_outdir, "train")["env_variance"]

    fig, axes = plt.subplots(1, 2, sharex=True, figsize=(10, 3))
    axes[0].set_title("ERROR PRECISION")
    _lam_e_panel(axes[0], lam_e, burn_in, env_var)
    axes[0].legend()

    axes[1].set_title("MSE")
    axes[1].plot(st["mse_train"], label="nn train")
    if st.get("mse_test"):
        axes[1].plot(st["mse_test"], label="nn test")
    if ridge_data is not None:
        rm_tr, rm_te = ridge_mse(*ridge_data)
        axes[1].axhline(rm_tr, color="gray", ls="--", label="ridge train")
        axes[1].axhline(rm_te, color="gray", ls=":", label="ridge test")
    axes[1].legend()
    axes[1].set_yscale("log")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


def plot_perf_r2_genetic_value(rundir, sim_outdir, train_pred_csv,
                               test_pred_csv, burn_in=0, save_to=None):
    """3-panel λ_e / r²(ŷ,y) / r²(ŷ,g) vs true genetic values with the
    Daetwyler expected-r² line (vis.py:504-608). Predictions come from the
    predict CLI's CSVs (one row per posterior sample)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g_tr, g_te = load_genetic_values(sim_outdir)
    pred_tr = load_predictions_csv(train_pred_csv)
    pred_te = load_predictions_csv(test_pred_csv)
    trace = load_trace(rundir)
    lam_e = trace_error_precision(trace)
    _, r2_tr, r2_te, h2_tr, h2_te = _r2_curves(rundir, sim_outdir)
    env_var = load_phen_stats(sim_outdir, "train")["env_variance"]
    true_params = load_true_params(sim_outdir)
    num_params = sum(
        len(v) for b in true_params
        for part in ("weights", "biases") for v in b["params"][part]
    ) if isinstance(true_params, list) else None

    r2g_tr = [r2_score(v, g_tr) for v in pred_tr]
    r2g_te = [r2_score(v, g_te) for v in pred_te]

    fig, axes = plt.subplots(3, 1, sharex=True, figsize=(6, 6))
    _lam_e_panel(axes[0], lam_e, burn_in, env_var)
    axes[0].set_ylabel(r"$\lambda_e$")

    _r2_panel(axes[1], r2_tr, r2_te, h2_tr, h2_te)
    axes[1].set_ylabel(r"$r^2_{\hat{y}y}$")

    if num_params:
        axes[2].axhline(
            expected_r2(num_params, len(g_tr), h2_te), ls=":",
            color="red", label=r"expected $r^2_{\hat{y}g}$",
        )
    axes[2].plot(r2g_tr)
    axes[2].plot(r2g_te)
    axes[2].set_ylim(0.0, 1.0)
    axes[2].set_ylabel(r"$r^{2}_{\hat{y}g}$")
    fig.legend(bbox_to_anchor=(1.04, 0.5), loc="center left")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120, bbox_inches="tight")
    return fig


def plot_branch_state(trace, true_params, state_ix, branch_ix=0,
                      save_to=None):
    """Sorted param-vs-truth scatter grid of ONE saved state: rows W, λ_W,
    b, λ_b x columns per layer (the reference's plot_single_branch_state,
    vis.py:441-493; sorting compares distributions, not positions, since
    hidden units are exchangeable)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tb = true_params[branch_ix]
    L = len(tb["params"]["weights"])
    fig, axes = plt.subplots(4, L, figsize=(3.2 * L, 10), squeeze=False)
    for lab, row in zip((r"$W | D$", r"$\lambda_W | D$", r"$b | D$",
                         r"$\lambda_b | D$"), range(4)):
        axes[row, 0].set_ylabel(lab)
    for lix in range(L):
        pairs = [
            (np.sort(trace_layer_weights(trace, branch_ix, lix)[state_ix]),
             np.sort(np.asarray(tb["params"]["weights"][lix])), 0, "$W$"),
            (np.sort(
                trace_layer_weight_precisions(trace, branch_ix, lix)[state_ix]
            ),
             np.sort(np.asarray(tb["precisions"]["weight_precisions"][lix])),
             1, r"$\lambda_W$"),
        ]
        if lix < L - 1:
            pairs += [
                (np.sort(trace_layer_biases(trace, branch_ix, lix)[state_ix]),
                 np.sort(np.asarray(tb["params"]["biases"][lix])), 2, "$b$"),
                (trace_layer_bias_precisions(trace, branch_ix, lix)[state_ix],
                 np.asarray(tb["precisions"]["bias_precisions"][lix]),
                 3, r"$\lambda_b$"),
            ]
        for est, tru, row, xlab in pairs:
            n = min(len(est), len(tru))
            axes[row, lix].plot(tru[:n], est[:n], "k.")
            if row < 3:
                axes[row, lix].plot(tru[:n], tru[:n], "k:")
            axes[row, lix].set_xlabel(xlab)
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


def plot_branch_trace(trace, branch_ix=0, save_to=None):
    """Per-parameter trace-line grid: rows b, λ_b, W, λ_W x columns per
    layer (the reference's plot_single_branch_trace, vis.py:830-864)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    L = len(trace[0][branch_ix]["params"]["weights"])
    fig, axes = plt.subplots(4, L, sharex=True, figsize=(3.2 * L, 10),
                             squeeze=False)
    for lix in range(L - 1):
        axes[0, lix].set_title(f"LAYER {lix + 1}")
        axes[0, lix].plot(trace_layer_biases(trace, branch_ix, lix), lw=0.8)
        axes[1, lix].plot(
            trace_layer_bias_precisions(trace, branch_ix, lix), lw=0.8
        )
    axes[0, L - 1].set_axis_off()
    axes[1, L - 1].set_axis_off()
    for lix in range(L):
        axes[2, lix].plot(trace_layer_weights(trace, branch_ix, lix), lw=0.8)
        axes[3, lix].plot(
            trace_layer_weight_precisions(trace, branch_ix, lix), lw=0.8
        )
    axes[0, 0].set_ylabel(r"$b$")
    axes[1, 0].set_ylabel(r"$\sigma^{-2}_{b}$")
    axes[2, 0].set_ylabel(r"$W$")
    axes[3, 0].set_ylabel(r"$\sigma^{-2}_{w}$")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


def load_lm_true_effects(sim_outdir) -> np.ndarray:
    """Flattened true linear-model effects (vis.py:924-944)."""
    with open(Path(sim_outdir) / "model.params") as f:
        mp = json.load(f)
    return np.concatenate([np.asarray(e, np.float32) for e in mp["effects"]])


def plot_est_effect_sizes(rundir, sim_outdir, burn_in=0, save_to=None):
    """Posterior-mean input gradients vs true linear effects with a
    least-squares fit line (vis.py:947-970). Reads the
    effect_sizes/<model_ix>_<branch_ix> CSVs written by --effect-sizes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    true_effects = load_lm_true_effects(sim_outdir)
    esdir = Path(rundir) / "effect_sizes"
    by_model = {}
    for p in esdir.iterdir():
        mix, g = (int(v) for v in p.stem.split("_"))
        if mix >= burn_in:
            by_model.setdefault(mix, {})[g] = np.loadtxt(
                p, delimiter=",", ndmin=2
            ).mean(axis=0)
    if not by_model:
        raise ValueError(f"no post-burn-in effect size files in {esdir}")
    means = [
        np.concatenate([parts[g] for g in sorted(parts)])
        for _, parts in sorted(by_model.items())
    ]
    est = np.mean(means, axis=0)

    slope, icpt = np.polyfit(true_effects, est, 1)
    xs = np.linspace(true_effects.min(), true_effects.max(), 10)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(xs, slope * xs + icpt, ":")
    ax.plot(true_effects, est, ".")
    ax.set_xlabel(r"$\beta_i$")
    ax.set_ylabel(r"$\frac{\partial \hat{y}}{\partial x_i}$")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=120)
    return fig


# --------------------------------------------------------- MCMC diagnostics


def autocorr(x: np.ndarray, max_lag: int = None) -> np.ndarray:
    """Normalized autocorrelation of a 1-D chain via FFT."""
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    if max_lag is None:
        max_lag = n - 1
    x = x - x.mean()
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, nfft)
    acov = np.fft.irfft(f * np.conj(f))[: max_lag + 1]
    if acov[0] == 0:
        return np.zeros(max_lag + 1)
    return (acov / acov[0]).real


def ess(x: np.ndarray) -> float:
    """Effective sample size with Geyer's initial positive sequence
    truncation (sum consecutive autocorrelation pairs until negative)."""
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    if n < 4 or x.std() == 0:
        return float(n)
    rho = autocorr(x)
    s = 0.0
    for t in range(1, n // 2):
        pair = rho[2 * t - 1] + (rho[2 * t] if 2 * t < len(rho) else 0.0)
        if pair < 0:
            break
        s += pair
    return float(n / (1.0 + 2.0 * s))


def ess_per_param(trace_matrix: np.ndarray) -> np.ndarray:
    """ESS for each column of an [iterations, params] matrix."""
    return np.array([ess(trace_matrix[:, j]) for j in range(trace_matrix.shape[1])])


def split_rhat(chains: np.ndarray) -> float:
    """Split-chain Gelman-Rubin potential scale reduction factor.

    chains: [n_chains, n_samples]. Each chain is split in half (Vehtari et
    al. 2021 convention), then R-hat = sqrt(((n-1)/n * W + B/n) / W).
    """
    chains = np.asarray(chains, np.float64)
    c, n = chains.shape
    half = n // 2
    if half < 2:
        return float("nan")
    splits = np.concatenate([chains[:, :half], chains[:, half : 2 * half]], axis=0)
    m, n2 = splits.shape
    means = splits.mean(axis=1)
    w = splits.var(axis=1, ddof=1).mean()
    b = n2 * means.var(ddof=1)
    if w == 0:
        return 1.0
    return float(np.sqrt(((n2 - 1) / n2 * w + b / n2) / w))


def multichain_diagnostics(chains: np.ndarray) -> dict:
    """Summary for one scalar quantity tracked across chains:
    [n_chains, n_samples] -> {rhat, ess_per_chain, ess_total}."""
    chains = np.asarray(chains, np.float64)
    ess_c = [ess(c) for c in chains]
    return {
        "rhat": split_rhat(chains),
        "ess_per_chain": ess_c,
        "ess_total": float(np.sum(ess_c)),
    }
