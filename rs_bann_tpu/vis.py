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
    """[samples, n] predictions from every saved model sample."""
    from .models.net import Net

    files = sorted(
        (p for p in Path(models_dir).iterdir() if p.suffix == ".npz"),
        key=lambda p: int(p.stem),
    )
    return np.stack([np.asarray(Net.load(str(p)).predict(X)) for p in files])


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
    wray: the quadratic-root form (returned as the two roots, as upstream).
    """
    if formula in ("daetwyler", "deatwyler"):
        k = n * h2 / m
        return k / (k + 1)
    if formula in ("wray", "wrey"):
        k = m / (n + h2)
        x1 = (1 + k) - (np.sqrt((1 + k) ** 2 + 4 * k * h2) / (-2 * k))
        x2 = (1 + k) + (np.sqrt((1 + k) ** 2 + 4 * k * h2) / (-2 * k))
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
    pip = np.asarray(rec["pip"])
    fig, ax = plt.subplots(figsize=(max(6, 0.12 * len(pip)), 3.5))
    ax.bar(np.arange(len(pip)), pip, width=0.9)
    ax.axhline(0.5, ls="--", lw=0.8, color="gray")
    ax.axhline(rec["pi"], ls=":", lw=0.8, color="tab:red",
               label=f"pi = {rec['pi']:.2f}")
    ax.set_xlabel("branch (SNP group)")
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
