"""Round-3 genome-scale experiment battery — ONE process, one TPU claim.

The tunneled TPU charges minutes-long claim handoffs per process, so every
experiment runs inside this single process via genome_scale.main(argv).
Results append to /tmp/r3_results.jsonl (genome_scale --json-out).

Batteries (VERDICT r2 items):
  re-base   — the production recipes re-measured with live-accept (the
              exact parallel/hybrid kernel changes the sampler; all
              docs/GENOME_SCALE.md numbers predate it)
  clustered — #5: close the clustered n=8k gap (0.489 -> >=0.52/0.594):
              finer groups (m=50), multi-chain consensus, ss_rows
  ssrows    — #6: nonlinear (tanh depth-1) + ss_rows vs the identity+ssm
              and plain-ARD baselines at equal budget
  ukb       — #3: per-marker spike-and-slab at n=460,800 (cache hit)

Usage: python scripts/r3_experiments.py [battery ...]   (default: all
except ukb — run ukb explicitly, it is hours long)
"""

import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import genome_scale

OUT = "/tmp/r3_results.jsonl"


def run(tag, argv):
    print(f"##### {tag}: genome_scale {' '.join(argv)}", flush=True)
    t0 = time.time()
    try:
        genome_scale.main(argv + ["--json-out", OUT])
    except Exception as e:  # keep the battery going
        print(f"##### {tag} FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"##### {tag} done in {time.time() - t0:.0f}s", flush=True)
    gc.collect()


BASE = ["--chain-length", "400", "--step-size-mode", "dual_averaging",
        "--update-mode", "hybrid", "--mass-adaptation"]
DIFF = []  # diffuse truth (default)
CLUS = ["--causal-branches", "20"]


def battery_rebase():
    # the two headline n=8k configs, re-measured under live-accept
    run("rebase-diffuse-ssm", BASE + DIFF + [
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.1",
        "--ssm-warmup", "100", "--burn-in", "200"])
    run("rebase-clustered-ss", BASE + CLUS + [
        "--spike-slab", "--ss-warmup", "0"])
    # and the plain hybrid (no selection) for reference
    run("rebase-clustered-plain", BASE + CLUS)


def battery_clustered():
    # finer groups: m=50 (G=200), same budget
    run("clus-finer-groups", [
        "--branches", "200", "--chain-length", "400",
        "--step-size-mode", "dual_averaging", "--update-mode", "hybrid",
        "--block-size", "20", "--mass-adaptation",
        "--spike-slab", "--ss-warmup", "0"] + CLUS)
    # multi-chain consensus (4 chains, posterior pooled over chains)
    run("clus-4chain", BASE + CLUS + [
        "--num-chains", "4", "--spike-slab", "--ss-warmup", "0"])
    # ss_rows on the clustered truth (identity depth-0 still — row mixture
    # as an alternative to the collapsed ssm move)
    run("clus-ssrows", BASE + CLUS + [
        "--ss-rows", "--ssr-fixed-pi", "--ssr-pi", "0.1",
        "--ssr-warmup", "100", "--burn-in", "200"])
    # per-marker ssm on clustered with learned pi (round-2 best was 0.478)
    run("clus-ssm", BASE + CLUS + [
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.1",
        "--ssm-warmup", "100", "--burn-in", "200"])


def battery_ssrows():
    # the nonlinear family finally gets within-branch selection: measure
    # tanh depth-1 +/- ss_rows vs the identity baselines, diffuse truth
    NL = ["--activation", "tanh", "--depth", "1", "--hidden-width", "8"]
    run("ssrows-tanh-d1", BASE + DIFF + NL + [
        "--ss-rows", "--ssr-fixed-pi", "--ssr-pi", "0.1",
        "--ssr-warmup", "100", "--burn-in", "200"])
    run("plain-tanh-d1", BASE + DIFF + NL)
    run("ssrows-identity-d0", BASE + DIFF + [
        "--ss-rows", "--ssr-fixed-pi", "--ssr-pi", "0.1",
        "--ssr-warmup", "100", "--burn-in", "200"])


def battery_ukb():
    # VERDICT #3: per-marker SS at the full UKB regime. The workload matches
    # BASELINE_SELF ukb_full_run exactly (n=460,800/4,000, clustered 20/100,
    # h2=0.6, seed_truth=1) so the r2 round-2 cache (/tmp/gscache_*, 1.37 GB
    # packed) hits and the 0.513/0.608 branch-SS number is the comparison.
    run("ukb-ssm", [
        "--n-train", "460800", "--n-test", "4000", "--packed",
        "--causal-branches", "20", "--chain-length", "300",
        "--burn-in", "150", "--step-size-mode", "dual_averaging",
        "--update-mode", "hybrid", "--mass-adaptation",
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.05",
        "--ssm-warmup", "75"])


BATTERIES = {
    "rebase": battery_rebase,
    "clustered": battery_clustered,
    "ssrows": battery_ssrows,
    "ukb": battery_ukb,
}


if __name__ == "__main__":
    picks = sys.argv[1:] or ["rebase", "clustered", "ssrows"]
    for p in picks:
        BATTERIES[p]()
    print("ALL DONE", flush=True)
