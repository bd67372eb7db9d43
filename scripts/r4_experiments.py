"""Round-4 genome-scale experiment battery — ONE process, one TPU claim.

VERDICT r3 targets:
  ukbcombo — #3: hit 0.55/0.608 absolute at n=460,800 by combining the
             individually-measured levers: per-marker spike-and-slab x
             finer groups (G=200, m=50) x longer chains (600; sweeps are
             cheap post-fused-kernel and the ssm scan is now blocked).
             Also re-runs the G=100 ssm config at chain 600 — its
             per-iteration wall clock against r3's 2,392 s / 300 it
             measures the blocked-scan speedup (#4) directly.
  consensus — multi-chain consensus on the best combo config.

Results append to /tmp/r4_results.jsonl.
Usage: python scripts/r4_experiments.py [battery ...]
"""

import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import genome_scale

OUT = "/tmp/r4_results.jsonl"


def run(tag, argv):
    print(f"##### {tag}: genome_scale {' '.join(argv)}", flush=True)
    t0 = time.time()
    try:
        genome_scale.main(argv + ["--json-out", OUT])
    except Exception as e:  # keep the battery going
        import traceback

        traceback.print_exc()
        print(f"##### {tag} FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"##### {tag} done in {time.time() - t0:.0f}s", flush=True)
    gc.collect()


UKB = ["--n-train", "460800", "--n-test", "4000", "--packed",
       "--step-size-mode", "dual_averaging", "--update-mode", "hybrid",
       "--mass-adaptation"]


def battery_ukbcombo():
    # finer groups (G=200, m=50, 40 causal branches — cache
    # /tmp/gscache_38d72bc0d89e) x per-marker SS x chain 600
    run("ukb-ssm-finer-600", UKB + [
        "--branches", "200", "--causal-branches", "40",
        "--chain-length", "600", "--burn-in", "300",
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.05",
        "--ssm-warmup", "150"])
    # G=100 ssm at chain 600 (longer-chain lever alone; r3 comparison run
    # for the blocked-scan wall clock — cache /tmp/gscache_55cfc3a908be)
    run("ukb-ssm-600", UKB + [
        "--causal-branches", "20",
        "--chain-length", "600", "--burn-in", "300",
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.05",
        "--ssm-warmup", "150"])


def battery_ukbcombo2():
    # follow-ups to ukb-ssm-finer-600 (r2 0.433 — finer x ssm over-pruned
    # at pi=0.05/warmup=150: only 180 of 500 causal markers at PIP>0.5):
    # r3's exact ssm settings on the finer geometry, and branch-SS x ssm
    # stacking (the two selection levels compose; ss_markers needs
    # identity/d0 and spike_slab owns the output layer).
    run("ukb-ssm-finer-r3cfg", UKB + [
        "--branches", "200", "--causal-branches", "40",
        "--chain-length", "600", "--burn-in", "150",
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.1",
        "--ssm-warmup", "75"])
    run("ukb-ssm-bss-finer", UKB + [
        "--branches", "200", "--causal-branches", "40",
        "--chain-length", "600", "--burn-in", "300",
        "--spike-slab", "--ss-warmup", "150",
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.1",
        "--ssm-warmup", "75"])
    # G=100: raise the inclusion prior (261/500 causal found at pi=0.05 —
    # selection, not sampling length, binds) with r3's warmup/burn
    run("ukb-ssm-pi01", UKB + [
        "--causal-branches", "20",
        "--chain-length", "600", "--burn-in", "150",
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.1",
        "--ssm-warmup", "75"])
    # learned pi (beta-bernoulli) instead of fixed
    run("ukb-ssm-learnpi", UKB + [
        "--causal-branches", "20",
        "--chain-length", "600", "--burn-in", "150",
        "--ss-markers", "--ssm-pi", "0.1", "--ssm-warmup", "75"])


def battery_consensus():
    # multi-chain consensus on the winning 0.556 config (ukb-ssm-pi01)
    run("ukb-ssm-pi01-4chain", UKB + [
        "--causal-branches", "20",
        "--chain-length", "600", "--burn-in", "150", "--num-chains", "4",
        "--ss-markers", "--ssm-fixed-pi", "--ssm-pi", "0.1",
        "--ssm-warmup", "75"])


def battery_epistasis():
    # VERDICT r3 #6: the first non-additive truth in the repo — does depth
    # ever win on the reference's own use case (nonlinear branch MLPs over
    # annotation groups)? Within-group pairwise-product truth, half or all
    # of genetic variance; identity/depth-0 vs tanh depth>=1 at equal
    # budget, with and without per-marker selection.
    E8 = ["--n-train", "8000", "--n-test", "1600", "--causal-branches", "20",
          "--chain-length", "400", "--step-size-mode", "dual_averaging",
          "--update-mode", "hybrid", "--mass-adaptation"]
    for epi in ("0.5", "1.0"):
        tagp = f"epi{epi}"
        run(f"{tagp}-identity-d0", E8 + ["--epistasis", epi])
        run(f"{tagp}-identity-d0-ssm", E8 + [
            "--epistasis", epi, "--ss-markers", "--ssm-fixed-pi",
            "--ssm-pi", "0.1", "--ssm-warmup", "100"])
        run(f"{tagp}-tanh-d1", E8 + [
            "--epistasis", epi, "--activation", "tanh", "--depth", "1",
            "--hidden-width", "16", "--summary-width", "8"])
        run(f"{tagp}-tanh-d1-wide", E8 + [
            "--epistasis", epi, "--activation", "tanh", "--depth", "1",
            "--hidden-width", "32", "--summary-width", "16"])
        run(f"{tagp}-silu-d1", E8 + [
            "--epistasis", epi, "--activation", "silu", "--depth", "1",
            "--hidden-width", "16", "--summary-width", "8"])
        run(f"{tagp}-tanh-d2", E8 + [
            "--epistasis", epi, "--activation", "tanh", "--depth", "2",
            "--hidden-width", "16", "--summary-width", "8"])


def battery_prodpath():
    # production-path alternatives at the n=100k genome shape: the 2-bit
    # packed decode is VPU-bound (~0.5 ms/block-step modeled); dense bf16
    # feature-major trades 8x HBM footprint (2.1 GB, fits) for no decode,
    # and the 4-chain parallel variant engages the chain-folded trajectory
    # kernel at genome scale.
    P100 = ["--n-train", "100000", "--n-test", "4000",
            "--causal-branches", "20", "--chain-length", "400",
            "--step-size-mode", "dual_averaging", "--mass-adaptation"]
    run("prod-packed-hybrid", P100 + [
        "--packed", "--update-mode", "hybrid"])
    run("prod-featmajor-hybrid", P100 + [
        "--feat-major", "--update-mode", "hybrid"])
    run("prod-featmajor-parallel-4chain", P100 + [
        "--feat-major", "--update-mode", "parallel", "--num-chains", "4"])


BATTERIES = {
    "ukbcombo": battery_ukbcombo,
    "ukbcombo2": battery_ukbcombo2,
    "consensus": battery_consensus,
    "epistasis": battery_epistasis,
    "prodpath": battery_prodpath,
}


if __name__ == "__main__":
    picks = sys.argv[1:] or ["ukbcombo"]
    for p in picks:
        BATTERIES[p]()
    print("ALL DONE", flush=True)
