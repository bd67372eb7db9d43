"""UKB-scale random-phenotype simulation with LD-score-weighted effects.

Rebuild of the reference's R/BEDMatrix workflow
(/root/reference/scripts/sim_random_phen.r): per replicate, sample one SNP
per LD block from a marker table, draw effects β_j ~ N(0, √(h²/M) ·
ldscore_j^0.5 · (2·MAF_j·(1−MAF_j))^−0.5) rescaled to variance h²/M, form
g = X_std β, add N(0, 1−var(g)) noise, and write the phenotype, true genetic
values, true betas and realized h² per replicate.

Marker table: whitespace-separated with a header containing at least columns
SNP, MAF, ldscore (the reference's bm_grouped_bim_file_maf_score). Blocks are
consecutive runs of `--block-size` rows (the reference uses spacing 59).

Usage:
  python scripts/sim_random_phen.py BED_STEM [BED_STEM2 ...] \
      --marker-table TABLE --out OUTDIR \
      [--h2 0.6] [--num-blocks 10000] [--block-size 59] [--reps 20] [--seed 1]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bed_stems", nargs="+", help="plink filesets; individuals concatenated")
    ap.add_argument("--marker-table", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--h2", type=float, default=0.6)
    ap.add_argument("--num-blocks", type=int, default=10000)
    ap.add_argument("--block-size", type=int, default=59)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    from rs_bann_tpu.io.bed import BedVM
    from rs_bann_tpu.io.plink_text import read_bim, read_fam

    rng = np.random.default_rng(args.seed)

    # marker table: SNP MAF ldscore (+ anything else)
    with open(args.marker_table) as f:
        header = f.readline().split()
        cols = {name: i for i, name in enumerate(header)}
        rows = [l.split() for l in f if l.strip()]
    snp_col, maf_col, ld_col = cols["SNP"], cols["MAF"], cols["ldscore"]
    snps = [r[snp_col] for r in rows]
    maf = np.array([float(r[maf_col]) for r in rows])
    ldsc = np.array([float(r[ld_col]) for r in rows])

    # shards hold the SAME markers for disjoint individuals (the reference
    # rbinds BEDMatrix shards); rows stack across shards per chosen SNP
    beds = [BedVM.from_file(s) for s in args.bed_stems]
    id2pos = [
        {e.id: e.ix for e in read_bim(Path(stem).with_suffix(".bim"))}
        for stem in args.bed_stems
    ]
    fam_ids = []
    for stem in args.bed_stems:
        fam_path = Path(stem).with_suffix(".fam")
        if fam_path.exists():
            fam_ids.extend((e.fid, e.iid) for e in read_fam(fam_path))
    n_total = sum(b.num_individuals for b in beds)
    if not fam_ids:
        fam_ids = [(str(i + 1), str(i + 1)) for i in range(n_total)]

    nblocks = min(args.num_blocks, len(snps) // args.block_size)
    outroot = Path(args.out)
    for rep in range(1, args.reps + 1):
        # one random SNP per consecutive block (sim_random_phen.r spacing)
        chosen = []
        for k in range(nblocks):
            lo, hi = k * args.block_size, (k + 1) * args.block_size
            chosen.append(int(rng.integers(lo, hi)))
        present = [j for j in chosen if all(snps[j] in m_ for m_ in id2pos)]
        ids = [snps[j] for j in present]
        kept = present
        M = len(ids)
        if M == 0:
            raise SystemExit("no marker-table SNPs found in the bed filesets")

        X = np.vstack(
            [
                b.get_cols([id2pos[s][sid] for sid in ids]).T  # [n_s, M]
                for s, b in enumerate(beds)
            ]
        ).astype(np.float32)

        mu = X.mean(axis=0)
        sd = X.std(axis=0)
        sd[sd == 0] = 1.0
        Xs = (X - mu) / sd

        p_var = 2.0 * maf[kept] * (1.0 - maf[kept])
        b_adj = (ldsc[kept] ** 0.5) * (np.maximum(p_var, 1e-12) ** -0.5)
        var_b = args.h2 / M
        beta = rng.normal(0.0, np.sqrt(var_b) * b_adj)
        beta = (beta - beta.mean()) / max(beta.std(), 1e-12) * np.sqrt(var_b)
        g = Xs @ beta
        e = rng.normal(0.0, np.sqrt(max(1.0 - g.var(), 1e-6)), n_total)
        y = g + e

        d = outroot / f"sim_{rep}"
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "sim.phen.txt", "w") as f:
            for (fid, iid), v in zip(fam_ids, y):
                f.write(f"{fid} {iid} {v}\n")
        with open(d / "sim.trueG", "w") as f:
            for (fid, iid), v in zip(fam_ids, g):
                f.write(f"{fid} {iid} {v}\n")
        with open(d / "sim.trueB", "w") as f:
            for sid, b_ in zip(ids, beta):
                f.write(f"{sid} {b_}\n")
        (d / "sim.trueh2").write_text(f"{g.var() / y.var()}\n")
        # binary .phen for the training pipeline
        from rs_bann_tpu.io.phen import Phenotypes

        Phenotypes(y).to_file(d / "sim.phen")
        print(f"rep {rep}: M={M} realized h2={g.var() / y.var():.3f}", flush=True)


if __name__ == "__main__":
    main()
