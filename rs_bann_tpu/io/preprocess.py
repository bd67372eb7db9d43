"""Dataset preprocessing: train/test splitting and missing-genotype filling.

Plink-free equivalents of the reference's preprocessing shell scripts
(/root/reference/scripts/split_train_test.sh — random .fam shuffle + plink
--keep; /root/reference/scripts/fill_missing_a2.sh — plink
--fill-missing-a2), operating directly on the bed fileset.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from .bed import BedVM, pack_genotypes
from .dims import BedDims


def _read_lines(path):
    with open(path) as f:
        return [l for l in f if l.strip()]


def _subset_fileset(stem: Path, out_stem: Path, keep: np.ndarray, bed: BedVM):
    """Write out_stem.{bed,fam[,bim],dims} with individuals `keep`."""
    full = bed.data_f32()  # [n, m]
    sub = full[keep]  # [k, m]
    BedVM(pack_genotypes(sub.T), sub.shape[0], bed.num_markers).to_file(out_stem)
    fam = stem.with_suffix(".fam")
    if fam.exists():
        lines = _read_lines(fam)
        with open(out_stem.with_suffix(".fam"), "w") as f:
            f.writelines(lines[i] for i in keep)
    bim = stem.with_suffix(".bim")
    if bim.exists():
        out_stem.with_suffix(".bim").write_text(bim.read_text())


def split_train_test(
    stem, test_n: int, seed: Optional[int] = None, out_prefix: Optional[str] = None
):
    """Random split into <stem>_train / <stem>_test filesets.

    Matches split_train_test.sh semantics: shuffle individuals, first
    n-test_n to train, last test_n to test, each kept in original .fam order.
    Returns (train_stem, test_stem).
    """
    stem = Path(stem)
    bed = BedVM.from_file(stem)
    n = bed.num_individuals
    assert 0 < test_n < n, f"test_n {test_n} must be in (0, {n})"
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    train_ix = np.sort(perm[: n - test_n])
    test_ix = np.sort(perm[n - test_n :])
    prefix = Path(out_prefix) if out_prefix else stem
    train_stem = prefix.parent / (prefix.name + "_train")
    test_stem = prefix.parent / (prefix.name + "_test")
    _subset_fileset(stem, train_stem, train_ix, bed)
    _subset_fileset(stem, test_stem, test_ix, bed)
    return train_stem, test_stem


def fill_missing_a2(stem, out_stem=None):
    """Rewrite missing genotypes (2-bit code 01) as homozygous A2 (code 11),
    like plink --fill-missing-a2. Decoded values are unchanged under this
    package's decode convention (both map to 0); the output file is valid
    for tools that treat 01 as missing.
    """
    stem = Path(stem)
    dims = BedDims.from_stem(stem)
    raw = stem.with_suffix(".bed").read_bytes()
    data = np.frombuffer(raw[3:], np.uint8).copy()
    # pairs with code 01 -> 11: low bit set, high bit clear per 2-bit field
    for shift in (0, 2, 4, 6):
        field = (data >> shift) & 0b11
        miss = field == 0b01
        data[miss] |= np.uint8(0b11 << shift)
    out = Path(out_stem) if out_stem else stem.parent / (stem.name + "_filled_a2")
    bed = BedVM(data, dims.num_individuals, dims.num_markers)
    bed.to_file(out)
    for ext in (".fam", ".bim"):
        src = stem.with_suffix(ext)
        if src.exists():
            out.with_suffix(ext).write_text(src.read_text())
    return out
