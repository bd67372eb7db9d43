"""Parsers for PLINK text sidecar files and GFF3 annotation streams.

Rebuilds /root/reference/src/io/{chromosome,bim,fam,gff,indexed_read}.rs as
plain Python generators (these are host-side formats; the reference keeps them
host-side Rust too).
"""

from __future__ import annotations

import dataclasses
import gzip
from pathlib import Path
from typing import Iterator, Optional

# chromosome name -> sort order (1..22 < X < Y; io/chromosome.rs:7-66)
CHROMOSOMES = {str(i): i for i in range(1, 23)} | {"X": 23, "Y": 24}


def chromosome_order(name: str) -> int:
    if name not in CHROMOSOMES:
        raise ValueError(f"Unknown chromosome: {name}")
    return CHROMOSOMES[name]


@dataclasses.dataclass
class BimEntry:
    """One .bim row (io/bim.rs:4-30)."""

    ix: int
    chromosome: str
    id: str
    centimorgan: int
    position: int
    allele_1: str
    allele_2: str

    @staticmethod
    def from_line(line: str, ix: int) -> "BimEntry":
        f = line.split()
        chromosome_order(f[0])  # validate
        return BimEntry(ix, f[0], f[1], int(f[2]), int(f[3]), f[4], f[5])


@dataclasses.dataclass
class FamEntry:
    """One .fam row (io/fam.rs:51-86)."""

    ix: int
    fid: str
    iid: str
    father_iid: str
    mother_iid: str
    sex: str  # "0"=unknown "1"=male "2"=female
    phenotype_value: str

    @staticmethod
    def from_line(line: str, ix: int) -> "FamEntry":
        f = line.split()
        if f[4] not in ("0", "1", "2"):
            raise ValueError("Unknown sex code")
        return FamEntry(ix, f[0], f[1], f[2], f[3], f[4], f[5])


def read_bim(path) -> Iterator[BimEntry]:
    with open(path) as f:
        ix = 0
        for line in f:
            if line.strip():
                yield BimEntry.from_line(line, ix)
                ix += 1


def read_fam(path) -> Iterator[FamEntry]:
    with open(path) as f:
        ix = 0
        for line in f:
            if line.strip():
                yield FamEntry.from_line(line, ix)
                ix += 1


# ------------------------------------------------------------------- GFF3

# feature strings the reference recognizes (io/gff.rs:26-42); others skipped
FEATURES = {
    "gene": "gene",
    "exon": "exon",
    "intron": "intron",
    "pseudogene": "pseudogene",
    "transcipt": "transcript",
    "miRNA": "miRNA",
    "CDS": "CDS",
    "silencer": "silencer",
    "lnc_RNA": "lnc_RNA",
    "mRNA": "mRNA",
}


@dataclasses.dataclass
class GFFEntry:
    """One GFF3 row (io/gff.rs:45-56)."""

    chromosome: str
    source: str
    feature: str
    start: int
    end: int
    score: str
    strand: str
    frame: str
    attribute: str

    @staticmethod
    def from_line(line: str) -> Optional["GFFEntry"]:
        if line.startswith("#"):
            return None
        f = line.split()
        if len(f) < 9 or f[0] not in CHROMOSOMES or f[2] not in FEATURES:
            return None
        return GFFEntry(
            f[0], f[1], f[2], int(f[3]), int(f[4]), f[5], f[6], f[7], f[8]
        )


def read_gff(path) -> Iterator[GFFEntry]:
    """Streaming GFF3 reader; transparently handles .gz
    (io/gff.rs:84-147). Unparseable / comment lines are skipped, like the
    reference's recursive next_entry."""
    path = Path(path)
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rt") as f:
        for line in f:
            e = GFFEntry.from_line(line)
            if e is not None:
                yield e
