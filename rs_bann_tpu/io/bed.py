"""PLINK .bed genotype I/O: variant-major, 2-bit packed, held compressed.

Rebuild of /root/reference/src/io/bed.rs: the genotype matrix stays 2-bit
packed in memory (``BedVM``); decode is a vectorized 256-entry lookup-table
gather (the table is *generated* here, not transcribed —
io/bed_lookup_tables.rs:4 stores it as a 1024-float literal).

PLINK 1.9 bed encoding, variant-major: 3 magic bytes 0x6c 0x1b 0x01, then
ceil(n/4) bytes per marker column; each byte holds 4 genotypes, lowest bit
pair first. 2-bit codes: 00 -> 2 (hom A1), 10 -> 1 (het), 11 -> 0 (hom A2),
01 (missing) -> decoded as 0, matching the reference's no-NA-handling
contract (io/bed.rs:121: impute beforehand).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

BED_SIGNATURE = bytes([0x6C, 0x1B, 0x01])
# genotype value -> 2-bit code (io/bed.rs:16: BED_VALUE_MAPPING)
_VALUE_TO_CODE = np.array([0b11, 0b10, 0b00], np.uint8)
# 2-bit code -> genotype value
_CODE_TO_VALUE = np.array([2.0, 0.0, 1.0, 0.0], np.float32)


def _make_lookup() -> np.ndarray:
    """[256, 4] byte -> 4 genotype f32s (generates BED_LOOKUP_GENOTYPE)."""
    b = np.arange(256, dtype=np.uint16)
    out = np.empty((256, 4), np.float32)
    for i in range(4):
        out[:, i] = _CODE_TO_VALUE[(b >> (2 * i)) & 0b11]
    return out


BED_LOOKUP = _make_lookup()


def decode_bed_bytes(data: np.ndarray, num_individuals: int) -> np.ndarray:
    """[..., bytes_per_col] uint8 -> [..., num_individuals] f32."""
    vals = BED_LOOKUP[data]  # [..., bytes, 4]
    vals = vals.reshape(*data.shape[:-1], data.shape[-1] * 4)
    return vals[..., :num_individuals]


def pack_genotypes(vals: np.ndarray) -> np.ndarray:
    """[..., n] genotypes {0,1,2} -> [..., ceil(n/4)] packed uint8."""
    n = vals.shape[-1]
    nbytes = (n + 3) // 4
    padded = np.zeros((*vals.shape[:-1], nbytes * 4), np.uint8)
    padded[..., :n] = _VALUE_TO_CODE[vals.astype(np.int64)]
    padded = padded.reshape(*vals.shape[:-1], nbytes, 4)
    out = np.zeros((*vals.shape[:-1], nbytes), np.uint8)
    for i in range(4):
        out |= padded[..., i] << (2 * i)
    return out


class BedVM:
    """Variant-major bed file in memory, compressed (io/bed.rs:123-375)."""

    def __init__(self, data, num_individuals, num_markers):
        self.num_individuals = int(num_individuals)
        self.num_markers = int(num_markers)
        self.num_bytes_per_col = (self.num_individuals + 3) // 4
        self.data = np.asarray(data, np.uint8).reshape(
            self.num_markers, self.num_bytes_per_col
        )
        # threaded count-based stats via the native codec when available
        # (population std, io/bed.rs:231-242)
        from . import native

        self.col_means, self.col_stds = native.col_stats(
            self.data, self.num_individuals
        )
        for ix in np.nonzero(self.col_stds == 0)[0]:
            import logging

            logging.getLogger("rs_bann_tpu").warning(
                "No variation in marker %d; standardized access divides by zero",
                ix,
            )

    # -------------------------------------------------------------- build
    @staticmethod
    def random(
        num_individuals: int,
        num_markers: int,
        mafs: Optional[Sequence[float]] = None,
        seed: Optional[int] = None,
    ) -> "BedVM":
        """Binomial(2, maf) genotype simulator (io/bed.rs:136-188); columns
        with zero variance are redrawn."""
        rng = np.random.default_rng(seed)
        # vectorized draw (a per-marker python loop costs minutes at 10k
        # markers x 100k+ individuals); zero-variance columns are redrawn
        maf = (
            np.asarray(mafs, np.float64)
            if mafs is not None
            else rng.uniform(0.01, 0.5, num_markers)
        )
        cols = rng.binomial(
            2, maf[:, None], size=(num_markers, num_individuals)
        ).astype(np.int8)
        while True:
            flat = np.all(cols == cols[:, :1], axis=1)
            if not flat.any():
                break
            if mafs is None:
                maf[flat] = rng.uniform(0.01, 0.5, int(flat.sum()))
            cols[flat] = rng.binomial(
                2, maf[flat][:, None], size=(int(flat.sum()), num_individuals)
            ).astype(np.int8)
        return BedVM(pack_genotypes(cols), num_individuals, num_markers)

    @staticmethod
    def from_file(stem) -> "BedVM":
        """Read .bed; dims from .dims, else .fam/.bim line counts
        (io/bed.rs:193-245)."""
        from .dims import BedDims

        stem = Path(stem)
        dims = BedDims.from_stem(stem)
        bed_path = stem.with_suffix(".bed")
        raw = bed_path.read_bytes()
        sig = raw[:3]
        if sig[0] != BED_SIGNATURE[0]:
            raise ValueError("False first byte in .bed; expected 0x6c")
        if sig[1] != BED_SIGNATURE[1]:
            raise ValueError("False second byte in .bed; expected 0x1b")
        if sig[2] == 0x00:
            raise ValueError(
                "SampleMajor .bed formats are not supported; convert to "
                "VariantMajor format"
            )
        if sig[2] != 0x01:
            raise ValueError("False third byte in .bed; expected 0x00 or 0x01")
        data = np.frombuffer(raw[3:], np.uint8)
        nbpc = (dims.num_individuals + 3) // 4
        data = data[: dims.num_markers * nbpc]
        return BedVM(data, dims.num_individuals, dims.num_markers)

    def to_file(self, stem):
        """Write .bed + .dims (io/bed.rs:248-264)."""
        stem = Path(stem)
        os.makedirs(stem.parent, exist_ok=True)
        with open(stem.with_suffix(".bed"), "wb") as f:
            f.write(BED_SIGNATURE)
            f.write(self.data.tobytes())
        with open(stem.with_suffix(".dims"), "w") as f:
            f.write(f"{self.num_individuals}\t{self.num_markers}")

    # ------------------------------------------------------------- access
    def get_cols(self, col_ixs) -> np.ndarray:
        """[len(ixs), n] raw genotypes."""
        from . import native

        return native.decode(self.data[np.asarray(col_ixs)], self.num_individuals)

    def get_submatrix_standardized(self, col_ixs) -> np.ndarray:
        """[n, len(ixs)] standardized — the reference's hot data path
        (io/bed.rs:325-355). Zero-variance markers map to 0 (the reference
        divides by zero; io/bed.rs:121 requires imputation beforehand)."""
        from . import native

        return native.submatrix_std(
            self.data, self.num_individuals, np.asarray(col_ixs),
            self.col_means, self.col_stds,
        )

    def data_f32(self) -> np.ndarray:
        """Full [n, m] raw matrix (io/bed.rs:357-367 is column-major flat)."""
        from . import native

        return native.decode(self.data, self.num_individuals).T

    # packed device form for the Pallas decode path
    def packed_columns(self) -> np.ndarray:
        """[m, bytes_per_col] uint8 view."""
        return self.data
