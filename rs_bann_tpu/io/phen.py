"""Phenotype file I/O.

The reference stores phenotypes as bincode of ``struct Phenotypes { y: Vec<f32> }``
(/root/reference/src/data/phenotypes.rs:13-49): a little-endian u64 length
followed by little-endian f32 values. We read and write that exact byte format
for drop-in compatibility, plus the JSON export.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np


class Phenotypes:
    def __init__(self, y):
        self.y = np.asarray(y, np.float32).reshape(-1)

    @staticmethod
    def zeros(num_individuals: int) -> "Phenotypes":
        return Phenotypes(np.zeros(num_individuals, np.float32))

    @staticmethod
    def from_file(path) -> "Phenotypes":
        raw = Path(path).read_bytes()
        (n,) = struct.unpack("<Q", raw[:8])
        y = np.frombuffer(raw[8 : 8 + 4 * n], "<f4")
        if y.shape[0] != n:
            raise ValueError(f"Truncated .phen file: expected {n} values")
        return Phenotypes(y)

    def to_file(self, path):
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", self.y.shape[0]))
            f.write(self.y.astype("<f4").tobytes())

    def to_json(self, path):
        with open(path, "w") as f:
            json.dump({"y": self.y.tolist()}, f)

    @staticmethod
    def from_json(path) -> "Phenotypes":
        with open(path) as f:
            return Phenotypes(json.load(f)["y"])
