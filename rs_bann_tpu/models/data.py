"""Device-resident training data.

The reference re-decodes and re-uploads each branch's standardized genotype
submatrix from host RAM on every single branch update
(/root/reference/src/io/bed.rs:325-355, net.rs:265). On TPU we keep the data
HBM-resident across the whole run in one of two forms:

  * ``StackedData``: materialized standardized X as [G, n, m_pad] f32 —
    best for small/medium problems (the entire sweep reads it in place).
  * packed form (see ops/bed_codec.py / ops/pallas_bed.py): the 2-bit PLINK
    bed bytes stay compressed in HBM and are fused-decoded per branch —
    16x less HBM for genome-scale inputs.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from .arch import NetArch


class StackedData(NamedTuple):
    X: jnp.ndarray  # [G, n, m_pad] standardized; padded cols exactly 0
    y: jnp.ndarray  # [n]


def stack_standardized(
    arch: NetArch,
    columns: Sequence[np.ndarray],  # per-branch [n, m_g] raw (or standardized)
    y: np.ndarray,
    standardize: bool = True,
) -> StackedData:
    """Pad per-branch matrices into [G, n, m_pad]; optionally standardize
    columns to mean 0 / std 1 (population std, matching io/bed.rs:231-242)."""
    n = columns[0].shape[0]
    G = arch.num_branches
    X = np.zeros((G, n, arch.m_pad), np.float32)
    for g, xg in enumerate(columns):
        xg = np.asarray(xg, np.float32)
        assert xg.shape == (n, arch.m[g]), (xg.shape, n, arch.m[g])
        if standardize:
            mean = xg.mean(axis=0)
            std = xg.std(axis=0)  # population std (ddof=0), like the reference
            xg = (xg - mean) / np.where(std > 0, std, 1.0)
        X[g, :, : arch.m[g]] = xg
    return StackedData(jnp.asarray(X), jnp.asarray(np.asarray(y, np.float32)))
