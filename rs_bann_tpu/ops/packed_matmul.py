"""Fused 2-bit genotype decode + matmul (Pallas TPU kernel).

The reference decodes bed bytes on the host and uploads a dense standardized
f32 submatrix per branch update (/root/reference/src/io/bed.rs:325-355). Here
the 2-bit PLINK codes stay packed in HBM — 16x less memory than f32, which is
what makes genome-scale (e.g. 460k x 10k ≈ 1.15 GB packed vs 18 GB dense)
HBM-resident — and each matmul tile unpacks bytes to genotypes in VMEM right
before hitting the MXU.

Standardization never appears in the kernel: for standardized X_std with
column means μ and stds σ,

    X_std @ W = decode(bytes) @ (W / σ[:,None]) − (μ/σ) @ W

so the caller folds 1/σ into the weights and subtracts a rank-1 row
correction (see models/density.py PackedX handling). The same unpack with the
opposite contraction gives the backward pass:

    d/dW [decode(bytes) @ W] = decode(bytes)ᵀ-contraction with the cotangent

2-bit decode (io/bed.rs lookup semantics): code 00→2, 01→0 (missing,
impute-beforehand contract), 10→1, 11→0, lowest bit pair = first individual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _decode_codes(codes):
    """2-bit code -> genotype value, branchless: v = (c==0)*2 + (c==2)."""
    return (codes == 0).astype(jnp.float32) * 2.0 + (codes == 2).astype(jnp.float32)


def unpack_bytes(bytes_mb: jax.Array, n: int) -> jax.Array:
    """[m, B] uint8 -> [m, n] f32 genotypes (vectorized, no gather)."""
    b = bytes_mb.astype(jnp.int32)
    parts = [ (b >> (2 * i)) & 0b11 for i in range(4) ]  # 4 x [m, B]
    codes = jnp.stack(parts, axis=-1).reshape(b.shape[0], b.shape[1] * 4)
    return _decode_codes(codes)[:, :n]


# ------------------------------------------------------------- jnp fallback


def _packed_matmul_ref(bytes_mb, a, n):
    """Z[n, k] = decode(bytes)[m, n]^T-contraction with A[m, k]."""
    dec = unpack_bytes(bytes_mb, n)  # [m, n]
    return jax.lax.dot_general(
        dec, a, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [n, k]


def _packed_matmul_t_ref(bytes_mb, g, n):
    """dA[m, k] = decode(bytes)[m, n] @ G[n, k]."""
    dec = unpack_bytes(bytes_mb, n)
    return jax.lax.dot_general(
        dec, g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ------------------------------------------------------------ pallas kernel

_TILE_N = 256  # individuals per tile (must be divisible by 4... bytes: /4)
_TILE_M = 128  # markers per tile
_TILE_K = 128  # output features per tile


def _fwd_kernel(bytes_ref, a_ref, out_ref, acc_ref, *, n_mtiles):
    """grid (n_tiles, k_tiles, m_tiles): acc[TN, TK] += dec(TM,TN)^T A(TM,TK)."""
    import jax.numpy as jnp

    mi = jax.lax.axis_index if False else None  # doc only
    from jax.experimental import pallas as pl

    m_ix = pl.program_id(2)

    @pl.when(m_ix == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = bytes_ref[:].astype(jnp.int32)  # [TM, TN//4]
    parts = [(b >> (2 * i)) & 0b11 for i in range(4)]
    codes = jnp.stack(parts, axis=-1).reshape(b.shape[0], b.shape[1] * 4)
    dec = (codes == 0).astype(jnp.float32) * 2.0 + (codes == 2).astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        dec, a_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(m_ix == n_mtiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _bwd_kernel(bytes_ref, g_ref, out_ref, acc_ref, *, n_ntiles):
    """grid (m_tiles, k_tiles, n_tiles): acc[TM, TK] += dec(TM,TN) G(TN,TK)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    n_ix = pl.program_id(2)

    @pl.when(n_ix == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = bytes_ref[:].astype(jnp.int32)
    parts = [(b >> (2 * i)) & 0b11 for i in range(4)]
    codes = jnp.stack(parts, axis=-1).reshape(b.shape[0], b.shape[1] * 4)
    dec = (codes == 0).astype(jnp.float32) * 2.0 + (codes == 2).astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        dec, g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(n_ix == n_ntiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _cdiv(a, b):
    return -(-a // b)


def _pallas_fwd(bytes_mb, a, n, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, B = bytes_mb.shape
    k = a.shape[1]
    assert n <= B * 4
    tn = min(_TILE_N, B * 4)
    tm = min(_TILE_M, m)
    tk = min(_TILE_K, k)
    grid = (_cdiv(B * 4, tn), _cdiv(k, tk), _cdiv(m, tm))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_mtiles=grid[2]),
        out_shape=jax.ShapeDtypeStruct((B * 4, k), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tn // 4), lambda ni, ki, mi: (mi, ni)),
            pl.BlockSpec((tm, tk), lambda ni, ki, mi: (mi, ki)),
        ],
        out_specs=pl.BlockSpec((tn, tk), lambda ni, ki, mi: (ni, ki)),
        scratch_shapes=[pltpu.VMEM((tn, tk), jnp.float32)],
        interpret=interpret,
    )(bytes_mb, a)
    return out[:n]


def _pallas_bwd(bytes_mb, g_pad, n, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, B = bytes_mb.shape
    k = g_pad.shape[1]
    tn = min(_TILE_N, B * 4)
    tm = min(_TILE_M, m)
    tk = min(_TILE_K, k)
    grid = (_cdiv(m, tm), _cdiv(k, tk), _cdiv(B * 4, tn))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_ntiles=grid[2]),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tn // 4), lambda mi, ki, ni: (mi, ni)),
            pl.BlockSpec((tn, tk), lambda mi, ki, ni: (ni, ki)),
        ],
        out_specs=pl.BlockSpec((tm, tk), lambda mi, ki, ni: (mi, ki)),
        scratch_shapes=[pltpu.VMEM((tm, tk), jnp.float32)],
        interpret=interpret,
    )(bytes_mb, g_pad)


def _use_pallas():
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def packed_matmul(bytes_mb, a, n):
    """Z[n, k] = decode(bytes_mb)[m, :n] (as [n, m]) @ a[m, k].

    Differentiable in ``a`` only. Individuals beyond n (bed byte padding)
    decode to junk; the forward slices them away and the backward masks them.
    """
    if _use_pallas():
        return _pallas_fwd(bytes_mb, a, n)
    return _packed_matmul_ref(bytes_mb, a, n)


def _fwd(bytes_mb, a, n):
    return packed_matmul(bytes_mb, a, n), bytes_mb


def _bwd(n, bytes_mb, gz):
    # gz: [n, k]; pad to B*4 rows with zeros so padded individuals contribute 0
    B4 = bytes_mb.shape[1] * 4
    gz_pad = jnp.zeros((B4, gz.shape[1]), gz.dtype).at[:n].set(gz)
    if _use_pallas():
        da = _pallas_bwd(bytes_mb, gz_pad, n)
    else:
        dec = unpack_bytes(bytes_mb, B4)
        da = jax.lax.dot_general(
            dec, gz_pad, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return None, da


packed_matmul.defvjp(_fwd, _bwd)
