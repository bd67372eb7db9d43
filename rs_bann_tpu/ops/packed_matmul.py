"""Fused 2-bit genotype decode + matmul (Pallas TPU kernel).

The reference decodes bed bytes on the host and uploads a dense standardized
f32 submatrix per branch update (/root/reference/src/io/bed.rs:325-355). Here
the 2-bit codes stay packed in HBM — 16x less memory AND 16x less HBM traffic
than f32, which is what makes genome-scale inputs (460k x 10k ≈ 1.15 GB
packed vs 18 GB dense) resident and the streaming of X essentially free —
and each matmul tile unpacks bytes to genotypes in VMEM right before the MXU.

Layout: PLINK's byte order interleaves 4 consecutive individuals per byte;
unpacking that in-kernel needs an interleaving reshape the TPU vector unit
cannot lower. We therefore repack on the host into a *group-strided* layout:
individuals are grouped in blocks of 512; within a group, byte j holds
individuals (j, j+128, j+256, j+384) in bit pairs (0, 2, 4, 6). In-kernel
decode of a [TM, 128]-byte tile is then four shift-mask ops and one
lane-aligned concatenate -> [TM, 512] genotypes in natural order.

Standardization never appears in the kernel: for standardized X_std with
column means μ and stds σ,

    X_std @ W = decode(bytes) @ (W / σ[:,None]) − (μ/σ) @ W

so the caller folds 1/σ into the weights and subtracts a rank-1 row
correction (models/density.py PackedX). The same unpack with the transposed
contraction is the custom-VJP backward:

    d/dW [decode(bytes) @ W] = decode(bytes) contracted with the cotangent

2-bit decode (io/bed.rs lookup semantics): code 00→2, 01→0 (missing,
impute-beforehand contract), 10→1, 11→0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

GROUP = 512  # individuals per strided group
GBYTES = GROUP // 4  # bytes per group (= lane width 128)

# genotype value -> 2-bit code and back (io/bed.rs:16)
_VALUE_TO_CODE = np.array([0b11, 0b10, 0b00], np.uint8)


def _decode_codes(codes):
    """2-bit code -> genotype value, branchless: v = (c==0)*2 + (c==2)."""
    return (codes == 0).astype(jnp.float32) * 2.0 + (codes == 2).astype(jnp.float32)


def unpack_bytes(bytes_mb: jax.Array, n: int) -> jax.Array:
    """Standard PLINK byte order: [m, B] uint8 -> [m, n] f32 genotypes."""
    b = bytes_mb.astype(jnp.int32)
    parts = [(b >> (2 * i)) & 0b11 for i in range(4)]
    codes = jnp.stack(parts, axis=-1).reshape(b.shape[0], b.shape[1] * 4)
    return _decode_codes(codes)[:, :n]


# ------------------------------------------------------- strided layout


def pack_strided(vals: np.ndarray) -> np.ndarray:
    """[m, n] genotypes {0,1,2} -> group-strided packed [m, ceil(n/512)*128].

    Within each 512-individual group, byte j carries individuals
    (j, j+128, j+256, j+384) in bit pairs (0, 2, 4, 6). Missing tail
    individuals get code 01 (decodes to 0).
    """
    m, n = vals.shape
    ngroups = -(-n // GROUP)
    codes = np.full((m, ngroups * GROUP), 0b01, np.uint8)
    codes[:, :n] = _VALUE_TO_CODE[vals.astype(np.int64)]
    codes = codes.reshape(m, ngroups, 4, GBYTES)  # [m, g, quarter, j]
    out = (
        codes[:, :, 0, :]
        | (codes[:, :, 1, :] << 2)
        | (codes[:, :, 2, :] << 4)
        | (codes[:, :, 3, :] << 6)
    )
    return np.ascontiguousarray(out.reshape(m, ngroups * GBYTES))


def unpack_strided(bytes_mb: jax.Array, n: int) -> jax.Array:
    """Group-strided packed [m, B] -> [m, n] f32 genotypes."""
    m, B = bytes_mb.shape
    ngroups = B // GBYTES
    b = bytes_mb.astype(jnp.int32).reshape(m, ngroups, GBYTES)
    parts = [(b >> (2 * i)) & 0b11 for i in range(4)]
    codes = jnp.concatenate(parts, axis=-1)  # [m, g, 512]
    return _decode_codes(codes).reshape(m, ngroups * GROUP)[:, :n]


def _kernel_decode(byte_tile):
    """[TM, 128·k] strided bytes -> [TM, 512·k] genotypes (TPU-lowerable)."""
    b = byte_tile.astype(jnp.int32)
    parts = [(b >> (2 * i)) & 0b11 for i in range(4)]
    codes = jnp.concatenate(parts, axis=-1)
    return _decode_codes(codes)


def _kernel_decode_part(b_int32, q):
    """Part q of a strided byte tile: [TM, 128] int32 -> [TM, 128] f32.

    Value map {00->2, 01->0, 10->1, 11->0} as a 2-bit LUT packed into the
    constant 18 = 0b01_00_00_10 ((18 >> 2c) & 3): 5 int vector ops + one
    convert per genotype — cheaper than the compare/select form, and
    keeping the four parts separate (one MXU dot each) avoids the wide
    concatenate. Individuals of part q are rows q*128..q*128+127 of the
    512-individual group, so per-part dot outputs/inputs are contiguous
    row blocks.
    """
    c = (b_int32 >> (2 * q)) & 0b11
    return ((18 >> (c + c)) & 0b11).astype(jnp.float32)


# ------------------------------------------------------------- jnp fallback


def _packed_matmul_ref(bytes_mb, a, n):
    """Z[n, k] = decode(bytes)[m, :n] as [n, m] @ A[m, k]."""
    dec = unpack_strided(bytes_mb, n)  # [m, n]
    return jax.lax.dot_general(
        dec, a, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ------------------------------------------------------------ pallas kernel

_TILE_N = GROUP  # individuals per tile (one strided group = 128 bytes)
_TILE_M = 512  # max markers per tile (refetch of the [n,k] operand ∝ m/TM)
_TILE_K = 128  # output features per tile


def _tile_m(m):
    """Largest marker tile ≤ _TILE_M dividing m (m is padded to a multiple
    of 128 by the arch layout). Bigger tiles cut the backward pass's
    per-m-tile refetch of the [n, k] cotangent and the grid-step count."""
    for tm in (512, 384, 256, 128):
        if tm <= _TILE_M and m % tm == 0:
            return tm
    return min(m, 128)


# Activations whose derivative is recoverable from the *output* value alone.
# These can be fused into the kernel epilogue with only the activation saved
# as the VJP residual (silu needs the pre-activation, so it is not fused).
FUSED_ACTIVATIONS = ("identity", "relu", "leaky_relu", "tanh")


def _act_apply(act, z):
    if act == "identity":
        return z
    if act == "relu":
        return z * (z > 0)
    if act == "leaky_relu":
        return z * (z > 0) + 0.01 * z * (z < 0)
    if act == "tanh":
        return jnp.tanh(z)
    raise ValueError(f"activation not fusable: {act}")


def _act_prime_from_out(act, out):
    """h'(z) reconstructed from a = h(z); exact for the fused activations
    (at a==0 the subgradient 0 is used, matching jax.grad of x*(x>0) etc.)."""
    if act == "identity":
        return jnp.ones_like(out)
    if act == "relu":
        return (out > 0).astype(out.dtype)
    if act == "leaky_relu":
        return jnp.where(out > 0, 1.0, jnp.where(out < 0, 0.01, 0.0)).astype(out.dtype)
    if act == "tanh":
        return 1.0 - out * out
    raise ValueError(f"activation not fusable: {act}")


def _fwd_kernel(bytes_ref, a_ref, out_ref, acc_ref, *, n_mtiles):
    """grid (n_tiles, k_tiles, m_tiles): acc[TN, TK] += dec(TM,TN)^T A(TM,TK)."""
    from jax.experimental import pallas as pl

    m_ix = pl.program_id(2)

    @pl.when(m_ix == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = bytes_ref[:].astype(jnp.int32)
    a = a_ref[:]
    for q in range(4):
        dec = _kernel_decode_part(b, q)  # [TM, 128]
        acc_ref[q * 128 : (q + 1) * 128, :] += jax.lax.dot_general(
            dec, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(m_ix == n_mtiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _fwd_fused_kernel(bytes_ref, a_ref, off_ref, out_ref, acc_ref, *, n_mtiles, act):
    """Like _fwd_kernel, plus epilogue out = act(acc + off) at the last m-tile.

    Fusing the per-feature offset (bias − μ/σ rank-1 correction) and the
    activation here removes the extra HBM round trips of the layer-0
    pre-activation [n, k] that a separate XLA elementwise pass would cost —
    the dominant traffic at genome scale (profiled: the unfused packed sweep
    trailed dense ~2x purely on fusion loss at the pallas_call boundary).
    """
    from jax.experimental import pallas as pl

    m_ix = pl.program_id(2)

    @pl.when(m_ix == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = bytes_ref[:].astype(jnp.int32)
    a = a_ref[:]
    for q in range(4):
        dec = _kernel_decode_part(b, q)
        acc_ref[q * 128 : (q + 1) * 128, :] += jax.lax.dot_general(
            dec, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(m_ix == n_mtiles - 1)
    def _():
        out_ref[:] = _act_apply(act, acc_ref[:] + off_ref[:])


def _bwd_kernel(bytes_ref, g_ref, out_ref, acc_ref, *, n_ntiles):
    """grid (m_tiles, k_tiles, n_tiles): acc[TM, TK] += dec(TM,TN) G(TN,TK)."""
    from jax.experimental import pallas as pl

    n_ix = pl.program_id(2)

    @pl.when(n_ix == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = bytes_ref[:].astype(jnp.int32)
    for q in range(4):
        dec = _kernel_decode_part(b, q)  # [TM, 128]
        acc_ref[:] += jax.lax.dot_general(
            dec, g_ref[q * 128 : (q + 1) * 128, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(n_ix == n_ntiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _bwd_fused_kernel(
    bytes_ref, g_ref, res_ref, out_ref, doff_ref, acc_ref, dacc_ref, *, n_ntiles, act
):
    """Backward with the activation derivative fused in: the pre-activation
    cotangent dz = g ⊙ h'(a) is formed in VMEM from the saved activation
    tile, so dz never round-trips HBM (grid (1, k_tiles, n_tiles); the
    caller guarantees a single m-tile). The per-feature offset gradient
    d_off = Σₙ dz is accumulated as a second output — as a separate XLA
    pass it is a sublane reduction that wastes 1−k/128 of the vector width
    AND re-reads g and the saved activation from HBM."""
    from jax.experimental import pallas as pl

    n_ix = pl.program_id(2)

    @pl.when(n_ix == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        dacc_ref[:] = jnp.zeros_like(dacc_ref)

    dz = g_ref[:] * _act_prime_from_out(act, res_ref[:])  # [TN, TK]
    dacc_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    b = bytes_ref[:].astype(jnp.int32)
    for q in range(4):
        dec = _kernel_decode_part(b, q)
        acc_ref[:] += jax.lax.dot_general(
            dec, dz[q * 128 : (q + 1) * 128, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(n_ix == n_ntiles - 1)
    def _():
        out_ref[:] = acc_ref[:]
        doff_ref[:] = dacc_ref[:]


def _cdiv(a, b):
    return -(-a // b)


def _pallas_fwd(bytes_mb, a, n, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, B = bytes_mb.shape
    k = a.shape[1]
    assert B % GBYTES == 0 and n <= B * 4
    tm = _tile_m(m)
    tk = min(_TILE_K, k)
    grid = (B // GBYTES, _cdiv(k, tk), _cdiv(m, tm))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_mtiles=grid[2]),
        out_shape=jax.ShapeDtypeStruct((B * 4, k), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, GBYTES), lambda ni, ki, mi: (mi, ni)),
            pl.BlockSpec((tm, tk), lambda ni, ki, mi: (mi, ki)),
        ],
        out_specs=pl.BlockSpec((_TILE_N, tk), lambda ni, ki, mi: (ni, ki)),
        scratch_shapes=[pltpu.VMEM((_TILE_N, tk), jnp.float32)],
        interpret=interpret,
    )(bytes_mb, a)
    return out[:n]


def _pallas_fwd_fused(bytes_mb, a, off, n, act, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, B = bytes_mb.shape
    k = a.shape[1]
    assert B % GBYTES == 0 and n <= B * 4
    tm = _tile_m(m)
    tk = min(_TILE_K, k)
    grid = (B // GBYTES, _cdiv(k, tk), _cdiv(m, tm))
    out = pl.pallas_call(
        functools.partial(_fwd_fused_kernel, n_mtiles=grid[2], act=act),
        out_shape=jax.ShapeDtypeStruct((B * 4, k), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, GBYTES), lambda ni, ki, mi: (mi, ni)),
            pl.BlockSpec((tm, tk), lambda ni, ki, mi: (mi, ki)),
            pl.BlockSpec((1, tk), lambda ni, ki, mi: (0, ki)),
        ],
        out_specs=pl.BlockSpec((_TILE_N, tk), lambda ni, ki, mi: (ni, ki)),
        scratch_shapes=[pltpu.VMEM((_TILE_N, tk), jnp.float32)],
        interpret=interpret,
    )(bytes_mb, a, off.reshape(1, k))
    return out[:n]


def _pallas_bwd(bytes_mb, g_pad, n, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, B = bytes_mb.shape
    k = g_pad.shape[1]
    assert B % GBYTES == 0
    tm = _tile_m(m)
    tk = min(_TILE_K, k)
    grid = (_cdiv(m, tm), _cdiv(k, tk), B // GBYTES)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_ntiles=grid[2]),
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, GBYTES), lambda mi, ki, ni: (mi, ni)),
            pl.BlockSpec((_TILE_N, tk), lambda mi, ki, ni: (ni, ki)),
        ],
        out_specs=pl.BlockSpec((tm, tk), lambda mi, ki, ni: (mi, ki)),
        scratch_shapes=[pltpu.VMEM((tm, tk), jnp.float32)],
        interpret=interpret,
    )(bytes_mb, g_pad)


def _pallas_bwd_fused(bytes_mb, g_pad, res_pad, n, act, interpret=False):
    """(da[m, k], d_off[1, k]) = (dec(bytes) @ dz, Σₙ dz) for
    dz = g ⊙ h'(res), with h' and the column sum applied in-kernel.
    Requires m to fit one marker tile (callers fall back otherwise)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, B = bytes_mb.shape
    k = g_pad.shape[1]
    assert B % GBYTES == 0
    tm = _tile_m(m)
    assert tm == m, "single m-tile required for the fused d_off output"
    tk = min(_TILE_K, k)
    grid = (1, _cdiv(k, tk), B // GBYTES)
    return pl.pallas_call(
        functools.partial(_bwd_fused_kernel, n_ntiles=grid[2], act=act),
        out_shape=(
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, GBYTES), lambda mi, ki, ni: (mi, ni)),
            pl.BlockSpec((_TILE_N, tk), lambda mi, ki, ni: (ni, ki)),
            pl.BlockSpec((_TILE_N, tk), lambda mi, ki, ni: (ni, ki)),
        ],
        out_specs=(
            pl.BlockSpec((tm, tk), lambda mi, ki, ni: (mi, ki)),
            pl.BlockSpec((1, tk), lambda mi, ki, ni: (0, ki)),
        ),
        scratch_shapes=[
            pltpu.VMEM((tm, tk), jnp.float32),
            pltpu.VMEM((1, tk), jnp.float32),
        ],
        interpret=interpret,
    )(bytes_mb, g_pad, res_pad)


def _use_pallas():
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def packed_matmul(bytes_mb, a, n):
    """Z[n, k] = decode_strided(bytes_mb)[m, :n] (as [n, m]) @ a[m, k].

    ``bytes_mb`` must be in the group-strided layout (pack_strided).
    Differentiable in ``a`` only. Individuals beyond n decode to 0 (missing
    code), so the forward slice and the zero-padded backward are exact.
    """
    if _use_pallas():
        return _pallas_fwd(bytes_mb, a, n)
    return _packed_matmul_ref(bytes_mb, a, n)


def _fwd(bytes_mb, a, n):
    return packed_matmul(bytes_mb, a, n), bytes_mb


def _bwd(n, bytes_mb, gz):
    # pad the cotangent to B*4 rows with zeros: padded individuals contribute 0
    B4 = bytes_mb.shape[1] * 4
    gz_pad = jnp.zeros((B4, gz.shape[1]), gz.dtype).at[:n].set(gz)
    if _use_pallas():
        da = _pallas_bwd(bytes_mb, gz_pad, n)
    else:
        dec = unpack_strided(bytes_mb, B4)
        da = jax.lax.dot_general(
            dec, gz_pad, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return None, da


packed_matmul.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_linear(bytes_mb, a, off, n, act):
    """out[n, k] = act(decode_strided(bytes_mb)[:, :n]ᵀ @ a + off[None, :]).

    The fully fused layer-0 op: 2-bit decode, matmul, per-feature offset
    (bias plus the rank-1 standardization correction folded in by the
    caller, models/density.py), and activation in one kernel — the
    pre-activation never touches HBM. ``act`` must be in FUSED_ACTIVATIONS
    (its derivative is reconstructed from the output in the backward pass).
    Differentiable in ``a`` and ``off``.
    """
    assert act in FUSED_ACTIVATIONS, act
    if _use_pallas():
        return _pallas_fwd_fused(bytes_mb, a, off, n, act)
    z = _packed_matmul_ref(bytes_mb, a, n) + off[None, :]
    return _act_apply(act, z)


def _pl_fwd(bytes_mb, a, off, n, act):
    out = packed_linear(bytes_mb, a, off, n, act)
    return out, (bytes_mb, out)


def _pl_bwd(n, act, res, g):
    bytes_mb, out = res
    B4 = bytes_mb.shape[1] * 4
    k = g.shape[1]
    if _use_pallas():
        # h'(out) is applied inside the kernel: dz never round-trips HBM.
        # Padded rows have g == 0, so their dz is 0 whatever res holds.
        if n == B4:
            g_pad, res_pad = g, out
        else:
            g_pad = jnp.zeros((B4, k), g.dtype).at[:n].set(g)
            res_pad = jnp.zeros((B4, k), out.dtype).at[:n].set(out)
        m = bytes_mb.shape[0]
        if _tile_m(m) == m:
            da, d_off = _pallas_bwd_fused(bytes_mb, g_pad, res_pad, n, act)
            d_off = d_off[0]
        else:  # wide branch: d_off as a (slower) XLA pass
            dz_pad = g_pad * _act_prime_from_out(act, res_pad)
            da = _pallas_bwd(bytes_mb, dz_pad, n)
            d_off = jnp.sum(dz_pad, axis=0)
    else:
        dz = g * _act_prime_from_out(act, out)
        d_off = jnp.sum(dz, axis=0)
        dz_pad = jnp.zeros((B4, k), dz.dtype).at[:n].set(dz)
        dec = unpack_strided(bytes_mb, B4)
        da = jax.lax.dot_general(
            dec, dz_pad, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return None, da, d_off


packed_linear.defvjp(_pl_fwd, _pl_bwd)
