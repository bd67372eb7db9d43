"""Fused branch-MLP data-term value-and-grad (Pallas TPU kernel).

Why this kernel exists (BENCH r3 diagnosis, scripts/diag_scale.py): the
flagship HMC sweep is HBM-bound on streaming the branch genotypes X — the
autodiff leapfrog reads X twice per step (forward + dW0 cotangent), and XLA
cannot fuse the two passes for depth >= 1 because the cotangent needs the
full forward first. But a branch net is PER-SAMPLE feed-forward: for one
tile of individuals, the whole forward AND backward fit in VMEM (weights are
KBs). So this kernel streams X exactly ONCE per leapfrog step and computes

    y_pred = f(x; W, b)             (feature-major, [n])
    rss    = sum_i (y_pred_i - t_i)^2
    dW_l, db_l = d(rss/2) / d(W_l, b_l)      for every layer

in a single pass, with all intermediate activations living and dying in
VMEM — zero intermediate HBM traffic. The sampler's potential is then
ld = prior(theta) - err_prec * rss / 2, with the (tiny, elementwise) prior
gradient added by autodiff outside (samplers/hmc.py wires this in).

The hot data path this replaces in the reference streams a dense f32 branch
submatrix per update through ArrayFire GEMMs
(/root/reference/src/net/branch/branch_sampler.rs:743-758 forward,
/root/reference/src/io/bed.rs:325-355 upload); here one bf16 X stream per
leapfrog step feeds the MXU directly.

Supports every reference activation (tanh/relu/leaky_relu/silu/identity —
pre-activations are in VMEM, so even silu's z-dependent derivative is free)
and any depth (layers are unrolled at trace time). Inputs are cast to bf16
for the MXU with f32 accumulation — the same rounding XLA's default
precision applies to the autodiff path — except with input_dtype=None
(f32), used by the CPU interpret-mode tests for exact comparison against
``jax.grad``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SUPPORTED_ACTIVATIONS = ("identity", "relu", "leaky_relu", "tanh", "silu")

# None: TPU-only (pallas off elsewhere). "interpret": force interpret-mode
# pallas on CPU (tests). "off": never use the kernel.
FORCE = None

_TILE_N = 512


def _act(name, z):
    if name == "identity":
        return z
    if name == "relu":
        return z * (z > 0)
    if name == "leaky_relu":
        return z * (z > 0) + 0.01 * z * (z < 0)
    if name == "tanh":
        return jnp.tanh(z)
    if name == "silu":
        return z * jax.nn.sigmoid(z)
    raise ValueError(name)


def _act_prime(name, z, a):
    """h'(z) given pre-activation z and activation a = h(z)."""
    if name == "identity":
        return jnp.ones_like(z)
    if name == "relu":
        return (z > 0).astype(z.dtype)
    if name == "leaky_relu":
        return jnp.where(z > 0, 1.0, jnp.where(z < 0, 0.01, 0.0)).astype(z.dtype)
    if name == "tanh":
        return 1.0 - a * a
    if name == "silu":
        s = jax.nn.sigmoid(z)
        return s * (1.0 + z * (1.0 - s))
    raise ValueError(name)


def available():
    import os

    if FORCE == "off" or os.environ.get("RS_BANN_FUSED", "").lower() in (
        "0", "off", "false",
    ):
        return False
    if FORCE == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(act, n, tile_n, depth1, in_dtype, *refs):
    """Grid (n_tiles,). refs layout:
    [xT, target, W_0..W_{L-1}, b_0..b_{L-2} | y_pred, dWT_0..dWT_{L-1},
     db_0..db_{L-2}]   (L = depth1: number of weight layers incl. output)
    Accumulating outputs use constant index maps — the block stays resident
    in VMEM across the sequential TPU grid; init at tile 0. (rss is
    reduced OUTSIDE the kernel from y_pred — a scalar VMEM accumulator is
    the one construct here with lowering risk, and the [n] re-read is
    negligible.)
    """
    from jax.experimental import pallas as pl

    L = depth1
    nin = 2 + L + (L - 1)
    x_ref, t_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + L]
    b_refs = refs[2 + L : nin]
    out = refs[nin:]
    yp_ref = out[0]
    dwt_refs = out[1 : 1 + L]
    db_refs = out[1 + L :]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for r in dwt_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    # dot operands must agree in dtype (X may be stored bf16, weights f32)
    cast = (
        (lambda v: v.astype(jnp.float32))
        if in_dtype is None
        else (lambda v: v.astype(in_dtype))
    )

    # zero lanes past n: garbage in the tail block must not reach any
    # accumulator (0 * NaN = NaN), so x is masked at the source and the
    # error at the sink
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = (t * tile_n + lane) < n

    x = jnp.where(valid, x_ref[:], 0.0)
    a = cast(x)
    zs, acts = [], [a]
    for l in range(L - 1):
        z = jax.lax.dot_general(
            cast(w_refs[l][:]), a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_refs[l][:]
        al = _act(act, z)
        zs.append(z)
        acts.append(al)
        a = cast(al)
    # output neuron: [s_pad, 1] weights as a VPU sublane reduction
    w_out = w_refs[L - 1][:]
    pred = jnp.sum(w_out * acts[-1], axis=0, keepdims=True)  # [1, TN]
    yp_ref[:] = pred
    err = jnp.where(valid, pred - t_ref[:], 0.0)

    # backward: d(rss/2)/d(theta); all tile-local. The output-layer dW is
    # accumulated in the W's own [s_pad, 1] orientation — a [s,1]->[1,s]
    # transpose is a Mosaic relayout (unsupported shape cast on TPU).
    dwt_refs[L - 1][:] += jnp.sum(acts[-1] * err, axis=1, keepdims=True)
    da = w_out * err  # [s_pad, TN]
    for l in range(L - 2, -1, -1):
        dz = da * _act_prime(act, zs[l], acts[l + 1])
        db_refs[l][:] += jnp.sum(dz, axis=1, keepdims=True)
        dwt_refs[l][:] += jax.lax.dot_general(
            cast(dz), cast(acts[l]), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l > 0:
            da = jax.lax.dot_general(
                cast(w_refs[l][:]), cast(dz), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "in_dtype")
)
def _data_vg_impl(xT, target, weights, biases, act, interpret, in_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m_pad, n = xT.shape
    L = len(weights)
    tile_n = min(_TILE_N, -(-n // 128) * 128)
    grid = (-(-n // tile_n),)

    b2 = tuple(b[:, None] for b in biases)  # [out_pad] -> [out_pad, 1]
    t2 = target[None, :]  # [1, n]

    const = lambda shape: pl.BlockSpec(
        shape, lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [
            pl.BlockSpec((m_pad, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM),
        ]
        + [const(w.shape) for w in weights]
        + [const(b.shape) for b in b2]
    )
    # hidden-layer dW accumulators come out of the dot as [out, in]
    # (transposed); the output layer stays in W's own [s_pad, 1] shape
    dwt_shapes = [w.shape[::-1] for w in weights[:-1]] + [weights[-1].shape]
    out_shapes = (
        [jax.ShapeDtypeStruct((1, n), jnp.float32)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in dwt_shapes]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in b2]
    )
    out_specs = (
        [pl.BlockSpec((1, tile_n), lambda t: (0, t), memory_space=pltpu.VMEM)]
        + [const(s) for s in dwt_shapes]
        + [const(b.shape) for b in b2]
    )

    kern = functools.partial(_kernel, act, n, tile_n, L, in_dtype)
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xT, t2, *weights, *b2)

    y_pred = res[0][0]
    rss = jnp.sum((y_pred - target) ** 2)
    dws = tuple(dwt.T for dwt in res[1:L]) + (res[L],)
    dbs = tuple(db[:, 0] for db in res[1 + L :])
    return y_pred, rss, dws, dbs


# ------------------------------------------- branch-blocked variant
#
# One branch per pallas instance leaves the MXU mostly idle: a [h=32, m=64]
# x [m, TN] dot issues a full 128x128 tile regardless (8x padding waste for
# the flagship widths). When the sweep vmaps the per-branch vg over G, the
# custom_vmap rule below dispatches instead to a kernel that packs NB
# branches per instance with BLOCK-DIAGONAL layer weights
# ([NB*out, NB*in] against the NB branches' stacked inputs [NB*in, TN]),
# so layer dots run as full tiles (NB = 128 // h_pad: 4x less issue
# padding at the flagship shape). The off-diagonal zeros make the big dot
# exactly the NB independent branch dots; the dW cross-blocks it also
# produces are discarded at the diagonal extraction.


def _pick_nb(G, weights):
    out0 = weights[0].shape[-1]
    nb = max(1, 128 // max(8, out0))
    while nb > 1 and G % nb:
        nb //= 2
    return nb


def _unpack_block_refs(L, refs):
    nin = 2 + L + (L - 1)
    return (refs[0], refs[1], refs[2 : 2 + L], refs[2 + L : nin],
            refs[nin], refs[nin + 1 : nin + 1 + L], refs[nin + 1 + L :])


def _bd(wt, nb):  # TRANSPOSED weights [NB, out, in] -> block-diag [NB*out, NB*in]
    o, i = wt.shape[1], wt.shape[2]
    z = jnp.zeros((o, i), wt.dtype)
    rows = [
        jnp.concatenate([wt[b] if bb == b else z for bb in range(nb)], axis=1)
        for b in range(nb)
    ]
    return jnp.concatenate(rows, axis=0)


def _mlp_chunk(act, nb, L, cast, bds, w_refs, b_refs, dwt_refs, db_refs,
               x, tgt, valid, yp_write):
    """Forward + backward of the NB-branch block on one lane chunk of
    individuals; accumulates the d(rss/2) cotangents into the output refs.
    ``x`` [NB*m_pad, TC] (already zero on invalid lanes), ``tgt`` [NB, TC].

    Layout discipline: every reshape here merges/splits LEADING dims only
    (the minor lane dim never moves) — lane<->sublane reshapes are Mosaic
    relayouts the TPU lowering rejects. Hidden weights therefore arrive
    pre-transposed [NB, out, in] (no in-kernel transpose), biases and the
    output weights as [NB, out, 1] / [NB, s, 1] columns, and the dW
    diagonal blocks are extracted with static 2-D slices per branch."""
    tc = x.shape[1]
    a = cast(x)
    zs, acts = [], [a]
    for l in range(L - 1):
        z = jax.lax.dot_general(
            bds[l], a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_refs[l][:].reshape(-1, 1)
        al = _act(act, z)
        zs.append(z)
        acts.append(al)
        a = cast(al)
    s_pad = w_refs[L - 1].shape[1]
    w_out = w_refs[L - 1][:].reshape(nb * s_pad, 1)  # [NB, s, 1] stacked
    contrib = w_out * acts[-1]  # [NB*s, TC]
    pred = jnp.sum(contrib.reshape(nb, s_pad, tc), axis=1)  # [NB, TC]
    yp_write(pred)
    err = jnp.where(valid, pred - tgt, 0.0)  # [NB, TC]
    errE = jnp.broadcast_to(
        err[:, None, :], (nb, s_pad, tc)
    ).reshape(nb * s_pad, tc)
    dwt_refs[L - 1][:] += jnp.sum(
        acts[-1] * errE, axis=1, keepdims=True
    ).reshape(nb, s_pad, 1)
    da = w_out * errE
    for l in range(L - 2, -1, -1):
        o = w_refs[l].shape[1]  # transposed: [NB, out, in]
        i = w_refs[l].shape[2]
        dz = da * _act_prime(act, zs[l], acts[l + 1])  # [NB*o, TC]
        db_refs[l][:] += jnp.sum(dz, axis=1, keepdims=True).reshape(nb, o, 1)
        dw_full = jax.lax.dot_general(
            cast(dz), cast(acts[l]), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [NB*o, NB*i] incl. discarded cross-blocks
        for b in range(nb):
            dwt_refs[l][b, :, :] += dw_full[
                b * o : (b + 1) * o, b * i : (b + 1) * i
            ]
        if l > 0:
            da = jax.lax.dot_general(
                bds[l], cast(dz), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _cast_for(in_dtype):
    return (
        (lambda v: v.astype(jnp.float32))
        if in_dtype is None
        else (lambda v: v.astype(in_dtype))
    )


def _blocked_kernel(act, n, tile_n, depth1, nb, in_dtype, *refs):
    """Grid (G//NB, n_tiles); same ref layout as _kernel with a leading NB
    block axis on every operand."""
    from jax.experimental import pallas as pl

    L = depth1
    x_ref, t_ref, w_refs, b_refs, yp_ref, dwt_refs, db_refs = (
        _unpack_block_refs(L, refs)
    )
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for r in dwt_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    cast = _cast_for(in_dtype)
    bds = [cast(_bd(w_refs[l][:], nb)) for l in range(L - 1)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = (t * tile_n + lane) < n
    m_pad = x_ref.shape[1]
    x = jnp.where(valid, x_ref[:].reshape(nb * m_pad, tile_n), 0.0)

    def yp_write(pred):
        yp_ref[:] = pred[:, None, :]

    _mlp_chunk(act, nb, L, cast, bds, w_refs, b_refs, dwt_refs, db_refs,
               x, t_ref[:, 0, :], valid, yp_write)


def _blocked_packed_kernel(act, n, depth1, nb, in_dtype, *refs):
    """Packed variant: grid (G//NB, n_groups); x_ref holds one group-strided
    byte tile [NB, m_pad, 128] = 512 individuals, decoded part-by-part
    in-kernel (the proven per-part pattern of ops/packed_matmul — decode is
    five int vector ops per genotype and yields FEATURE-MAJOR chunks, so no
    sample-major [n, k] intermediate ever exists). Weights[0]/biases[0] must
    arrive pre-folded (scale into W0, -shift@W0' into the bias offset); the
    caller unfolds the cotangents (data_vg_packed)."""
    from jax.experimental import pallas as pl

    from .packed_matmul import _kernel_decode_part

    L = depth1
    x_ref, t_ref, w_refs, b_refs, yp_ref, dwt_refs, db_refs = (
        _unpack_block_refs(L, refs)
    )
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for r in dwt_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    cast = _cast_for(in_dtype)
    bds = [cast(_bd(w_refs[l][:], nb)) for l in range(L - 1)]
    m_pad = x_ref.shape[1]
    b_i32 = x_ref[:].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for q in range(4):
        xq = _kernel_decode_part(b_i32, q).reshape(nb * m_pad, 128)
        valid = (t * 512 + q * 128 + lane) < n
        # decoded genotypes are already 0 past n (missing-code padding in
        # pack_strided), so only the error needs the mask
        tgt = t_ref[:, 0, q * 128 : (q + 1) * 128]

        def yp_write(pred, q=q):
            yp_ref[:, :, q * 128 : (q + 1) * 128] = pred[:, None, :]

        _mlp_chunk(act, nb, L, cast, bds, w_refs, b_refs, dwt_refs, db_refs,
                   xq, tgt, valid, yp_write)


def _blocked_operands(weights, biases, target, nb):
    """Common operand packing for the blocked kernels (see _mlp_chunk's
    layout discipline): hidden weights transposed [G, out, in], output
    weights [G, s, 1] as-is, biases [G, out, 1] columns, target [G, 1, n].
    Returns (wts, b3, t3, dwt_shapes) — dwt_shapes per-G trailing dims."""
    wts = tuple(
        jnp.swapaxes(w, 1, 2) for w in weights[:-1]
    ) + (weights[-1],)
    b3 = tuple(b[:, :, None] for b in biases)  # [G, out, 1]
    t3 = target[:, None, :]  # [G, 1, n]
    dwt_shapes = [w.shape[1:][::-1] for w in weights[:-1]] + [
        weights[-1].shape[1:]
    ]
    return wts, b3, t3, dwt_shapes


def _blocked_unpack(res, L, target, weights):
    y_pred = res[0][:, 0, :]
    rss = jnp.sum((y_pred - target) ** 2, axis=1)
    dws = tuple(jnp.swapaxes(dwt, 1, 2) for dwt in res[1:L]) + (res[L],)
    dbs = tuple(db[:, :, 0] for db in res[1 + L :])
    return y_pred, rss, dws, dbs


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "in_dtype", "nb")
)
def _data_vg_blocked(xT, target, weights, biases, act, interpret, in_dtype, nb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, m_pad, n = xT.shape
    L = len(weights)
    tile_n = min(_TILE_N, -(-n // 128) * 128)
    grid = (G // nb, -(-n // tile_n))

    wts, b3, t3, dwt_shapes = _blocked_operands(weights, biases, target, nb)
    const3 = lambda shape: pl.BlockSpec(
        (nb,) + shape, lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [
            pl.BlockSpec(
                (nb, m_pad, tile_n), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nb, 1, tile_n), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [const3(w.shape[1:]) for w in wts]
        + [const3(b.shape[1:]) for b in b3]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((G, 1, n), jnp.float32)]
        + [jax.ShapeDtypeStruct((G,) + s, jnp.float32) for s in dwt_shapes]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in b3]
    )
    out_specs = (
        [
            pl.BlockSpec(
                (nb, 1, tile_n), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            )
        ]
        + [const3(s) for s in dwt_shapes]
        + [const3(b.shape[1:]) for b in b3]
    )

    kern = functools.partial(_blocked_kernel, act, n, tile_n, L, nb, in_dtype)
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xT, t3, *wts, *b3)

    return _blocked_unpack(res, L, target, weights)


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "in_dtype", "nb", "n")
)
def _data_vg_packed_blocked(
    bytes_g, target, weights, biases, act, interpret, in_dtype, nb, n
):
    """weights[0]/biases[0] pre-folded (see data_vg_packed)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, m_pad, B = bytes_g.shape
    L = len(weights)
    grid = (G // nb, B // 128)

    wts, b3, t3, dwt_shapes = _blocked_operands(weights, biases, target, nb)
    const3 = lambda shape: pl.BlockSpec(
        (nb,) + shape, lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [
            pl.BlockSpec(
                (nb, m_pad, 128), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nb, 1, 512), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [const3(w.shape[1:]) for w in wts]
        + [const3(b.shape[1:]) for b in b3]
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((G, 1, n), jnp.float32)]
        + [jax.ShapeDtypeStruct((G,) + s, jnp.float32) for s in dwt_shapes]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in b3]
    )
    out_specs = (
        [
            pl.BlockSpec(
                (nb, 1, 512), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            )
        ]
        + [const3(s) for s in dwt_shapes]
        + [const3(b.shape[1:]) for b in b3]
    )

    kern = functools.partial(
        _blocked_packed_kernel, act, n, L, nb, in_dtype
    )
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(bytes_g, t3, *wts, *b3)

    return _blocked_unpack(res, L, target, weights)


@functools.lru_cache(maxsize=None)
def _vg_packed_for(act, interpret, in_dtype, n):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def vg(bytes_g, target, weights, biases):
        out = _data_vg_packed_blocked(
            bytes_g[None], target[None], tuple(w[None] for w in weights),
            tuple(b[None] for b in biases), act, interpret, in_dtype, 1, n,
        )
        return jax.tree.map(lambda a: a[0], out)

    @vg.def_vmap
    def _rule(axis_size, in_batched, bytes_g, target, weights, biases):
        xb, tb, wb, bb = in_batched
        out_batched = (True, True, tuple(True for _ in weights),
                       tuple(True for _ in biases))
        if xb and tb and all(wb) and (all(bb) if bb else True):
            nb = _pick_nb(axis_size, weights)
            out = _data_vg_packed_blocked(
                bytes_g, target, weights, biases, act, interpret, in_dtype,
                nb, n,
            )
            return out, out_batched
        # partially batched (e.g. a chain vmap over shared genotype bytes):
        # broadcast per LEAF and vmap the single-instance kernel (ADVICE r3
        # fixed the silent axis misread; this fallback is correctness-first —
        # the broadcast materializes the unbatched operands per batch entry,
        # so multi-chain packed production should chain-fold instead)
        bc1 = lambda a, b: a if b else jnp.broadcast_to(
            a[None], (axis_size,) + a.shape
        )
        single = lambda x_, t_, w_, b_: jax.tree.map(
            lambda a: a[0],
            _data_vg_packed_blocked(
                x_[None], t_[None], tuple(wi[None] for wi in w_),
                tuple(bi[None] for bi in b_), act, interpret, in_dtype, 1, n,
            ),
        )
        out = jax.vmap(single)(
            bc1(bytes_g, xb), bc1(target, tb),
            tuple(bc1(w, b) for w, b in zip(weights, wb)),
            tuple(bc1(b_, f) for b_, f in zip(biases, bb)),
        )
        return out, out_batched

    return vg


def data_vg_packed(act_name, x, weights, biases, target, f32=False):
    """Packed-genotype fused vg: same contract as data_vg but ``x`` is a
    PackedX (models/density.py). Standardization is folded into layer 0
    before the kernel (W0' = scale*W0; offset -shift@W0' into the bias) and
    the cotangents are unfolded after:

        dU/dW0[m,j] = s_m*dW0'[m,j] - mu_m*s_m*doff_j,    dU/db0 = doff

    ``f32=True`` keeps the dots in f32 (6-pass MXU) — used for VALUE passes
    whose results feed Metropolis accept ratios: bf16 prediction noise in a
    length-n rss is O(sqrt(n)) in the log-acceptance, and a noisy-MH accept
    drifts the chain toward noise-favored states (measured r5: live-accept
    runs at n>=1e5 degrade with bf16 values, healthy with f32).
    """
    interpret = FORCE == "interpret"
    in_dtype = None if (interpret or f32) else "bfloat16"
    s = x.w_scale
    w0p = s[:, None] * weights[0]
    off = biases[0] - x.shift @ w0p
    wf = (w0p,) + tuple(weights[1:])
    bf = (off,) + tuple(biases[1:])
    y_pred, rss, dws, dbs = _vg_packed_for(act_name, interpret, in_dtype, x.n)(
        x.bytes, target, wf, bf
    )
    dW0 = s[:, None] * dws[0] - (x.shift * s)[:, None] * dbs[0]
    dws = (dW0,) + tuple(dws[1:])
    return y_pred, rss, dws, dbs


# ------------------------------------------- chain-folded dense variant
#
# The flagship sweep runs C MCMC chains; executed per-chain (lax.map), every
# chain streams the branch genotypes X from HBM separately — and the r3
# scaling study showed that stream is the sweep's wall-clock bound. vmap
# nesting cannot fix it (measured scripts/exp_chainfold.py: both nestings
# are 3-5x SLOWER — XLA re-lays-out the batched dots at every scan step).
# This kernel folds the chain axis INSIDE the instance instead: weights
# arrive chain-stacked [C*out, in], X is read ONCE per (branch, tile) and
# feeds layer-0 forward [C*h, m] @ [m, TN] AND backward dW0 [C*h, TN] @
# [TN, m] for all C chains — one X stream per leapfrog step total, with
# C*h = 128 rows filling full MXU tiles (the per-chain kernel underfills
# 4x at h=32). Hidden layers use the proven block-diagonal trick over the
# CHAIN axis (chains are independent nets over shared data, exactly like
# the branch blocks in _blocked_kernel are independent nets over their own
# data).


def _chain_kernel(act, n, tile_n, depth1, C, in_dtype, *refs):
    """Grid (G, n_tiles). Ref layout as _kernel with a leading size-1 G
    block dim; weights/biases arrive chain-merged:
      x [1, m_pad, TN], target [1, C, TN],
      hidden W (transposed, merged) [1, C*out, in], w_out [1, C*s, 1],
      biases [1, C*out, 1]
      outputs: y_pred [1, C, TN], dWT hidden [1, C*out, in] (accum),
      dW_out [1, C*s, 1] (accum), db [1, C*out, 1] (accum)."""
    from jax.experimental import pallas as pl

    L = depth1
    x_ref, t_ref, w_refs, b_refs, yp_ref, dwt_refs, db_refs = (
        _unpack_block_refs(L, refs)
    )
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for r in dwt_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    cast = _cast_for(in_dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = (t * tile_n + lane) < n
    x = cast(jnp.where(valid, x_ref[0], 0.0))  # [m_pad, TN]

    # layer 0: all C chains in one dot against the shared x — the X read
    # this whole kernel exists to share
    z = jax.lax.dot_general(
        cast(w_refs[0][0]), x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_refs[0][0]  # [C*h, TN]
    zs, acts = [z], [_act(act, z)]
    # hidden layers 1..L-2: block-diagonal over chains
    bds = []
    for l in range(1, L - 1):
        co, i = w_refs[l].shape[1], w_refs[l].shape[2]
        bd = _bd(w_refs[l][0].reshape(C, co // C, i), C)  # [C*out, C*in]
        bds.append(cast(bd))
        z = jax.lax.dot_general(
            bds[-1], cast(acts[-1]), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_refs[l][0]
        zs.append(z)
        acts.append(_act(act, z))
    cs = w_refs[L - 1].shape[1]  # C*s_pad
    s_pad = cs // C
    w_out = w_refs[L - 1][0]  # [C*s, 1]
    contrib = w_out * acts[-1]  # [C*s, TN]
    pred = jnp.sum(contrib.reshape(C, s_pad, tile_n), axis=1)  # [C, TN]
    yp_ref[0, :, :] = pred
    err = jnp.where(valid, pred - t_ref[0], 0.0)  # [C, TN]
    errE = jnp.broadcast_to(
        err[:, None, :], (C, s_pad, tile_n)
    ).reshape(cs, tile_n)
    dwt_refs[L - 1][0, :, :] += jnp.sum(acts[-1] * errE, axis=1, keepdims=True)
    da = w_out * errE  # [C*s, TN]
    for l in range(L - 2, 0, -1):
        co, i = w_refs[l].shape[1], w_refs[l].shape[2]
        o = co // C
        ci = C * i
        dz = da * _act_prime(act, zs[l], acts[l])  # [C*o, TN]
        db_refs[l][0, :, :] += jnp.sum(dz, axis=1, keepdims=True)
        dw_full = jax.lax.dot_general(
            cast(dz), cast(acts[l - 1]), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C*o, C*i] incl. discarded cross-chain blocks
        for c in range(C):
            dwt_refs[l][0, c * o : (c + 1) * o, :] += dw_full[
                c * o : (c + 1) * o, c * i : (c + 1) * i
            ]
        da = jax.lax.dot_general(
            bds[l - 1], cast(dz), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C*in, TN]
    dz = da * _act_prime(act, zs[0], acts[0])  # [C*h, TN]
    db_refs[0][0, :, :] += jnp.sum(dz, axis=1, keepdims=True)
    # dW0 for all chains against the SAME resident x — no cross blocks
    dwt_refs[0][0, :, :] += jax.lax.dot_general(
        cast(dz), x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C*h, m_pad]


# larger n tiles than the per-chain kernels: the chain-folded grid has few
# steps (G x n/tile), so per-step sequencing overhead dominates at 512
# (measured 36.9 -> see BENCH; VMEM per instance at 2048 stays ~5 MB)
_TILE_N_CHAINS = 2048


@functools.partial(
    jax.jit, static_argnames=("act", "interpret", "in_dtype", "C")
)
def _data_vg_chains_impl(xT, target, weights, biases, act, interpret,
                         in_dtype, C):
    """xT [G, m_pad, n]; target [G, C, n]; weights[l] [G, C, in, out];
    biases[l] [G, C, out]. Returns (y_pred [G,C,n], rss [G,C],
    dws, dbs) matching the weights/biases layouts."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, m_pad, n = xT.shape
    L = len(weights)
    tile_n = min(_TILE_N_CHAINS, -(-n // 128) * 128)
    grid = (G, -(-n // tile_n))

    # chain-merge: hidden W -> transposed [G, C*out, in]; w_out [G, C*s, 1];
    # biases [G, C*out, 1]
    def merge_wt(w):  # [G, C, in, out] -> [G, C*out, in]
        Gd, Cd, i, o = w.shape
        return jnp.swapaxes(w, 2, 3).reshape(Gd, Cd * o, i)

    wts = tuple(merge_wt(w) for w in weights[:-1]) + (
        weights[-1].reshape(G, -1, 1),
    )
    b3 = tuple(b.reshape(G, -1, 1) for b in biases)
    const3 = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda g, t: (g, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [
            pl.BlockSpec((1, m_pad, tile_n), lambda g, t: (g, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tile_n), lambda g, t: (g, 0, t),
                         memory_space=pltpu.VMEM),
        ]
        + [const3(w.shape[1:]) for w in wts]
        + [const3(b.shape[1:]) for b in b3]
    )
    dwt_shapes = [w.shape[1:] for w in wts]
    out_shapes = (
        [jax.ShapeDtypeStruct((G, C, n), jnp.float32)]
        + [jax.ShapeDtypeStruct((G,) + s, jnp.float32) for s in dwt_shapes]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in b3]
    )
    out_specs = (
        [pl.BlockSpec((1, C, tile_n), lambda g, t: (g, 0, t),
                      memory_space=pltpu.VMEM)]
        + [const3(s) for s in dwt_shapes]
        + [const3(b.shape[1:]) for b in b3]
    )
    kern = functools.partial(_chain_kernel, act, n, tile_n, L, C, in_dtype)
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xT, target, *wts, *b3)

    y_pred = res[0]  # [G, C, n]
    rss = jnp.sum((y_pred - target) ** 2, axis=2)  # [G, C]

    def unmerge(dwt, w):  # [G, C*out, in] -> [G, C, in, out]
        Gd, Cd, i, o = w.shape
        return jnp.swapaxes(dwt.reshape(Gd, Cd, o, i), 2, 3)

    dws = tuple(
        unmerge(res[1 + l], weights[l]) for l in range(L - 1)
    ) + (res[L].reshape(weights[-1].shape),)
    dbs = tuple(res[1 + L + l].reshape(biases[l].shape) for l in range(L - 1))
    return y_pred, rss, dws, dbs


def data_vg_chains(act_name, xT, weights, biases, target, f32=False):
    """Chain-folded fused vg: one X stream per call for ALL chains.

    xT [G, m_pad, n] feature-major dense (bf16 or f32); weights[l]
    [G, C, in_pad, out_pad]; biases[l] [G, C, out_pad]; target [G, C, n].
    Returns (y_pred [G, C, n], rss [G, C], dW tuple, db tuple) with
    dW/db = d(rss/2)/d(.) in the input layouts.

    ``f32=True``: f32 dots for accept-ratio value passes (see
    data_vg_packed).
    """
    interpret = FORCE == "interpret"
    in_dtype = None if (interpret or f32) else "bfloat16"
    C = target.shape[1]
    return _data_vg_chains_impl(
        xT, target, tuple(weights), tuple(biases), act_name, interpret,
        in_dtype, C,
    )


@functools.lru_cache(maxsize=None)
def _vg_for(act, interpret, in_dtype):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def vg(xT, target, weights, biases):
        return _data_vg_impl(
            xT, target, weights, biases, act, interpret, in_dtype
        )

    @vg.def_vmap
    def _rule(axis_size, in_batched, xT, target, weights, biases):
        xb, tb, wb, bb = in_batched
        all_b = (
            xb and tb and all(wb) and (all(bb) if bb else True)
        )
        out_batched = (True, True, tuple(True for _ in weights),
                       tuple(True for _ in biases))
        if all_b:
            nb = _pick_nb(axis_size, weights)
            out = _data_vg_blocked(
                xT, target, weights, biases, act, interpret, in_dtype, nb
            )
            return out, out_batched
        inner = lambda x_, t_, w_, b_: _data_vg_impl(
            x_, t_, w_, b_, act, interpret, in_dtype
        )
        bc1 = lambda a, b: a if b else jnp.broadcast_to(
            a[None], (axis_size,) + a.shape
        )
        # per-LEAF broadcast (ADVICE r3): a tuple with some layers batched
        # and some not must only lift the unbatched ones
        out = jax.vmap(inner)(
            bc1(xT, xb), bc1(target, tb),
            tuple(bc1(w, b) for w, b in zip(weights, wb)),
            tuple(bc1(b_, f) for b_, f in zip(biases, bb)),
        )
        return out, out_batched

    return vg


def data_vg(act_name, x, weights, biases, target):
    """(y_pred [n], rss, dW tuple, db tuple) with dW/db = d(rss/2)/d(.).

    ``x`` is a feature-major [m_pad, n] array (FeatX.xT). Weights/biases are
    one branch's tuples ([in_pad, out_pad] / [out_pad]). Under a vmap over
    a leading branch axis the custom_vmap rule dispatches to the
    branch-blocked kernel (full MXU tiles); unvmapped calls run the
    single-branch kernel.
    """
    interpret = FORCE == "interpret"
    in_dtype = None if interpret else "bfloat16"
    return _vg_for(act_name, interpret, in_dtype)(
        x, target, tuple(weights), tuple(biases)
    )
