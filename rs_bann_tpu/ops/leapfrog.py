"""Whole-trajectory chain-folded leapfrog kernel (Pallas TPU).

The dense flagship sweep's bound (BENCH r3/r4 ablations,
scripts/exp_chainfold*.py): every leapfrog step streams the branch
genotypes X from HBM twice per chain (forward + dW0 cotangent), ~16 GB per
sweep at the flagship shape — and per-step bookkeeping variants all land on
the same ~36-45 ms floor, so only removing the stream itself helps. A
branch's X tile is small ([m_pad, n] bf16, 512 KB at the flagship shape):
this kernel keeps it VMEM-RESIDENT for the ENTIRE trajectory — grid (G,),
one instance integrates all L leapfrog steps for all C chains of one
branch, with weights chain-stacked [C*out, in] so layer dots run full
128-row MXU tiles (a single chain's h=32 underfills 4x). X HBM traffic per
sweep drops from 2·C·L to 1 stream; one pallas launch replaces L.

The integrated density is the branch marginal log density
(models/density.py):

    ld(w, b) = prior(w, b) − err_prec · rss(w, b)/2
    prior_g  = −λ∘w (ridge / std_normal)  |  −λ∘sign(w) (lasso)

with per-coordinate step sizes ε (izmailov / dual-averaging / mass-matrix —
all arrive as arrays), so the kernel computes exactly the lean deferred-
accept body of samplers/hmc.make_hmc_step: L iterations of

    p += ε/2·g;  q += ε·p;  g = ∇ld(q);  p += ε/2·g

returning (q_L, p_L). Momentum sampling, Δ-Hamiltonian bookkeeping and the
Metropolis accept stay OUTSIDE (samplers/hmc.py) — the kernel is a pure
deterministic integrator, so exactness tests can diff it against the
autodiff scan step-for-step (interpret mode, f32).

Replaces the hot path of the reference's host-driven per-branch trajectory
(/root/reference/src/net/branch/branch_sampler.rs:1192-1299) on its flagship
multi-branch multi-chain workload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .branch_mlp import _act, _act_prime, _bd, _cast_for

# n is tiled inside the instance so activations stay VMEM-sized; X itself
# is resident whole. The kernel is LATENCY-bound on the ~7-dot dependency
# chain per (step, tile) — the largest tile that fits VMEM minimizes the
# chain count (measured 28.5 ms/sweep at 2048 vs 36.9 at 512 on the
# flagship shape).
_TILE_N = 4096


def _tile_n_dense():
    """Dense trajectory-kernel n tile (RS_BANN_TRAJ_TN overrides): 4096 is
    the measured flagship optimum at NB=1; NB=2 needs 2048 to fit the
    Mosaic scoped-value stack (r4: 4096 x nb=2 exceeded it by 112 KB)."""
    import os

    return int(os.environ.get("RS_BANN_TRAJ_TN", _TILE_N))


def _traj_kernel(act, n, L_steps, depth1, C, NB, in_dtype, l1, *refs):
    """Grid (G // NB,). Ref layout (leading size-NB branch block dim):
      in:  x [NB, m_pad, n], target [NB, C, n], err [NB, C, 1],
           w_l [NB, C*out, in] (hidden: transposed+chain-merged;
                output layer [NB, C*s, 1]),
           b_l [NB, C*out, 1] (hidden layers only),
           p_w_l, p_b_l        (momenta, same shapes),
           eps_w_l, eps_b_l    (per-coordinate step sizes, same shapes),
           lam_w_l, lam_b_l    (prior precision factors, same shapes)
      out: w_l, b_l, p_w_l, p_b_l (same shapes)

    NB > 1 packs several branches per instance with SEPARATE per-branch
    dots interleaved layer-by-layer: the single-branch kernel is
    LATENCY-bound on its ~7-dot dependency chain per leapfrog step, and
    consecutive independent dots (different branches, same layer) pipeline
    on the MXU.
    """
    L = depth1
    nw = L
    nbias = L - 1
    x_ref, t_ref, e_ref = refs[0], refs[1], refs[2]
    i = 3
    w_refs = refs[i : i + nw]; i += nw
    b_refs = refs[i : i + nbias]; i += nbias
    pw_refs = refs[i : i + nw]; i += nw
    pb_refs = refs[i : i + nbias]; i += nbias
    ew_refs = refs[i : i + nw]; i += nw
    eb_refs = refs[i : i + nbias]; i += nbias
    lw_refs = refs[i : i + nw]; i += nw
    lb_refs = refs[i : i + nbias]; i += nbias
    ow_refs = refs[i : i + nw]; i += nw
    ob_refs = refs[i : i + nbias]; i += nbias
    opw_refs = refs[i : i + nw]; i += nw
    opb_refs = refs[i : i + nbias]; i += nbias

    cast = _cast_for(in_dtype)
    tile = min(_tile_n_dense(), -(-n // 128) * 128)
    n_tiles = -(-n // tile)

    xs_all = [x_ref[b] for b in range(NB)]   # [m_pad, n], VMEM all L steps
    tgts = [t_ref[b] for b in range(NB)]     # [C, n]
    errs = [e_ref[b] for b in range(NB)]     # [C, 1]
    eps_w = [[ew_refs[l][b] for l in range(nw)] for b in range(NB)]
    eps_b = [[eb_refs[l][b] for l in range(nbias)] for b in range(NB)]
    lam_w = [[lw_refs[l][b] for l in range(nw)] for b in range(NB)]
    lam_b = [[lb_refs[l][b] for l in range(nbias)] for b in range(NB)]
    cs = w_refs[L - 1].shape[1]       # C*s_pad
    s_pad = cs // C

    def errE(b, co, i_):
        o = co // C
        return jnp.broadcast_to(
            errs[b][:, :, None], (C, o, i_)
        ).reshape(co, i_)

    def data_grad(ws, bs):
        """d(rss/2)/d(w, b) per (branch, chain), summed over n (tiled).
        ``ws[b][l]`` lists; per-layer loops run all NB branches'
        independent dots back-to-back for MXU pipelining. Tiles use EXACT
        widths (the last tile may be short) — the x/target blocks are
        whole-n, so every slice is real data and no lane masking is
        needed (a fixed-width mask against a clipped slice was the r4
        n % tile != 0 shape bug)."""
        B = range(NB)
        dws = [[jnp.zeros(w.shape, jnp.float32) for w in ws[b]] for b in B]
        dbs = [[jnp.zeros(x.shape, jnp.float32) for x in bs[b]] for b in B]
        bds = [
            [
                cast(_bd(
                    ws[b][l].reshape(C, ws[b][l].shape[0] // C,
                                     ws[b][l].shape[1]), C
                ))
                for l in range(1, L - 1)
            ]
            for b in B
        ]
        w0c = [cast(ws[b][0]) for b in B]
        w_out = [ws[b][L - 1] for b in B]  # [C*s, 1]
        for t in range(n_tiles):
            w_t = min(tile, n - t * tile)
            sl = slice(t * tile, t * tile + w_t)
            x = [cast(xs_all[b][:, sl]) for b in B]
            z = [
                jax.lax.dot_general(
                    w0c[b], x[b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bs[b][0]
                for b in B
            ]
            zs = [[z[b]] for b in B]
            acts = [[_act(act, z[b])] for b in B]
            for l in range(1, L - 1):
                z = [
                    jax.lax.dot_general(
                        bds[b][l - 1], cast(acts[b][-1]),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + bs[b][l]
                    for b in B
                ]
                for b in B:
                    zs[b].append(z[b])
                    acts[b].append(_act(act, z[b]))
            # NOTE (r5 attribution experiments): replacing this epilogue's
            # five [C*s, tile] VPU passes by three small MXU dots (pred /
            # dW_out / da as blockdiag(w_out) contractions) measured 15%
            # SLOWER (28.6 vs 24.8 ms/sweep) — the tiny-contraction f32
            # dots cost more than the VPU chain. Together with NB=2
            # interleaving (<=4%) and the activation swap (tanh->identity
            # 12%), the folded flagship kernel is BALANCED across MXU
            # issue, VPU elementwise and the per-step dependency chain —
            # no single >25% lever short of an architecture change.
            e_t = []
            for b in B:
                contrib = w_out[b] * acts[b][-1]             # [C*s, w_t]
                pred = jnp.sum(contrib.reshape(C, s_pad, w_t), axis=1)
                e_t.append(pred - tgts[b][:, sl])
            eE = [
                jnp.broadcast_to(
                    e_t[b][:, None, :], (C, s_pad, w_t)
                ).reshape(cs, w_t)
                for b in B
            ]
            for b in B:
                dws[b][L - 1] = dws[b][L - 1] + jnp.sum(
                    acts[b][-1] * eE[b], axis=1, keepdims=True
                )
            da = [w_out[b] * eE[b] for b in B]
            for l in range(L - 2, 0, -1):
                co, i_ = ws[0][l].shape
                o = co // C
                dz = [
                    da[b] * _act_prime(act, zs[b][l], acts[b][l]) for b in B
                ]
                for b in B:
                    dbs[b][l] = dbs[b][l] + jnp.sum(
                        dz[b], axis=1, keepdims=True
                    )
                # per-chain dW dots on sublane-aligned slices (lane-offset
                # slicing and scatter-add both fail Mosaic lowering; this
                # also skips block-diag cross waste) — all NB*C dots are
                # independent
                dzc = [cast(dz[b]) for b in B]
                ac = [cast(acts[b][l - 1]) for b in B]
                for b in B:
                    dws[b][l] = dws[b][l] + jnp.concatenate(
                        [
                            jax.lax.dot_general(
                                dzc[b][c * o : (c + 1) * o, :],
                                ac[b][c * i_ : (c + 1) * i_, :],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            for c in range(C)
                        ],
                        axis=0,
                    )
                da = [
                    jax.lax.dot_general(
                        bds[b][l - 1], dzc[b], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for b in B
                ]
            dz = [da[b] * _act_prime(act, zs[b][0], acts[b][0]) for b in B]
            for b in B:
                dbs[b][0] = dbs[b][0] + jnp.sum(dz[b], axis=1, keepdims=True)
            for b in B:
                dws[b][0] = dws[b][0] + jax.lax.dot_general(
                    cast(dz[b]), x[b], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        return dws, dbs

    def ld_grad(ws, bs):
        """∇ of the branch marginal log density (prior − err·rss/2)."""
        dws, dbs = data_grad(ws, bs)
        gw = [
            [
                (-lam_w[b][l] * (jnp.sign(ws[b][l]) if l1 else ws[b][l]))
                - errE(b, *ws[b][l].shape) * dws[b][l]
                for l in range(nw)
            ]
            for b in range(NB)
        ]
        gb = [
            [
                (-lam_b[b][l] * (jnp.sign(bs[b][l]) if l1 else bs[b][l]))
                - errE(b, *bs[b][l].shape) * dbs[b][l]
                for l in range(nbias)
            ]
            for b in range(NB)
        ]
        return gw, gb

    ws0 = [[w_refs[l][b].astype(jnp.float32) for l in range(nw)]
           for b in range(NB)]
    bs0 = [[b_refs[l][b].astype(jnp.float32) for l in range(nbias)]
           for b in range(NB)]
    pws0 = [[pw_refs[l][b].astype(jnp.float32) for l in range(nw)]
            for b in range(NB)]
    pbs0 = [[pb_refs[l][b].astype(jnp.float32) for l in range(nbias)]
            for b in range(NB)]
    gws0, gbs0 = ld_grad(ws0, bs0)

    def upd(xs, es, gs, frac):
        return [
            [x + frac * e * g for x, e, g in zip(xs[b], es[b], gs[b])]
            for b in range(NB)
        ]

    def step(_, carry):
        ws, bs, pws, pbs, gws, gbs = carry
        pws = upd(pws, eps_w, gws, 0.5)
        pbs = upd(pbs, eps_b, gbs, 0.5)
        ws = upd(ws, eps_w, pws, 1.0)
        bs = upd(bs, eps_b, pbs, 1.0)
        gws, gbs = ld_grad(ws, bs)
        pws = upd(pws, eps_w, gws, 0.5)
        pbs = upd(pbs, eps_b, gbs, 0.5)
        return (ws, bs, pws, pbs, gws, gbs)

    ws, bs, pws, pbs, _, _ = jax.lax.fori_loop(
        0, L_steps, step, (ws0, bs0, pws0, pbs0, gws0, gbs0)
    )
    for l in range(nw):
        for b in range(NB):
            ow_refs[l][b, :, :] = ws[b][l]
            opw_refs[l][b, :, :] = pws[b][l]
    for l in range(nbias):
        for b in range(NB):
            ob_refs[l][b, :, :] = bs[b][l]
            opb_refs[l][b, :, :] = pbs[b][l]


def _merge_wt(w):  # [G, C, in, out] -> [G, C*out, in]
    G, C, i, o = w.shape
    return jnp.swapaxes(w, 2, 3).reshape(G, C * o, i)


def _unmerge_wt(m, like):  # [G, C*out, in] -> [G, C, in, out]
    G, C, i, o = like.shape
    return jnp.swapaxes(m.reshape(G, C, o, i), 2, 3)


def fold_enabled() -> bool:
    """RS_BANN_FOLD=off kill switch for the whole-trajectory kernels.

    Consulted by models/net.chain_fold_eligible AND by the custom_vmap
    chain rule in samplers/hmc.make_transition_batch (ADVICE r4: the
    sharded sweep always chain-vmaps, so the rule itself must honor the
    switch or mesh runs would keep the folded kernel with the switch off).
    """
    import os

    return os.environ.get("RS_BANN_FOLD", "").lower() not in (
        "0", "off", "false",
    )


# VMEM budget for the trajectory kernel's resident X block (ADVICE r4): the
# in_specs declare the whole [m_pad, n] xT per branch instance, so an
# oversized dense config would pass eligibility and then fail Mosaic
# compilation at runtime. ~16 MB VMEM/core minus ~6 MB of working arrays
# (activations/backprop tiles at _TILE_N) leaves ~10 MB for X + targets.
_X_VMEM_BUDGET = 9 * 2**20


def x_fits_vmem(m_pad: int, n: int, C: int = 1, itemsize: int = 2) -> bool:
    """True when one branch's resident X block (+ per-chain targets) fits
    the trajectory kernel's VMEM budget. ``itemsize`` 2 = bf16 storage."""
    m_sub = -(-m_pad // 16) * 16  # bf16 sublane-tile padding
    return m_sub * n * itemsize + C * n * 4 <= _X_VMEM_BUDGET


# branches per pallas instance: the single-branch kernel is latency-bound
# on its per-step dot dependency chain, and NB independent branches' dots
# interleave layer-by-layer. VMEM per instance scales with NB (X + four
# [C*out, tile] activation/backprop arrays per branch). Default 1 = the
# TPU-measured configuration (651k steps/s flagship); NB=2 passes the
# interpret-mode exactness tests and awaits an on-chip measurement
# (override with RS_BANN_TRAJ_NB).
NB_DEFAULT = 1


def _pick_nb_traj(G, m_pad, n, C, out_max):
    import os

    nb = int(os.environ.get("RS_BANN_TRAJ_NB", NB_DEFAULT))
    while nb > 1 and G % nb:
        nb -= 1
    # scoped-VMEM guard: Mosaic's kernel value stack is limited to 16 MB
    # (measured: flagship C=4/h=32/tile=4096 at nb=2 exceeds it by 112 KB;
    # RS_BANN_TRAJ_TN=2048 makes nb=2 fit there). ~6 live
    # [C*out, tile] f32 working arrays per branch.
    tile = min(_tile_n_dense(), -(-n // 128) * 128)
    per_branch = 6 * C * max(out_max, 8) * tile * 4
    while nb > 1 and nb * per_branch > 14 * 2**20:
        nb -= 1
    return nb


@functools.partial(
    jax.jit,
    static_argnames=("act", "L_steps", "interpret", "in_dtype", "l1", "C",
                     "nb"),
)
def _traj_chains_impl(
    xT, targets, err, weights, biases, p_w, p_b, eps_w, eps_b, lam_w, lam_b,
    act, L_steps, interpret, in_dtype, l1, C, nb,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, m_pad, n = xT.shape
    L = len(weights)

    def prep_w(ts):
        return tuple(_merge_wt(t) for t in ts[: L - 1]) + (
            ts[L - 1].reshape(G, -1, 1),
        )

    def prep_b(ts):
        return tuple(t.reshape(G, -1, 1) for t in ts)

    wm, pm, em, lm = (prep_w(t) for t in (weights, p_w, eps_w, lam_w))
    bm, pbm, ebm, lbm = (prep_b(t) for t in (biases, p_b, eps_b, lam_b))
    em3 = err.reshape(G, C, 1) if err.ndim > 1 else jnp.broadcast_to(
        err.reshape(1, 1, 1), (G, C, 1)
    )

    const3 = lambda shape: pl.BlockSpec(
        (nb,) + shape, lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    operands = (
        [xT, targets, em3]
        + list(wm) + list(bm) + list(pm) + list(pbm)
        + list(em) + list(ebm) + list(lm) + list(lbm)
    )
    in_specs = [const3(a.shape[1:]) for a in operands]
    out_arrs = list(wm) + list(bm) + list(pm) + list(pbm)
    out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in out_arrs]
    out_specs = [const3(a.shape[1:]) for a in out_arrs]

    kern = functools.partial(
        _traj_kernel, act, n, L_steps, L, C, nb, in_dtype, l1
    )
    res = pl.pallas_call(
        kern,
        grid=(G // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*operands)

    nw, nb_ = L, L - 1
    w_f = tuple(
        _unmerge_wt(res[l], weights[l]) for l in range(L - 1)
    ) + (res[L - 1].reshape(weights[-1].shape),)
    b_f = tuple(res[nw + l].reshape(biases[l].shape) for l in range(nb_))
    pw_f = tuple(
        _unmerge_wt(res[nw + nb_ + l], weights[l]) for l in range(L - 1)
    ) + (res[nw + nb_ + L - 1].reshape(weights[-1].shape),)
    pb_f = tuple(
        res[2 * nw + nb_ + l].reshape(biases[l].shape) for l in range(nb_)
    )
    return w_f, b_f, pw_f, pb_f


# ------------------------------------------- packed-genotype variant
#
# The production genome-scale recipe stores X as 2-bit packed bed bytes
# (ops/packed_matmul.py group-strided layout) — 16x smaller than f32, 4x
# smaller than the bf16 dense blocks above. The per-step fused packed kernel
# (ops/branch_mlp._blocked_packed_kernel) still re-streams a branch's bytes
# from HBM once per leapfrog step per chain, and its (G/NB, B/128) grid pays
# a sequential grid-step latency per 512 individuals — the measured bound of
# the hybrid sweep at n=100k (BENCH r4: stream-bound at 10.3k steps/s).
# This kernel is the packed analog of _traj_kernel: one branch's bytes stay
# VMEM-RESIDENT for the whole trajectory (all L steps x C chains), decoded
# and standardized tile-by-tile in-kernel right before each MXU dot.
#
# Decode order: _kernel_decode_part(b, q) of a byte tile yields the q-th
# 128-individual quarter of each 512-individual group — column (q, bytecol)
# is individual (bytecol//128)*512 + q*128 + bytecol%128. Rather than
# re-interleave in-kernel (a Mosaic relayout), the CALLER permutes the
# targets into this part-major order once per call (_part_perm); every
# reduction over individuals is order-invariant and the kernel returns only
# (q, p) states, so nothing needs un-permuting.
#
# Standardization ((g - mu) * scale) is applied to the decoded tile directly
# (two VPU ops) instead of the per-step kernels' fold-into-W0 — the weights
# change every leapfrog step here, so folding would cost a [C*out, m]
# rescale per step for the same arithmetic.
#
# Matches the reference's intended genome-scale workload
# (/root/reference/scripts/sim_random_phen.r:7-16) on the hot loop of
# branch_sampler.rs:1192-1299.

# byte-columns per tile: each of the 4 parts of a tile decodes to a
# [m_pad, tile_b] genotype chunk, so the per-dot lane width is tile_b and
# the 4 parts' dots interleave as independent work (same latency-hiding as
# NB>1 branch instances).
_TILE_B = 2048


def _traj_kernel_packed(
    act, n, B_bytes, L_steps, depth1, C, NB, in_dtype, l1, tile_b, *refs
):
    """Grid (G // NB,). Ref layout (leading size-NB branch block dim):
      in:  bytes [NB, m_pad, B] uint8 (group-strided, VMEM all L steps;
           B a multiple of tile_b — caller pads with 0x55 = four 01 codes),
           scale [NB, m_pad, 1] f32 (1/sigma; 0 on padded markers),
           off   [NB, m_pad, 1] f32 (mu/sigma),
           target [NB, C, 4*B] f32 (part-major permuted, zero-padded past n),
           err [NB, C, 1],
           then weights/biases/momenta/step sizes/precision factors and
           outputs exactly as _traj_kernel.

    The tile loop is a lax.fori_loop with pl.ds ref slices, NOT a Python
    unroll: Mosaic's scoped-value stack is charged for every unrolled
    iteration's live set summed (measured: 13 unrolled tiles at the n=100k
    genome shape wanted 31.7 MB against the 16 MB/core VMEM), while a fori
    body is charged once.
    """
    L = depth1
    nw = L
    nbias = L - 1
    x_ref, sc_ref, of_ref, t_ref, e_ref = refs[:5]
    i = 5
    w_refs = refs[i : i + nw]; i += nw
    b_refs = refs[i : i + nbias]; i += nbias
    pw_refs = refs[i : i + nw]; i += nw
    pb_refs = refs[i : i + nbias]; i += nbias
    ew_refs = refs[i : i + nw]; i += nw
    eb_refs = refs[i : i + nbias]; i += nbias
    lw_refs = refs[i : i + nw]; i += nw
    lb_refs = refs[i : i + nbias]; i += nbias
    ow_refs = refs[i : i + nw]; i += nw
    ob_refs = refs[i : i + nbias]; i += nbias
    opw_refs = refs[i : i + nw]; i += nw
    opb_refs = refs[i : i + nbias]; i += nbias

    from jax.experimental import pallas as pl

    from .packed_matmul import _kernel_decode_part

    cast = _cast_for(in_dtype)
    assert B_bytes % tile_b == 0
    n_tiles = B_bytes // tile_b
    need_mask = n != 4 * B_bytes

    scales = [sc_ref[b] for b in range(NB)]
    offs = [of_ref[b] for b in range(NB)]
    errs = [e_ref[b] for b in range(NB)]       # [C, 1]
    eps_w = [[ew_refs[l][b] for l in range(nw)] for b in range(NB)]
    eps_b = [[eb_refs[l][b] for l in range(nbias)] for b in range(NB)]
    lam_w = [[lw_refs[l][b] for l in range(nw)] for b in range(NB)]
    lam_b = [[lb_refs[l][b] for l in range(nbias)] for b in range(NB)]
    cs = w_refs[L - 1].shape[1]  # C*s_pad
    s_pad = cs // C

    def errE(b, co, i_):
        o = co // C
        return jnp.broadcast_to(
            errs[b][:, :, None], (C, o, i_)
        ).reshape(co, i_)

    def data_grad(ws, bs):
        """d(rss/2)/d(w, b) per (branch, chain), summed over individuals.
        The virtual-instance axis is (branch, part): the 4 decode parts of a
        byte tile are independent column sets of the same branch, so their
        dots interleave exactly like NB>1 branch instances, accumulating
        into the same per-branch cotangent."""
        B = range(NB)
        insts = [(b, q) for b in B for q in range(4)]
        bds = [
            [
                cast(_bd(
                    ws[b][l].reshape(C, ws[b][l].shape[0] // C,
                                     ws[b][l].shape[1]), C
                ))
                for l in range(1, L - 1)
            ]
            for b in B
        ]
        w0c = [cast(ws[b][0]) for b in B]
        w_out = [ws[b][L - 1] for b in B]  # [C*s, 1]

        def tile_body(t, carry):
            dws_fl, dbs_fl = carry
            dws = [list(dws_fl[b]) for b in B]
            dbs = [list(dbs_fl[b]) for b in B]
            start = t * tile_b
            b_i32 = [
                x_ref[b, :, pl.ds(start, tile_b)].astype(jnp.int32)
                for b in B
            ]
            if need_mask:
                # column (q, bytecol) is individual g*512 + q*128 + j with
                # g = bytecol//128, j = bytecol%128; pack padding (last
                # group) and tile padding (bytecol >= true B) both map to
                # indices >= n
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_b), 1)
                bc = start + lane
                base_ix = (bc >> 7) * 512 + (bc & 127)
            # decode + standardize each part: x = dec*scale - mu*scale
            # (padded markers have scale 0 -> exactly 0, like dense rows)
            x = [
                cast(_kernel_decode_part(b_i32[b], q) * scales[b] - offs[b])
                for (b, q) in insts
            ]
            z = [
                jax.lax.dot_general(
                    w0c[b], x[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bs[b][0]
                for k, (b, q) in enumerate(insts)
            ]
            zs = [[zk] for zk in z]
            acts = [[_act(act, zk)] for zk in z]
            for l in range(1, L - 1):
                z = [
                    jax.lax.dot_general(
                        bds[b][l - 1], cast(acts[k][-1]),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + bs[b][l]
                    for k, (b, q) in enumerate(insts)
                ]
                for k in range(len(insts)):
                    zs[k].append(z[k])
                    acts[k].append(_act(act, z[k]))
            e_t = []
            for k, (b, q) in enumerate(insts):
                contrib = w_out[b] * acts[k][-1]             # [C*s, TB]
                pred = jnp.sum(contrib.reshape(C, s_pad, tile_b), axis=1)
                tgt_k = t_ref[b, :, pl.ds(q * B_bytes + start, tile_b)]
                err_k = pred - tgt_k
                if need_mask:
                    err_k = jnp.where(base_ix + q * 128 < n, err_k, 0.0)
                e_t.append(err_k)
            eE = [
                jnp.broadcast_to(
                    e_t[k][:, None, :], (C, s_pad, tile_b)
                ).reshape(cs, tile_b)
                for k in range(len(insts))
            ]
            for k, (b, q) in enumerate(insts):
                dws[b][L - 1] = dws[b][L - 1] + jnp.sum(
                    acts[k][-1] * eE[k], axis=1, keepdims=True
                )
            da = [w_out[b] * eE[k] for k, (b, q) in enumerate(insts)]
            for l in range(L - 2, 0, -1):
                co, i_ = ws[0][l].shape
                o = co // C
                dz = [
                    da[k] * _act_prime(act, zs[k][l], acts[k][l])
                    for k in range(len(insts))
                ]
                for k, (b, q) in enumerate(insts):
                    dbs[b][l] = dbs[b][l] + jnp.sum(
                        dz[k], axis=1, keepdims=True
                    )
                dzc = [cast(d) for d in dz]
                ac = [cast(acts[k][l - 1]) for k in range(len(insts))]
                for k, (b, q) in enumerate(insts):
                    dws[b][l] = dws[b][l] + jnp.concatenate(
                        [
                            jax.lax.dot_general(
                                dzc[k][c * o : (c + 1) * o, :],
                                ac[k][c * i_ : (c + 1) * i_, :],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            for c in range(C)
                        ],
                        axis=0,
                    )
                da = [
                    jax.lax.dot_general(
                        bds[b][l - 1], dzc[k], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for k, (b, q) in enumerate(insts)
                ]
            dz = [
                da[k] * _act_prime(act, zs[k][0], acts[k][0])
                for k in range(len(insts))
            ]
            for k, (b, q) in enumerate(insts):
                dbs[b][0] = dbs[b][0] + jnp.sum(dz[k], axis=1, keepdims=True)
            for k, (b, q) in enumerate(insts):
                dws[b][0] = dws[b][0] + jax.lax.dot_general(
                    cast(dz[k]), x[k], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return (
                tuple(tuple(d) for d in dws),
                tuple(tuple(d) for d in dbs),
            )

        init = (
            tuple(
                tuple(jnp.zeros(w.shape, jnp.float32) for w in ws[b])
                for b in B
            ),
            tuple(
                tuple(jnp.zeros(x.shape, jnp.float32) for x in bs[b])
                for b in B
            ),
        )
        dws_fl, dbs_fl = jax.lax.fori_loop(0, n_tiles, tile_body, init)
        return [list(t) for t in dws_fl], [list(t) for t in dbs_fl]

    def ld_grad(ws, bs):
        dws, dbs = data_grad(ws, bs)
        gw = [
            [
                (-lam_w[b][l] * (jnp.sign(ws[b][l]) if l1 else ws[b][l]))
                - errE(b, *ws[b][l].shape) * dws[b][l]
                for l in range(nw)
            ]
            for b in range(NB)
        ]
        gb = [
            [
                (-lam_b[b][l] * (jnp.sign(bs[b][l]) if l1 else bs[b][l]))
                - errE(b, *bs[b][l].shape) * dbs[b][l]
                for l in range(nbias)
            ]
            for b in range(NB)
        ]
        return gw, gb

    ws0 = [[w_refs[l][b].astype(jnp.float32) for l in range(nw)]
           for b in range(NB)]
    bs0 = [[b_refs[l][b].astype(jnp.float32) for l in range(nbias)]
           for b in range(NB)]
    pws0 = [[pw_refs[l][b].astype(jnp.float32) for l in range(nw)]
            for b in range(NB)]
    pbs0 = [[pb_refs[l][b].astype(jnp.float32) for l in range(nbias)]
            for b in range(NB)]
    gws0, gbs0 = ld_grad(ws0, bs0)

    def upd(xs, es, gs, frac):
        return [
            [x + frac * e * g for x, e, g in zip(xs[b], es[b], gs[b])]
            for b in range(NB)
        ]

    def step(_, carry):
        ws, bs, pws, pbs, gws, gbs = carry
        pws = upd(pws, eps_w, gws, 0.5)
        pbs = upd(pbs, eps_b, gbs, 0.5)
        ws = upd(ws, eps_w, pws, 1.0)
        bs = upd(bs, eps_b, pbs, 1.0)
        gws, gbs = ld_grad(ws, bs)
        pws = upd(pws, eps_w, gws, 0.5)
        pbs = upd(pbs, eps_b, gbs, 0.5)
        return (ws, bs, pws, pbs, gws, gbs)

    ws, bs, pws, pbs, _, _ = jax.lax.fori_loop(
        0, L_steps, step, (ws0, bs0, pws0, pbs0, gws0, gbs0)
    )
    for l in range(nw):
        for b in range(NB):
            ow_refs[l][b, :, :] = ws[b][l]
            opw_refs[l][b, :, :] = pws[b][l]
    for l in range(nbias):
        for b in range(NB):
            ob_refs[l][b, :, :] = bs[b][l]
            opb_refs[l][b, :, :] = pbs[b][l]


def _traj_kernel_packed_stream(
    act, n, B_pad, L_steps, depth1, C, NB, in_dtype, l1, tile_b, n_tiles,
    *refs,
):
    """Grid-streamed packed trajectory kernel: grid (G//NB, L+1, n_tiles).

    For shapes whose byte block exceeds VMEM (UKB-460k: 11.5 MB/branch),
    the bytes stay in HBM and Pallas's grid pipeline streams one
    [NB, m_pad, tile_b] byte tile (plus the matching part-major target
    tile) per grid step with built-in double buffering — while the
    integration STATE (chain-merged weights, biases, momenta, the carried
    log-density gradient and the per-step data-gradient accumulators)
    persists in VMEM scratch across the whole (l, t) sub-grid of a branch
    block. One X stream per leapfrog step shared by all C chains — the
    per-step path streams (and separately launches) per chain per step.

    Leapfrog staging over the grid (l = 0 computes the initial gradient
    only; steps are l = 1..L):
      (l>0, t==0):  p += eps/2·g;  q += eps·p;  zero the accumulators
      every (l, t): accumulate d(rss/2)/d(theta) of tile t at the current q
      (l, t==last): g = prior(q) − err·accum;  if l>0: p += eps/2·g
      (l==L, t==last): write q, p to the outputs
    Same math as _traj_kernel_packed, so the same exactness tests bind.
    """
    from jax.experimental import pallas as pl

    from .packed_matmul import _kernel_decode_part

    L = depth1
    nw = L
    nbias = L - 1
    x_ref, sc_ref, of_ref, t_ref, e_ref = refs[:5]
    i = 5
    w_refs = refs[i : i + nw]; i += nw
    b_refs = refs[i : i + nbias]; i += nbias
    pw_refs = refs[i : i + nw]; i += nw
    pb_refs = refs[i : i + nbias]; i += nbias
    ew_refs = refs[i : i + nw]; i += nw
    eb_refs = refs[i : i + nbias]; i += nbias
    lw_refs = refs[i : i + nw]; i += nw
    lb_refs = refs[i : i + nbias]; i += nbias
    ow_refs = refs[i : i + nw]; i += nw
    ob_refs = refs[i : i + nbias]; i += nbias
    opw_refs = refs[i : i + nw]; i += nw
    opb_refs = refs[i : i + nbias]; i += nbias
    # scratch: per branch-in-block, per kind, per layer
    # layout: for b: [w(L), bias(L-1), pw(L), pb(L-1), gw(L), gb(L-1),
    #                 aw(L), ab(L-1)]
    scr = refs[i:]
    stride = 4 * nw + 4 * nbias

    def sref(b, kind, l):
        off_k = {
            "w": 0, "bias": nw, "pw": nw + nbias, "pb": 2 * nw + nbias,
            "gw": 2 * (nw + nbias), "gb": 3 * nw + 2 * nbias,
            "aw": 3 * (nw + nbias), "ab": 4 * nw + 3 * nbias,
        }[kind]
        return scr[b * stride + off_k + l]

    cast = _cast_for(in_dtype)
    l_ix = pl.program_id(1)
    t = pl.program_id(2)
    need_mask = n != 4 * B_pad
    B = range(NB)
    insts = [(b, q) for b in B for q in range(4)]
    cs = w_refs[L - 1].shape[1]
    s_pad = cs // C

    errs = [e_ref[b] for b in range(NB)]

    def errE(b, co, i_):
        o = co // C
        return jnp.broadcast_to(
            errs[b][:, :, None], (C, o, i_)
        ).reshape(co, i_)

    @pl.when((l_ix == 0) & (t == 0))
    def _():
        for b in B:
            for l in range(nw):
                sref(b, "w", l)[:] = w_refs[l][b].astype(jnp.float32)
                sref(b, "pw", l)[:] = pw_refs[l][b].astype(jnp.float32)
            for l in range(nbias):
                sref(b, "bias", l)[:] = b_refs[l][b].astype(jnp.float32)
                sref(b, "pb", l)[:] = pb_refs[l][b].astype(jnp.float32)

    @pl.when((l_ix > 0) & (t == 0))
    def _():
        for b in B:
            for l in range(nw):
                e = ew_refs[l][b]
                sref(b, "pw", l)[:] += 0.5 * e * sref(b, "gw", l)[:]
                sref(b, "w", l)[:] += e * sref(b, "pw", l)[:]
            for l in range(nbias):
                e = eb_refs[l][b]
                sref(b, "pb", l)[:] += 0.5 * e * sref(b, "gb", l)[:]
                sref(b, "bias", l)[:] += e * sref(b, "pb", l)[:]

    @pl.when(t == 0)
    def _():
        for b in B:
            for l in range(nw):
                sref(b, "aw", l)[:] = jnp.zeros_like(sref(b, "aw", l))
            for l in range(nbias):
                sref(b, "ab", l)[:] = jnp.zeros_like(sref(b, "ab", l))

    # ---- accumulate tile t's data gradient at the current state
    ws = [[sref(b, "w", l)[:] for l in range(nw)] for b in B]
    bs = [[sref(b, "bias", l)[:] for l in range(nbias)] for b in B]
    bds = [
        [
            cast(_bd(
                ws[b][l].reshape(C, ws[b][l].shape[0] // C,
                                 ws[b][l].shape[1]), C
            ))
            for l in range(1, L - 1)
        ]
        for b in B
    ]
    w0c = [cast(ws[b][0]) for b in B]
    w_out = [ws[b][L - 1] for b in B]

    b_i32 = [x_ref[b].astype(jnp.int32) for b in B]  # [m_pad, tile_b] block
    scales = [sc_ref[b] for b in B]
    offs = [of_ref[b] for b in B]
    if need_mask:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_b), 1)
        bc = t * tile_b + lane
        base_ix = (bc >> 7) * 512 + (bc & 127)
    x = [
        cast(_kernel_decode_part(b_i32[b], q) * scales[b] - offs[b])
        for (b, q) in insts
    ]
    z = [
        jax.lax.dot_general(
            w0c[b], x[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bs[b][0]
        for k, (b, q) in enumerate(insts)
    ]
    zs = [[zk] for zk in z]
    acts = [[_act(act, zk)] for zk in z]
    for l in range(1, L - 1):
        z = [
            jax.lax.dot_general(
                bds[b][l - 1], cast(acts[k][-1]), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bs[b][l]
            for k, (b, q) in enumerate(insts)
        ]
        for k in range(len(insts)):
            zs[k].append(z[k])
            acts[k].append(_act(act, z[k]))
    e_t = []
    for k, (b, q) in enumerate(insts):
        contrib = w_out[b] * acts[k][-1]
        pred = jnp.sum(contrib.reshape(C, s_pad, tile_b), axis=1)
        err_k = pred - t_ref[b, q]  # target block [NB, 4, C, tile_b]
        if need_mask:
            err_k = jnp.where(base_ix + q * 128 < n, err_k, 0.0)
        e_t.append(err_k)
    eE = [
        jnp.broadcast_to(
            e_t[k][:, None, :], (C, s_pad, tile_b)
        ).reshape(cs, tile_b)
        for k in range(len(insts))
    ]
    for k, (b, q) in enumerate(insts):
        sref(b, "aw", L - 1)[:] += jnp.sum(
            acts[k][-1] * eE[k], axis=1, keepdims=True
        )
    da = [w_out[b] * eE[k] for k, (b, q) in enumerate(insts)]
    for l in range(L - 2, 0, -1):
        co, i_ = ws[0][l].shape
        o = co // C
        dz = [
            da[k] * _act_prime(act, zs[k][l], acts[k][l])
            for k in range(len(insts))
        ]
        for k, (b, q) in enumerate(insts):
            sref(b, "ab", l)[:] += jnp.sum(dz[k], axis=1, keepdims=True)
        dzc = [cast(d) for d in dz]
        ac = [cast(acts[k][l - 1]) for k in range(len(insts))]
        for k, (b, q) in enumerate(insts):
            sref(b, "aw", l)[:] += jnp.concatenate(
                [
                    jax.lax.dot_general(
                        dzc[k][c * o : (c + 1) * o, :],
                        ac[k][c * i_ : (c + 1) * i_, :],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for c in range(C)
                ],
                axis=0,
            )
        da = [
            jax.lax.dot_general(
                bds[b][l - 1], dzc[k], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for k, (b, q) in enumerate(insts)
        ]
    dz = [
        da[k] * _act_prime(act, zs[k][0], acts[k][0])
        for k in range(len(insts))
    ]
    for k, (b, q) in enumerate(insts):
        sref(b, "ab", 0)[:] += jnp.sum(dz[k], axis=1, keepdims=True)
    for k, (b, q) in enumerate(insts):
        sref(b, "aw", 0)[:] += jax.lax.dot_general(
            cast(dz[k]), x[k], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == n_tiles - 1)
    def _():
        for b in B:
            for l in range(nw):
                w_l = sref(b, "w", l)[:]
                lam = lw_refs[l][b]
                g = (
                    -lam * (jnp.sign(w_l) if l1 else w_l)
                    - errE(b, *w_l.shape) * sref(b, "aw", l)[:]
                )
                sref(b, "gw", l)[:] = g
            for l in range(nbias):
                b_l = sref(b, "bias", l)[:]
                lam = lb_refs[l][b]
                g = (
                    -lam * (jnp.sign(b_l) if l1 else b_l)
                    - errE(b, *b_l.shape) * sref(b, "ab", l)[:]
                )
                sref(b, "gb", l)[:] = g

    @pl.when((l_ix > 0) & (t == n_tiles - 1))
    def _():
        for b in B:
            for l in range(nw):
                sref(b, "pw", l)[:] += (
                    0.5 * ew_refs[l][b] * sref(b, "gw", l)[:]
                )
            for l in range(nbias):
                sref(b, "pb", l)[:] += (
                    0.5 * eb_refs[l][b] * sref(b, "gb", l)[:]
                )

    @pl.when((l_ix == L_steps) & (t == n_tiles - 1))
    def _():
        for b in B:
            for l in range(nw):
                ow_refs[l][b, :, :] = sref(b, "w", l)[:]
                opw_refs[l][b, :, :] = sref(b, "pw", l)[:]
            for l in range(nbias):
                ob_refs[l][b, :, :] = sref(b, "bias", l)[:]
                opb_refs[l][b, :, :] = sref(b, "pb", l)[:]


def _part_perm(B_bytes: int):
    """Natural-order individual index for each part-major column: column
    q*B + bytecol of the permuted target is individual
    (bytecol//128)*512 + q*128 + bytecol%128 (ops/packed_matmul strided
    layout)."""
    import numpy as np

    bc = np.arange(B_bytes)
    base = (bc // 128) * 512 + (bc % 128)
    return np.concatenate([base + q * 128 for q in range(4)])


def packed_fits_vmem(m_pad: int, B_bytes: int, C: int = 1) -> bool:
    """True when one branch's resident byte block (+ per-chain part-major
    targets) fits the trajectory kernel's VMEM budget. int8 sublane tile is
    32; the byte lane dim is already a multiple of 128."""
    m_sub = -(-m_pad // 32) * 32
    return m_sub * B_bytes + C * 4 * B_bytes * 4 <= _X_VMEM_BUDGET


def _pick_nb_packed(G, m_pad, B_bytes, C, out_max, tile_b):
    """(nb, tile_b) under the ~14 MB Mosaic scoped-value budget. Per branch
    instance the live set is: the resident bytes + targets, the 4 decoded
    (and standardized) [m_sub, tile_b] f32 part chunks — all four stay live
    through a tile iteration for the dW0 dots — and ~6 [C*out, tile_b] f32
    working arrays per part instance. Shrinks tile_b before giving up nb."""
    import os

    nb = int(os.environ.get("RS_BANN_TRAJ_NB", NB_DEFAULT))
    while nb > 1 and G % nb:
        nb -= 1
    m_sub = -(-m_pad // 32) * 32

    def per_branch(tb):
        return (
            4 * m_sub * tb * 4
            + 4 * 6 * C * max(out_max, 8) * tb * 4
            + m_sub * B_bytes + C * 4 * B_bytes * 4
        )

    while nb > 1 and nb * per_branch(tile_b) > 14 * 2**20:
        nb -= 1
    while tile_b > 512 and nb * per_branch(tile_b) > 14 * 2**20:
        tile_b //= 2
    return nb, tile_b


def _pick_nb_stream(G, m_pad, C, out_max, tile_b):
    """(nb, tile_b) for the grid-streamed variant: only the per-tile
    working set and the pipelined input blocks live in VMEM (the byte block
    itself streams), so the budget is independent of B."""
    import os

    nb = int(os.environ.get("RS_BANN_TRAJ_NB", NB_DEFAULT))
    while nb > 1 and G % nb:
        nb -= 1
    m_sub = -(-m_pad // 32) * 32

    def per_branch(tb):
        return (
            4 * m_sub * tb * 4
            + 4 * 6 * C * max(out_max, 8) * tb * 4
            + 2 * (m_sub * tb + 4 * C * tb * 4)
        )

    while nb > 1 and nb * per_branch(tile_b) > 12 * 2**20:
        nb -= 1
    while tile_b > 512 and nb * per_branch(tile_b) > 12 * 2**20:
        tile_b //= 2
    return nb, tile_b


@functools.partial(
    jax.jit,
    static_argnames=("act", "L_steps", "interpret", "in_dtype", "l1", "C",
                     "nb", "n", "tile_b"),
)
def _traj_chains_packed_stream_impl(
    bytes_g, scale, off, targets_part, err, weights, biases, p_w, p_b,
    eps_w, eps_b, lam_w, lam_b,
    act, L_steps, interpret, in_dtype, l1, C, nb, n, tile_b,
):
    """``targets_part`` [G, 4, C, B_pad]: part-major with the part axis
    explicit so one BlockSpec tile carries all 4 parts of a byte tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, m_pad, B_pad = bytes_g.shape
    L = len(weights)
    n_tiles = B_pad // tile_b

    def prep_w(ts):
        return tuple(_merge_wt(t) for t in ts[: L - 1]) + (
            ts[L - 1].reshape(G, -1, 1),
        )

    def prep_b(ts):
        return tuple(t.reshape(G, -1, 1) for t in ts)

    wm, pm, em, lm = (prep_w(t) for t in (weights, p_w, eps_w, lam_w))
    bm, pbm, ebm, lbm = (prep_b(t) for t in (biases, p_b, eps_b, lam_b))
    em3 = err.reshape(G, C, 1) if err.ndim > 1 else jnp.broadcast_to(
        err.reshape(1, 1, 1), (G, C, 1)
    )

    const3 = lambda shape: pl.BlockSpec(
        (nb,) + shape, lambda g, l, t: (g, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [
            pl.BlockSpec((nb, m_pad, tile_b), lambda g, l, t: (g, 0, t),
                         memory_space=pltpu.VMEM),
            const3(scale.shape[1:] + (1,)),
            const3(off.shape[1:] + (1,)),
            pl.BlockSpec((nb, 4, C, tile_b), lambda g, l, t: (g, 0, 0, t),
                         memory_space=pltpu.VMEM),
            const3((C, 1)),
        ]
        + [const3(a.shape[1:]) for a in (
            list(wm) + list(bm) + list(pm) + list(pbm)
            + list(em) + list(ebm) + list(lm) + list(lbm)
        )]
    )
    out_arrs = list(wm) + list(bm) + list(pm) + list(pbm)
    out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in out_arrs]
    out_specs = [const3(a.shape[1:]) for a in out_arrs]
    # scratch per branch-in-block, order matching the kernel's sref layout:
    # w(L), bias(L-1), pw(L), pb(L-1), gw(L), gb(L-1), aw(L), ab(L-1)
    w_shapes = [a.shape[1:] for a in wm]
    b_shapes = [a.shape[1:] for a in bm]
    scratch = []
    for _b in range(nb):
        for _kind in range(4):  # (w, pw, gw, aw) each followed by its bias
            scratch += [pltpu.VMEM(s, jnp.float32) for s in w_shapes]
            scratch += [pltpu.VMEM(s, jnp.float32) for s in b_shapes]

    kern = functools.partial(
        _traj_kernel_packed_stream, act, n, B_pad, L_steps, L, C, nb,
        in_dtype, l1, tile_b, n_tiles,
    )
    res = pl.pallas_call(
        kern,
        grid=(G // nb, L_steps + 1, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        bytes_g, scale[:, :, None], off[:, :, None], targets_part, em3,
        *wm, *bm, *pm, *pbm, *em, *ebm, *lm, *lbm,
    )

    nw, nb_ = L, L - 1
    w_f = tuple(
        _unmerge_wt(res[l], weights[l]) for l in range(L - 1)
    ) + (res[L - 1].reshape(weights[-1].shape),)
    b_f = tuple(res[nw + l].reshape(biases[l].shape) for l in range(nb_))
    pw_f = tuple(
        _unmerge_wt(res[nw + nb_ + l], weights[l]) for l in range(L - 1)
    ) + (res[nw + nb_ + L - 1].reshape(weights[-1].shape),)
    pb_f = tuple(
        res[2 * nw + nb_ + l].reshape(biases[l].shape) for l in range(nb_)
    )
    return w_f, b_f, pw_f, pb_f


@functools.partial(
    jax.jit,
    static_argnames=("act", "L_steps", "interpret", "in_dtype", "l1", "C",
                     "nb", "n", "tile_b"),
)
def _traj_chains_packed_impl(
    bytes_g, scale, off, targets_perm, err, weights, biases, p_w, p_b,
    eps_w, eps_b, lam_w, lam_b,
    act, L_steps, interpret, in_dtype, l1, C, nb, n, tile_b,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, m_pad, B_bytes = bytes_g.shape
    L = len(weights)

    def prep_w(ts):
        return tuple(_merge_wt(t) for t in ts[: L - 1]) + (
            ts[L - 1].reshape(G, -1, 1),
        )

    def prep_b(ts):
        return tuple(t.reshape(G, -1, 1) for t in ts)

    wm, pm, em, lm = (prep_w(t) for t in (weights, p_w, eps_w, lam_w))
    bm, pbm, ebm, lbm = (prep_b(t) for t in (biases, p_b, eps_b, lam_b))
    em3 = err.reshape(G, C, 1) if err.ndim > 1 else jnp.broadcast_to(
        err.reshape(1, 1, 1), (G, C, 1)
    )

    const3 = lambda shape: pl.BlockSpec(
        (nb,) + shape, lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    operands = (
        [bytes_g, scale[:, :, None], off[:, :, None], targets_perm, em3]
        + list(wm) + list(bm) + list(pm) + list(pbm)
        + list(em) + list(ebm) + list(lm) + list(lbm)
    )
    in_specs = [const3(a.shape[1:]) for a in operands]
    out_arrs = list(wm) + list(bm) + list(pm) + list(pbm)
    out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in out_arrs]
    out_specs = [const3(a.shape[1:]) for a in out_arrs]

    kern = functools.partial(
        _traj_kernel_packed, act, n, B_bytes, L_steps, L, C, nb, in_dtype,
        l1, tile_b,
    )
    res = pl.pallas_call(
        kern,
        grid=(G // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*operands)

    nw, nb_ = L, L - 1
    w_f = tuple(
        _unmerge_wt(res[l], weights[l]) for l in range(L - 1)
    ) + (res[L - 1].reshape(weights[-1].shape),)
    b_f = tuple(res[nw + l].reshape(biases[l].shape) for l in range(nb_))
    pw_f = tuple(
        _unmerge_wt(res[nw + nb_ + l], weights[l]) for l in range(L - 1)
    ) + (res[nw + nb_ + L - 1].reshape(weights[-1].shape),)
    pb_f = tuple(
        res[2 * nw + nb_ + l].reshape(biases[l].shape) for l in range(nb_)
    )
    return w_f, b_f, pw_f, pb_f


def integrate_chains_packed(
    act_name, bytes_g, w_scale, shift, targets, err, weights, biases,
    p_w, p_b, eps_w, eps_b, lam_w, lam_b, L_steps, n, l1=False,
    interpret=False,
):
    """Packed analog of integrate_chains: integrate L leapfrog steps for all
    (branch, chain) pairs with the branch's 2-bit bytes VMEM-resident.

    bytes_g [G, m_pad, B] uint8 (group-strided, ops/packed_matmul layout);
    w_scale/shift [G, m_pad] per-marker 1/sigma and mu (models/density.
    PackedX fields); targets [G, C, n] in NATURAL individual order (the
    part-major permutation is applied here); the rest as integrate_chains.
    """
    import os

    in_dtype = None if interpret else "bfloat16"
    C = targets.shape[1]
    G, m_pad, B_bytes = bytes_g.shape
    tile_b = int(os.environ.get("RS_BANN_TRAJ_TB", _TILE_B))
    tile_b = min(tile_b, -(-B_bytes // 128) * 128)
    out_max = max(w.shape[-1] for w in weights[:-1]) if len(weights) > 1 \
        else weights[0].shape[-1]
    # bytes-resident when one branch's block fits the VMEM budget (one X
    # stream per TRAJECTORY); otherwise the grid-streamed variant (one X
    # stream per STEP, any n — the UKB-460k regime)
    stream = os.environ.get("RS_BANN_TRAJ_STREAM", "").lower() in (
        "1", "on", "true",
    ) or not packed_fits_vmem(m_pad, B_bytes, C)
    if stream:
        nb, tile_b = _pick_nb_stream(G, m_pad, C, max(out_max, 8), tile_b)
    else:
        nb, tile_b = _pick_nb_packed(
            G, m_pad, B_bytes, C, max(out_max, 8), tile_b
        )
    # uniform tile widths for the in-kernel tile loop: pad the byte columns
    # to a tile multiple with 0x55 (four 01 codes -> decode 0); the padded
    # individuals' indices land >= n, so the err mask zeroes them
    B_pad = -(-B_bytes // tile_b) * tile_b
    if B_pad != B_bytes:
        bytes_g = jnp.pad(
            bytes_g, ((0, 0), (0, 0), (0, B_pad - B_bytes)),
            constant_values=0x55,
        )
    perm = jnp.asarray(_part_perm(B_pad))
    n4 = 4 * B_pad
    tgt_pad = jnp.zeros((G, C, n4), jnp.float32).at[:, :, :n].set(targets)
    tgt_perm = jnp.take(tgt_pad, perm, axis=2)
    off = shift * w_scale
    args = (
        tuple(weights), tuple(biases), tuple(p_w), tuple(p_b), tuple(eps_w),
        tuple(eps_b), tuple(lam_w), tuple(lam_b), act_name, int(L_steps),
        interpret, in_dtype, bool(l1), C, nb, int(n), tile_b,
    )
    if stream:
        tgt_part = jnp.swapaxes(
            tgt_perm.reshape(G, C, 4, B_pad), 1, 2
        )  # [G, 4, C, B_pad]
        return _traj_chains_packed_stream_impl(
            bytes_g, w_scale, off, tgt_part, jnp.asarray(err, jnp.float32),
            *args,
        )
    return _traj_chains_packed_impl(
        bytes_g, w_scale, off, tgt_perm, jnp.asarray(err, jnp.float32),
        *args,
    )


def integrate_chains(
    act_name, xT, targets, err, weights, biases, p_w, p_b, eps_w, eps_b,
    lam_w, lam_b, L_steps, l1=False, interpret=False,
):
    """Integrate L leapfrog steps for all (branch, chain) pairs.

    xT [G, m_pad, n] dense feature-major (bf16 or f32); targets [G, C, n];
    err [G, C] (or scalar) per-chain error precisions; weights[l]
    [G, C, in_pad, out_pad], biases[l] [G, C, out_pad]; p_* momenta, eps_*
    per-coordinate step sizes, lam_* prior precision factors — all in the
    weights/biases layouts. ``l1`` selects the Laplace prior gradient
    (−λ∘sign(w)). Returns (w_L, b_L, p_w_L, p_b_L).
    """
    in_dtype = None if interpret else "bfloat16"
    C = targets.shape[1]
    G, m_pad, n = xT.shape
    out_max = max(w.shape[-1] for w in weights[:-1]) if len(weights) > 1 \
        else weights[0].shape[-1]
    nb = _pick_nb_traj(G, m_pad, n, C, max(out_max, 8))
    return _traj_chains_impl(
        xT, targets, jnp.asarray(err, jnp.float32), tuple(weights),
        tuple(biases), tuple(p_w), tuple(p_b), tuple(eps_w), tuple(eps_b),
        tuple(lam_w), tuple(lam_b), act_name, int(L_steps), interpret,
        in_dtype, bool(l1), C, nb,
    )
