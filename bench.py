"""Benchmark: roofline-grade throughput of the compiled Gibbs sweep.

Workloads:
  1. Flagship dense sweep — 64 branches x 64 markers, n=4096, one hidden
     layer of 32, block-parallel update mode, 4 vectorized chains (the
     multi-branch + multi-chain configuration the rs-bann reference cannot
     express: it runs one chain, one branch at a time, host-driven).
     Feature-major (FeatX) layout: activations are [width, n] so the large
     n axis fills the 128 MXU lanes — see models/density.FeatX.
  2. Packed genome-scale sweep — 10k SNPs in 100 groups, n=100,000, the
     docs/GENOME_SCALE.md production recipe shape (ridge_ard + identity +
     hybrid + 2-bit packed genotypes with fused Pallas decode).

Headline metric: leapfrog steps/s/chip, one step = one per-branch leapfrog
integration step (forward+backward pass + momentum update) = chains x
branches x integration_length x sweeps.

Bench hygiene (VERDICT r2 #7): every timed section repeats REPEATS times and
reports the median with min/max spread — tunnel-attached chips show real
run-to-run wall-clock variance, and a single sample cannot distinguish a
regression from tunnel noise.

Roofline accounting: true matmul FLOPs per leapfrog step from the layer
dims (fwd 2*n*in*out per layer; backward = dW for every layer + the dX
chain for all layers but the input). The MXU issue model pads, per matmul,
the contraction dim and the output minor dim to 128 lanes and the output
second-minor dim to 8 sublanes. Feature-major shapes put n in lanes
everywhere, so the residual issue waste is contraction padding only
(2.8x at this shape vs 8x for the sample-major layout benched in r01/r02).

MFU is reported against BOTH peaks: the bf16 matmul peak (the MXU path XLA
takes for f32 inputs at DEFAULT precision — inputs are bf16-rounded,
accumulation is f32) and the true-f32 peak (HIGHEST precision = 6 bf16
passes, peak/6) so the number cannot be misread in either direction.

ESS: per-parameter effective samples/s over a kept-sample window — one
output weight per branch per chain plus the error precision — reported as
the median and min across parameters, next to the mse-statistic ESS.

vs_baseline: the reference publishes no numbers (BASELINE.md), so we
self-baseline against the reference's algorithm compiled as well as
possible on the same chip: one chain, branches updated one at a time in a
sequential scan (net.rs:258-334 semantics, fully jitted — generous to the
reference, whose ArrayFire loop additionally pays per-op dispatch).

Prints ONE json line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

REPEATS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(tree):
    """True device barrier: jax.block_until_ready can return before
    execution completes through the axon TPU tunnel, so force a host
    readback of one leaf (measured: timings without this are fiction)."""
    import jax

    return float(np.asarray(jax.tree.leaves(tree)[0]).ravel()[0])


# bf16 matmul peak TFLOP/s per chip (public spec sheets)
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5": 459.0,  # v5p
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
}


def _r(x, k):
    return -(-x // k) * k


def leapfrog_flops(n, widths):
    """True matmul FLOPs of ONE leapfrog step (value_and_grad of the
    potential) for one branch: fwd = sum_l 2*n*in_l*out_l; backward = dW for
    every layer (same cost as fwd) + the dX chain for every layer except
    the input one."""
    dims = list(widths)
    f_fwd = sum(2 * n * dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    f_dx0 = 2 * n * dims[0] * dims[1]
    return 3 * f_fwd - f_dx0


def leapfrog_issue_fm(n, widths):
    """MXU issue FLOPs of one leapfrog step in the FEATURE-MAJOR layout.

    Every matmul has n in the 128-lane minor dim (n is 128-aligned here);
    padding model per matmul [A, K] @ [K, B=n]: A -> multiple of 8 sublanes,
    K -> multiple of 128 contraction lanes. The width-1 output layer runs
    on the VPU (excluded). Terms: fwd z_l = W_l^T a (K=in_l, A=out_l);
    bwd dW_l^T = g a^T (K=n full, B=in_l -> 128); bwd da_l = W_l g
    (K=out_l, A=in_l), for every layer except the input one."""
    dims = list(widths)
    L = len(dims) - 1
    issue = 0
    for l in range(L - 1):  # fwd, all but the VPU output layer
        issue += 2 * _r(dims[l + 1], 8) * _r(dims[l], 128) * n
    for l in range(L - 1):  # dW^T
        issue += 2 * _r(dims[l + 1], 8) * n * _r(dims[l], 128)
    for l in range(1, L - 1):  # dX chain (not input layer, output on VPU)
        issue += 2 * _r(dims[l], 8) * _r(dims[l + 1], 128) * n
    # the dX chain INTO the last hidden activation comes from the VPU outer
    # product with w_out — no MXU issue
    return issue


def leapfrog_issue_sample_major(n, widths):
    """Issue FLOPs of the r01/r02 sample-major layout ([n, in] @ [in, out]):
    contraction in -> 128 AND output lanes out -> 128 pad on every matmul."""
    dims = list(widths)
    L = len(dims) - 1
    issue = 0
    for l in range(L):  # fwd
        issue += 2 * n * _r(dims[l], 128) * _r(dims[l + 1], 128)
    for l in range(L):  # dW: [in, n] @ [n, out]
        issue += 2 * _r(dims[l], 8) * n * _r(dims[l + 1], 128)
    for l in range(1, L):  # dX
        issue += 2 * n * _r(dims[l + 1], 128) * _r(dims[l], 128)
    return issue


def _timed(fn, reps=REPEATS):
    """Median + spread of reps timings of fn() (each fn() must sync)."""
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts)), float(min(ts)), float(max(ts))


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from rs_bann_tpu.models import density as D
    from rs_bann_tpu.models.arch import NetArch
    from rs_bann_tpu.models.init import InitCfg, init_net
    from rs_bann_tpu.models.net import Net
    from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg
    from rs_bann_tpu.vis import ess

    kind = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS.get(kind, 197.0)
    peak_f32 = peak / 6.0  # HIGHEST precision = bf16x6 passes
    log(f"device: {kind} (bf16 peak {peak} TF, true-f32 peak {peak_f32:.1f} TF)")
    # warm the tunnel claim before any timed work: the first op after
    # another process held the TPU can stall 45-130s regardless of size
    t0 = time.time()
    sync(jnp.zeros(8) + 1.0)
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    G, m, n, h, depth, C, L = 64, 64, 4096, 32, 1, 4, 64
    sweeps = 10

    arch = NetArch.uniform(G, m, h, depth, h)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)

    rng = np.random.default_rng(0)
    # feature-major [G, m_pad, n]: n fills the MXU lanes (models/density.FeatX).
    # Stored bf16: the MXU rounds f32 inputs to bf16 at DEFAULT precision
    # anyway, and the X stream is the sweep's HBM bound (scripts/diag_scale)
    # — storing the rounding halves the bytes.
    Xf = np.zeros((G, arch.m_pad, n), np.float32)
    Xf[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
    X = D.FeatX(jnp.asarray(Xf, dtype=jnp.bfloat16))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    cfg = MCMCCfg(
        chain_length=1,
        burn_in=10**9,
        hmc_integration_length=L,
        hmc_step_size_mode="izmailov",
        update_mode="parallel",
        num_chains=C,
        seed=0,
    )
    sweep1 = net.make_sweep(cfg)
    # chain-vmapped: dispatches the chain-folded whole-trajectory kernel
    # (ops/leapfrog.py) — X VMEM-resident for all L steps of all C chains.
    # Fallback: sequential chains via lax.map (each chain re-streams X).
    from rs_bann_tpu.models.net import chain_fold_eligible

    folded = chain_fold_eligible("ridge_base", "tanh", cfg, X)
    log(f"chain-folded trajectory kernel: {'ON' if folded else 'off'}")
    if folded:
        sweep = jax.jit(jax.vmap(sweep1, in_axes=(0, None, None)))
    else:
        sweep = jax.jit(
            lambda c, X_, y_: jax.lax.map(lambda ci: sweep1(ci, X_, y_), c)
        )
    keys = jax.random.split(jax.random.key(0), C)
    carry = jax.jit(
        lambda s, X_, y_, ks: jax.vmap(
            lambda k: net.init_carry(X_, y_, k, state=s)
        )(ks)
    )(net.state, X, y, keys)
    jax.block_until_ready(carry)

    log(f"sweep: G={G} m={m} n={n} h={h} d={depth} C={C} L={L} "
        f"[feature-major, bf16 X, fused-grad kernel]")
    t0 = time.time()
    try:
        carry, stats = sweep(carry, X, y)
        sync(stats)
    except Exception as e:  # fused-kernel lowering failure: fall back
        log(f"fused sweep failed ({type(e).__name__}: {e}); "
            "falling back to the autodiff path")
        from rs_bann_tpu.ops import branch_mlp

        branch_mlp.FORCE = "off"
        sweep1 = net.make_sweep(cfg)
        sweep = jax.jit(
            lambda c, X_, y_: jax.lax.map(lambda ci: sweep1(ci, X_, y_), c)
        )
        carry = jax.jit(
            lambda s, X_, y_, ks: jax.vmap(
                lambda k: net.init_carry(X_, y_, k, state=s)
            )(ks)
        )(net.state, X, y, keys)
        t0 = time.time()
        carry, stats = sweep(carry, X, y)
        sync(stats)
    compile_s = time.time() - t0
    log(f"compile+first sweep: {compile_s:.1f}s")

    state_box = {"carry": carry, "stats": stats}

    def run_sweeps():
        c = state_box["carry"]
        for _ in range(sweeps):
            c, s = sweep(c, X, y)
        sync(s)
        state_box["carry"], state_box["stats"] = c, s

    dt_med, dt_min, dt_max = _timed(run_sweeps)
    carry, stats = state_box["carry"], state_box["stats"]
    steps = sweeps * C * G * L
    steps_per_s = steps / dt_med
    acc = np.asarray(stats.counts)[:, 0].sum() / (
        (1 + REPEATS * sweeps) * C * G
    )
    log(
        f"{sweeps} sweeps x {REPEATS}: median {dt_med:.3f}s "
        f"[{dt_min:.3f}, {dt_max:.3f}] -> {steps_per_s:,.0f} leapfrog "
        f"steps/s/chip (mse={np.asarray(stats.mse_train).mean():.3f}, "
        f"acc={acc:.2f})"
    )

    # ---- roofline: model FLOPs vs achieved vs chip peak
    widths = [m, h, h, 1]  # m -> hidden -> summary -> output
    f_true = leapfrog_flops(n, widths)
    tflops_true = steps_per_s * f_true / 1e12
    mfu = tflops_true / peak
    issue_fm = leapfrog_issue_fm(n, widths)
    issue_sm = leapfrog_issue_sample_major(n, widths)
    waste = issue_fm / f_true
    issue_est = tflops_true * waste
    log(
        f"model FLOPs/leapfrog-step: {f_true/1e6:.1f} MF true; feature-major "
        f"MXU issue {issue_fm/1e6:.1f} MF ({waste:.2f}x contraction padding; "
        f"sample-major layout would issue {issue_sm/f_true:.1f}x)"
    )
    log(
        f"achieved: {tflops_true:.1f} TF/s true-work = {100*mfu:.1f}% of "
        f"{kind} bf16 peak ({100*tflops_true/peak_f32:.0f}% of the true-f32 "
        f"bf16x6 peak); modeled issue {issue_est:.0f} TF/s "
        f"({100*issue_est/peak:.0f}% of peak). The issue model puts the "
        f"layout ceiling at {100/waste:.1f}% MFU for this shape."
    )

    # ---- effective samples per second, per PARAMETER (north-star #2):
    # one output weight per (chain, branch) + the shared error precision.
    # Measured under TWO step-size regimes: the izmailov heuristic (the
    # r01/r02-comparable series; acc ~0.3 under the exact live-accept
    # sampler — r2's 0.83 was the biased frozen-residual accept) and
    # dual-averaging-tuned (48 adaptation sweeps targeting 0.65, then a
    # frozen-step window). Sweep cost is identical between modes.
    ess_sweeps = 64

    def measure_ess(sweep_fn, carry0, label):
        c = carry0
        w_series, lam_series, mse_series = [], [], []
        t0 = time.time()
        for _ in range(ess_sweeps):
            c, stats = sweep_fn(c, X, y)
            w_series.append(c.state.params.weights[-1][:, :, 0, 0])  # [C, G]
            lam_series.append(c.state.precisions.error)  # [C]
            mse_series.append(stats.mse_train)
        sync(stats)
        ess_dt = time.time() - t0
        w_series = np.asarray(jax.device_get(w_series))  # [S, C, G]
        lam_series = np.asarray(jax.device_get(lam_series))  # [S, C]
        mse_series = np.asarray(jax.device_get(mse_series))  # [S, C]
        per_param = []
        for g in range(G):
            per_param.append(sum(ess(w_series[:, c_, g]) for c_ in range(C)))
        per_param.append(sum(ess(lam_series[:, c_]) for c_ in range(C)))
        per_param = np.asarray(per_param)
        out = {
            "per_param_median": round(float(np.median(per_param)) / ess_dt, 1),
            "per_param_min": round(float(per_param.min()) / ess_dt, 1),
            "mse_stat": round(
                sum(ess(mse_series[:, c_]) for c_ in range(C)) / ess_dt, 1
            ),
        }
        log(
            f"ESS/s over {ess_sweeps} sweeps x {C} chains ({label}): "
            f"per-parameter median {out['per_param_median']}, min "
            f"{out['per_param_min']}; mse-statistic {out['mse_stat']}"
        )
        return out, c

    ess_iz, carry = measure_ess(sweep, carry, "izmailov step sizes")

    da_cfg = MCMCCfg(
        chain_length=1,
        burn_in=48,
        hmc_integration_length=L,
        hmc_step_size_mode="dual_averaging",
        target_accept=0.65,  # HMC-optimal; the cfg default (0.8) measured
        # per-param ESS/s 6.6 vs izmailov's 21 on this shape
        update_mode="parallel",
        num_chains=C,
        seed=0,
    )
    da_sweep1 = net.make_sweep(da_cfg)
    if folded:
        da_sweep = jax.jit(jax.vmap(da_sweep1, in_axes=(0, None, None)))
    else:
        da_sweep = jax.jit(
            lambda c, X_, y_: jax.lax.map(lambda ci: da_sweep1(ci, X_, y_), c)
        )
    da_carry = jax.jit(
        lambda s, X_, y_, ks: jax.vmap(
            lambda k: net.init_carry(X_, y_, k, state=s)
        )(ks)
    )(net.state, X, y, keys)
    for _ in range(48):  # adaptation window (da_t counts up to burn_in)
        da_carry, da_stats = da_sweep(da_carry, X, y)
    sync(da_stats)
    acc0 = np.asarray(da_stats.counts)[:, 0].sum()
    ess_da, da_carry = measure_ess(
        da_sweep, da_carry, "dual-averaging-tuned, frozen"
    )
    ess_da["acceptance"] = round(
        float(
            (np.asarray(
                jax.device_get(
                    da_sweep(da_carry, X, y)[1].counts
                )
            )[:, 0].sum() - acc0)
            / ((ess_sweeps + 1) * C * G)
        ),
        2,
    )

    # ---- self-baseline: the reference's algorithm (sequential random-scan
    # Gibbs, one chain), fully compiled on the same chip
    base_cfg = MCMCCfg(
        chain_length=1,
        burn_in=10**9,
        hmc_integration_length=L,
        hmc_step_size_mode="izmailov",
        update_mode="sequential",
        num_chains=1,
        seed=0,
    )
    base_sweep = jax.jit(net.make_sweep(base_cfg))
    base_carry = jax.jit(
        lambda s, X_, y_, k: net.init_carry(X_, y_, k, state=s)
    )(net.state, X, y, jax.random.key(2))
    t0 = time.time()
    base_carry, base_stats = base_sweep(base_carry, X, y)
    sync(base_stats)
    log(f"baseline compile+first sweep: {time.time() - t0:.1f}s")
    base_sweeps = 3
    base_box = {"c": base_carry}

    def run_base():
        c = base_box["c"]
        for _ in range(base_sweeps):
            c, s = base_sweep(c, X, y)
        sync(s)
        base_box["c"] = c

    b_med, b_min, b_max = _timed(run_base)
    base_steps_per_s = base_sweeps * G * L / b_med
    log(
        f"sequential single-chain baseline (reference algorithm, compiled): "
        f"{base_steps_per_s:,.0f} steps/s (median of {REPEATS}x{base_sweeps} "
        f"sweeps, [{b_min:.2f}, {b_max:.2f}]s)"
    )

    # ---- baseline ESS/s (VERDICT r3 #2): effective samples/s of the
    # reference algorithm on the same chip, so the headline speedup can be
    # stated in effective samples, not just raw leapfrog steps. Same
    # per-parameter series as measure_ess, one chain.
    def measure_base_ess(sweep_fn, carry0, label):
        c = carry0
        w_series, lam_series, mse_series = [], [], []
        t0 = time.time()
        for _ in range(ess_sweeps):
            c, st = sweep_fn(c, X, y)
            w_series.append(c.state.params.weights[-1][:, 0, 0])  # [G]
            lam_series.append(c.state.precisions.error)
            mse_series.append(st.mse_train)
        sync(st)
        dt = time.time() - t0
        w_series = np.asarray(jax.device_get(w_series))  # [S, G]
        lam_series = np.asarray(jax.device_get(lam_series))  # [S]
        mse_series = np.asarray(jax.device_get(mse_series))  # [S]
        per_param = np.asarray(
            [ess(w_series[:, g]) for g in range(G)] + [ess(lam_series)]
        )
        out = {
            "per_param_median": round(float(np.median(per_param)) / dt, 1),
            "per_param_min": round(float(per_param.min()) / dt, 1),
            "mse_stat": round(ess(mse_series) / dt, 1),
        }
        log(
            f"baseline ESS/s over {ess_sweeps} sweeps ({label}): per-param "
            f"median {out['per_param_median']}, min {out['per_param_min']}; "
            f"mse-statistic {out['mse_stat']}"
        )
        return out, c

    base_ess_iz, base_carry = measure_base_ess(
        base_sweep, base_carry, "izmailov"
    )
    import dataclasses as _dc

    base_da_cfg = _dc.replace(
        base_cfg, burn_in=48, hmc_step_size_mode="dual_averaging",
        target_accept=0.65,
    )
    base_da_sweep = jax.jit(net.make_sweep(base_da_cfg))
    base_da_carry = jax.jit(
        lambda s, X_, y_, k: net.init_carry(X_, y_, k, state=s)
    )(net.state, X, y, jax.random.key(2))
    for _ in range(48):
        base_da_carry, bst = base_da_sweep(base_da_carry, X, y)
    sync(bst)
    base_ess_da, _ = measure_base_ess(
        base_da_sweep, base_da_carry, "dual-averaging-tuned, frozen"
    )

    # ---- packed genome-scale entry (docs/GENOME_SCALE.md shape)
    from rs_bann_tpu.io.bed import BedVM
    from rs_bann_tpu.group.grouping import UniformGrouping
    from rs_bann_tpu.models.data import pack_stacked

    pG, pm_, pn, pL = 100, 100, 100_000, 30
    log(f"packed genome-scale: G={pG} m={pm_} n={pn} ridge_ard identity hybrid L={pL}")
    bed = BedVM.random(pn, pG * pm_, seed=1)
    grouping = UniformGrouping(pG, pm_)
    parch = NetArch.from_width_rules(
        [pm_] * pG, 0, ("fixed", 10), ("like_hidden",), activation="identity"
    )
    pstate, _ = init_net(parch, "ridge_ard", InitCfg(seed=0))
    pnet = Net("ridge_ard", parch, D.Hyperparameters(), pstate)
    pdata = pack_stacked(parch, bed, grouping, rng.standard_normal(pn).astype(np.float32))
    x_gb = sum(a.nbytes for a in jax.tree.leaves(pdata.X)) / 1e9
    pcfg = MCMCCfg(
        chain_length=1, burn_in=10**9, hmc_integration_length=pL,
        hmc_step_size_mode="dual_averaging", update_mode="hybrid",
        mass_adaptation=True, seed=0,
    )
    from rs_bann_tpu.models.net import chain_fold_eligible

    def bench_packed(tag, fold):
        """One packed-hybrid measurement. ``fold=True`` uses the production
        chain arrangement (1-chain vmap -> the r5 whole-trajectory packed
        kernel through the custom_vmap rule, exactly what train.py picks
        when chain_fold_eligible); ``fold=False`` pins the r4 per-step
        fused-kernel path via the RS_BANN_FOLD kill switch."""
        import os

        if not fold:
            os.environ["RS_BANN_FOLD"] = "off"
        try:
            sweep1 = pnet.make_sweep(pcfg)
            if fold:
                assert chain_fold_eligible(
                    "ridge_ard", "identity", pcfg, pdata.X
                ), "packed bench shape must be fold-eligible"
                psweep = jax.jit(jax.vmap(sweep1, in_axes=(0, None, None)))
                pcarry = jax.vmap(
                    lambda k: pnet.init_carry(
                        pdata.X, pdata.y, k, mass_adaptation=True,
                        state=pnet.state,
                    )
                )(jax.random.split(jax.random.key(0), 1))
            else:
                psweep = jax.jit(sweep1)
                pcarry = jax.jit(
                    lambda s, X_, y_, k: pnet.init_carry(
                        X_, y_, k, mass_adaptation=True, state=s
                    )
                )(pnet.state, pdata.X, pdata.y, jax.random.key(0))
            t0 = time.time()
            pcarry, pstats = psweep(pcarry, pdata.X, pdata.y)
            sync(pstats)
            p_compile = time.time() - t0
            log(f"packed[{tag}] compile+first sweep: {p_compile:.1f}s "
                f"(X: {x_gb:.2f} GB HBM)")
            p_sweeps = 3
            p_box = {"c": pcarry}

            def run_packed():
                c = p_box["c"]
                for _ in range(p_sweeps):
                    c, s = psweep(c, pdata.X, pdata.y)
                sync(s)
                p_box["c"] = c

            p_med, p_min, p_max = _timed(run_packed)
            p_steps_per_s = p_sweeps * pG * pL / p_med
            log(
                f"packed[{tag}]: {p_steps_per_s:,.0f} leapfrog steps/s "
                f"({p_med/p_sweeps*1e3:.0f} ms/sweep median, "
                f"[{p_min/p_sweeps*1e3:.0f}, {p_max/p_sweeps*1e3:.0f}])"
            )
            return p_steps_per_s, p_med, p_min, p_max, p_compile, p_sweeps
        finally:
            if not fold:
                del os.environ["RS_BANN_FOLD"]

    # per-step first (the r4 series number), then the folded production path
    ps_steps_per_s, ps_med, ps_min, ps_max, ps_compile, _ = bench_packed(
        "per-step", fold=False
    )
    p_steps_per_s, p_med, p_min, p_max, p_compile, p_sweeps = bench_packed(
        "folded-trajectory", fold=True
    )
    log(f"packed fold speedup: {p_steps_per_s / ps_steps_per_s:.2f}x")

    print(
        json.dumps(
            {
                "metric": "hmc_leapfrog_steps_per_s_per_chip",
                "value": round(steps_per_s, 1),
                "unit": "leapfrog steps/s (fwd+bwd per branch) on G=64,m=64,n=4096,h=32,d=1,C=4 [feature-major]",
                "vs_baseline": round(steps_per_s / base_steps_per_s, 2),
                "repeats": REPEATS,
                "spread_s": [round(dt_min, 3), round(dt_med, 3), round(dt_max, 3)],
                "compile_s": round(compile_s, 1),
                "tflops_true": round(tflops_true, 1),
                "mfu": round(mfu, 3),
                "mfu_vs_f32_peak": round(tflops_true / peak_f32, 3),
                "issue_waste_x": round(waste, 2),
                "issue_waste_sample_major_x": round(issue_sm / f_true, 2),
                "layout_ceiling_mfu": round(1.0 / waste, 3),
                "issue_frac_of_peak": round(issue_est / peak, 2),
                "ess_per_s": ess_iz,  # izmailov (r01/r02-comparable)
                "ess_per_s_tuned": ess_da,
                "baseline_ess_per_s": base_ess_iz,
                "baseline_ess_per_s_tuned": base_ess_da,
                # the headline effective-sample speedup (VERDICT r3 #2):
                # whole-chip flagship ESS/s over the compiled reference
                # algorithm's ESS/s, per step-size regime
                "vs_baseline_ess": round(
                    ess_iz["per_param_median"]
                    / max(base_ess_iz["per_param_median"], 1e-9), 2
                ),
                "vs_baseline_ess_tuned": round(
                    ess_da["per_param_median"]
                    / max(base_ess_da["per_param_median"], 1e-9), 2
                ),
                # series interpretation: r1/r2 ESS numbers came from an
                # accept-vs-stale-residual kernel that was subtly biased;
                # r3 replaced it with the EXACT live-accept kernel (lower
                # acceptance under izmailov, honest ESS). r4 swaps the
                # leapfrog execution for the chain-folded whole-trajectory
                # kernel (identical draws to r3's sampler, faster).
                "series_note": "r2->r3: sampler made exact (live-accept); "
                "ESS not comparable across that boundary. r4: same sampler, "
                "chain-folded trajectory kernel.",
                "packed": {
                    "shape": f"G={pG},m={pm_},n={pn},ridge_ard,identity,hybrid,L={pL}",
                    # r5: the production arrangement now folds the whole
                    # trajectory (bytes VMEM-resident); per_step_* keeps the
                    # r4 series comparable
                    "leapfrog_steps_per_s": round(p_steps_per_s, 1),
                    "ms_per_sweep": round(p_med / p_sweeps * 1e3, 1),
                    "ms_per_sweep_spread": [
                        round(p_min / p_sweeps * 1e3, 1),
                        round(p_max / p_sweeps * 1e3, 1),
                    ],
                    "compile_s": round(p_compile, 1),
                    "x_hbm_gb": round(x_gb, 2),
                    "per_step_leapfrog_steps_per_s": round(ps_steps_per_s, 1),
                    "per_step_ms_per_sweep": round(ps_med / p_sweeps * 1e3, 1),
                    "fold_speedup": round(p_steps_per_s / ps_steps_per_s, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
