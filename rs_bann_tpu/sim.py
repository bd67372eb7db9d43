"""Phenotype / genotype simulation.

Rebuild of the reference's ``simulate-xy`` / ``simulate-y`` driver functions
(/root/reference/src/bin/rs-bann.rs:374-964) and the sparse linear baseline
(/root/reference/src/linear_model.rs).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from pathlib import Path
from typing import Optional

import numpy as np

from .io.bed import BedVM
from .io.genotypes import CompressedGenotypes
from .io.phen import Phenotypes
from .group.grouping import UniformGrouping
from .models import density as D
from .models.arch import NetArch
from .models.init import InitCfg, init_net
from .models.net import Net

log = logging.getLogger("rs_bann_tpu")


# ------------------------------------------------------------ linear model


class LinearModel:
    """Sparse linear-effects model (linear_model.rs:103-143)."""

    def __init__(self, num_markers_per_branch, effects):
        self.num_markers_per_branch = list(num_markers_per_branch)
        self.effects = effects  # list of [m_g] arrays

    @staticmethod
    def random(
        num_markers_per_branch,
        heritability: float,
        num_effective_markers: Optional[int] = None,
        proportion_effective_markers: Optional[float] = None,
        seed: Optional[int] = None,
    ) -> "LinearModel":
        """β ~ N(0, h²/m_incl) on an included subset (linear_model.rs:46-96):
        with standardized markers the genetic variance is Σβ² ≈ h²."""
        rng = np.random.default_rng(seed)
        m = int(sum(num_markers_per_branch))
        if num_effective_markers is not None:
            included = np.zeros(m, bool)
            included[rng.choice(m, size=num_effective_markers, replace=False)] = True
        elif proportion_effective_markers is not None:
            included = rng.random(m) < proportion_effective_markers
        else:
            included = np.ones(m, bool)
        m_incl = max(int(included.sum()), 1)
        beta = np.where(
            included, rng.normal(0.0, np.sqrt(heritability / m_incl), m), 0.0
        ).astype(np.float32)
        effects, off = [], 0
        for mg in num_markers_per_branch:
            effects.append(beta[off : off + mg])
            off += mg
        return LinearModel(num_markers_per_branch, effects)

    def predict(self, gen: CompressedGenotypes) -> np.ndarray:
        y = np.zeros(gen.num_individuals, np.float32)
        for g in range(gen.num_groups):
            y += gen.x_group(g) @ self.effects[g]
        return y

    def sum_of_squares(self) -> float:
        return float(sum((e**2).sum() for e in self.effects))

    def to_json(self, path):
        with open(path, "w") as f:
            json.dump(
                {
                    "num_branches": len(self.effects),
                    "num_markers_per_branch": self.num_markers_per_branch,
                    "effects": [e.tolist() for e in self.effects],
                },
                f,
            )


# ------------------------------------------------------------- simulation


@dataclasses.dataclass
class SimResult:
    outdir: Path
    arch: Optional[NetArch]
    true_net: Optional[Net]
    linear_model: Optional[LinearModel]
    gen_train: CompressedGenotypes
    gen_test: CompressedGenotypes
    y_train: np.ndarray
    y_test: np.ndarray


def _add_noise(rng, g_vals, heritability):
    """Additive environmental noise with variance var(g)(1/h² − 1)
    (rs-bann.rs:891-909). Returns (y, residual_variance)."""
    if heritability == 1.0:
        return g_vals.copy(), 0.0
    s2 = float(np.var(np.asarray(g_vals, np.float64)))
    rv = s2 * (1.0 / heritability - 1.0)
    return g_vals + rng.normal(0.0, np.sqrt(rv), g_vals.shape[0]).astype(np.float32), rv


def _phen_stats(y, env_var):
    y64 = np.asarray(y, np.float64)
    return {
        "mean": float(y64.mean()),
        "variance": float(y64.var(ddof=1)),
        "env_variance": float(env_var),
    }


def set_replicate_ix(parent_dir, outdir_name) -> Path:
    """Auto-incremented _rep<k> suffix (rs-bann.rs:776-787)."""
    rep = 1
    while True:
        p = Path(parent_dir) / f"{outdir_name}_rep{rep}"
        if not p.exists():
            return p
        rep += 1


def simulate_xy(
    outdir: str,
    model_type: str,
    activation: str,
    num_markers_per_branch: int,
    num_branches: int,
    num_individuals: int,
    hidden_layer_width: int,
    branch_depth: int,
    heritability: float = 1.0,
    summary_layer_width: Optional[int] = None,
    proportion_effective: Optional[float] = None,
    num_effective: Optional[int] = None,
    init_param_variance: Optional[float] = None,
    init_gamma_shape: Optional[float] = None,
    init_gamma_scale: Optional[float] = None,
    json_data: bool = False,
    seed: Optional[int] = None,
) -> SimResult:
    """simulate-xy (rs-bann.rs:793-964): random genotypes + random true net
    -> noisy phenotypes; writes train/test bed+dims+groups+phen, model.npz,
    model.params, phen stats and args.json; retries if residual variance is
    too small."""
    assert 0.0 <= heritability <= 1.0, "Heritability must be within [0, 1]."
    rng = np.random.default_rng(seed)
    name = (
        f"{model_type}_{activation}_b{num_branches}_wh{hidden_layer_width}"
        f"_ws{summary_layer_width or hidden_layer_width}_d{branch_depth}"
        f"_m{num_markers_per_branch}_n{num_individuals}_h{heritability}"
    )
    if num_effective is not None:
        name += f"_me{num_effective}"
    elif proportion_effective is not None:
        name += f"_pe{proportion_effective}"
    if init_param_variance is not None:
        name += f"_v{init_param_variance}"
    elif init_gamma_shape is not None and init_gamma_scale is not None:
        name += f"_k{init_gamma_shape}_s{init_gamma_scale}"
    path = set_replicate_ix(outdir, name)
    os.makedirs(path, exist_ok=True)

    is_linear = model_type == "linear"
    arch = None
    if not is_linear:
        arch = NetArch.uniform(
            num_branches,
            num_markers_per_branch,
            hidden_layer_width,
            branch_depth,
            summary_layer_width,
            activation=activation,
        )

    attempt = 0
    while True:
        attempt += 1
        true_net = None
        lm = None
        if not is_linear:
            icfg = InitCfg(
                init_param_variance=init_param_variance,
                init_gamma_shape=init_gamma_shape,
                init_gamma_scale=init_gamma_scale,
                num_effective_markers=num_effective,
                proportion_effective_markers=proportion_effective,
                seed=int(rng.integers(0, 2**31)),
            )
            state, _ = init_net(arch, model_type, icfg)
            true_net = Net(model_type, arch, D.Hyperparameters(), state)
        else:
            lm = LinearModel.random(
                [num_markers_per_branch] * num_branches,
                heritability,
                num_effective,
                proportion_effective,
                seed=int(rng.integers(0, 2**31)),
            )

        mafs = rng.uniform(0.0, 0.5, num_branches * num_markers_per_branch)
        groups = UniformGrouping(num_branches, num_markers_per_branch)
        m_tot = num_branches * num_markers_per_branch
        bed_tr = BedVM.random(
            num_individuals, m_tot, mafs, seed=int(rng.integers(0, 2**31))
        )
        bed_te = BedVM.random(
            num_individuals, m_tot, mafs, seed=int(rng.integers(0, 2**31))
        )
        gen_tr = CompressedGenotypes(bed_tr, groups)
        gen_te = CompressedGenotypes(bed_te, groups)

        if is_linear:
            g_tr, g_te = lm.predict(gen_tr), lm.predict(gen_te)
        else:
            g_tr = np.asarray(true_net.predict(gen_tr.to_stacked(arch).X))
            g_te = np.asarray(true_net.predict(gen_te.to_stacked(arch).X))

        y_tr, rv_tr = _add_noise(rng, g_tr, heritability)
        y_te, rv_te = _add_noise(rng, g_te, heritability)
        if heritability != 1.0 and (rv_tr < 0.01 or rv_te < 0.01):
            log.debug(
                "Residual variances too small (%s, %s); retrying", rv_tr, rv_te
            )
            if attempt < 100:
                continue
        break

    # ---- write artifacts
    if true_net is not None:
        true_net.save(str(path / "model.npz"))
        with open(path / "model.params", "w") as f:
            json.dump(_net_params_json(true_net), f)
    if lm is not None:
        lm.to_json(path / "model.params")
    gen_tr.to_file(path / "train")
    gen_te.to_file(path / "test")
    Phenotypes(y_tr).to_file(path / "train.phen")
    Phenotypes(y_te).to_file(path / "test.phen")
    with open(path / "train_phen_stats.json", "w") as f:
        json.dump(_phen_stats(y_tr, rv_tr), f)
    with open(path / "test_phen_stats.json", "w") as f:
        json.dump(_phen_stats(y_te, rv_te), f)
    if json_data:
        Phenotypes(g_tr).to_json(path / "genetic_values_train.json")
        Phenotypes(g_te).to_json(path / "genetic_values_test.json")
        Phenotypes(y_tr).to_json(path / "phen_train.json")
        Phenotypes(y_te).to_json(path / "phen_test.json")
    args = {
        "model_type": model_type,
        "activation_function": activation,
        "num_markers_per_branch": num_markers_per_branch,
        "num_branches": num_branches,
        "num_individuals": num_individuals,
        "hidden_layer_width": hidden_layer_width,
        "branch_depth": branch_depth,
        "heritability": heritability,
        "summary_layer_width": summary_layer_width,
        "proportion_effective": proportion_effective,
        "num_effective": num_effective,
        "init_param_variance": init_param_variance,
        "init_gamma_shape": init_gamma_shape,
        "init_gamma_scale": init_gamma_scale,
        "seed": seed,
    }
    with open(path / "args.json", "w") as f:
        json.dump(args, f, indent=2)
    return SimResult(path, arch, true_net, lm, gen_tr, gen_te, y_tr, y_te)


def simulate_y(
    bfile_train: str,
    bfile_test: str,
    groups_file: str,
    outdir: str,
    model_type: str,
    activation: str,
    depth: int = 0,
    heritability: float = 1.0,
    proportion_effective: Optional[float] = None,
    num_effective: Optional[int] = None,
    init_param_variance: Optional[float] = None,
    init_gamma_shape: Optional[float] = None,
    init_gamma_scale: Optional[float] = None,
    json_data: bool = False,
    seed: Optional[int] = None,
):
    """simulate-y (rs-bann.rs:374-517): real genotypes, simulated phenotype.
    Branch hidden width is fixed to half the branch input size."""
    from .group.grouping import ExternalGrouping

    assert 0.0 <= heritability <= 1.0, "Heritability must be within [0, 1]."
    rng = np.random.default_rng(seed)
    name = f"{model_type}_{activation}_d{depth}_h{heritability}"
    if num_effective is not None:
        name += f"_me{num_effective}"
    elif proportion_effective is not None:
        name += f"_pe{proportion_effective}"
    if init_param_variance is not None:
        name += f"_v{init_param_variance}"
    elif init_gamma_shape is not None and init_gamma_scale is not None:
        name += f"_k{init_gamma_shape}_s{init_gamma_scale}"
    path = set_replicate_ix(outdir, name)
    os.makedirs(path, exist_ok=True)

    grouping = ExternalGrouping.from_file(groups_file)
    gen_tr = CompressedGenotypes(BedVM.from_file(bfile_train), grouping)
    gen_te = CompressedGenotypes(BedVM.from_file(bfile_test), grouping)

    is_linear = model_type == "linear"
    true_net, lm, arch = None, None, None
    if is_linear:
        lm = LinearModel.random(
            gen_te.num_markers_per_group(), heritability,
            num_effective, proportion_effective,
            seed=int(rng.integers(0, 2**31)),
        )
        g_tr, g_te = lm.predict(gen_tr), lm.predict(gen_te)
        lm.to_json(path / "model.params")
    else:
        arch = NetArch.from_width_rules(
            gen_te.num_markers_per_group(), depth,
            ("fraction_of_input", 0.5), ("like_hidden",), activation=activation,
        )
        icfg = InitCfg(
            init_param_variance=init_param_variance,
            init_gamma_shape=init_gamma_shape,
            init_gamma_scale=init_gamma_scale,
            num_effective_markers=num_effective,
            proportion_effective_markers=proportion_effective,
            seed=int(rng.integers(0, 2**31)),
        )
        state, _ = init_net(arch, model_type, icfg)
        true_net = Net(model_type, arch, D.Hyperparameters(), state)
        true_net.save(str(path / "model.npz"))
        with open(path / "model.params", "w") as f:
            json.dump(_net_params_json(true_net), f)
        g_tr = np.asarray(true_net.predict(gen_tr.to_stacked(arch).X))
        g_te = np.asarray(true_net.predict(gen_te.to_stacked(arch).X))

    y_tr, rv_tr = _add_noise(rng, g_tr, heritability)
    y_te, rv_te = _add_noise(rng, g_te, heritability)
    Phenotypes(y_tr).to_file(path / "train.phen")
    Phenotypes(y_te).to_file(path / "test.phen")
    with open(path / "train_phen_stats.json", "w") as f:
        json.dump(_phen_stats(y_tr, rv_tr), f)
    with open(path / "test_phen_stats.json", "w") as f:
        json.dump(_phen_stats(y_te, rv_te), f)
    if json_data:
        Phenotypes(y_tr).to_json(path / "phen_train.json")
        Phenotypes(y_te).to_json(path / "phen_test.json")
    with open(path / "args.json", "w") as f:
        json.dump(
            {
                "model_type": model_type,
                "activation_function": activation,
                "depth": depth,
                "heritability": heritability,
                "seed": seed,
            },
            f,
            indent=2,
        )
    return SimResult(path, arch, true_net, lm, gen_tr, gen_te, y_tr, y_te)


def _net_params_json(net: Net):
    """model.params: per-branch params+precisions JSON (rs-bann.rs:921-927)."""
    from .models import params as P

    out = []
    arch = net.arch
    ins = arch.layer_in_counts()
    outs = arch.layer_out_counts()
    s = net.state
    for g in range(arch.num_branches):
        out.append(
            {
                "num_params": arch.num_params_branch(g),
                "num_markers": arch.m[g],
                "layer_widths": arch.layer_widths(g),
                "params": {
                    "weights": [
                        np.asarray(s.params.weights[l][g])[: ins[l][g], : outs[l][g]]
                        .reshape(-1, order="F")
                        .tolist()
                        for l in range(arch.num_layers)
                    ],
                    "biases": [
                        np.asarray(s.params.biases[l][g])[: outs[l][g]].tolist()
                        for l in range(arch.num_layers - 1)
                    ],
                },
                "precisions": {
                    "weight_precisions": [
                        np.asarray(s.precisions.weights[l][g]).reshape(-1).tolist()
                        for l in range(arch.num_layers)
                    ],
                    "bias_precisions": [
                        np.asarray(s.precisions.biases[l][g]).reshape(-1).tolist()
                        for l in range(arch.num_layers - 1)
                    ],
                    "error_precision": [float(np.asarray(s.precisions.error))],
                },
            }
        )
    return out
