"""CLI integration tests: the reference's 12 subcommands end-to-end
(cli.rs:19-60), driven in-process through the argparse entry point."""

import csv
import io
import json
import os
from contextlib import redirect_stdout

import numpy as np
import pytest

from rs_bann_tpu.cli.main import main


def run_cli(*argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        main([str(a) for a in argv])
    return buf.getvalue()


@pytest.fixture(scope="module")
def simdir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sim")
    run_cli(
        "simulate-xy", "lasso-base", "tanh", "8", "2", "80", "4", "0", "0.8",
        "--seed", "4", "-o", out,
    )
    (d,) = list(out.iterdir())
    return d


@pytest.fixture(scope="module")
def rundir(simdir, tmp_path_factory):
    out = tmp_path_factory.mktemp("run")
    run_cli(
        "train-new",
        simdir / "train", simdir / "train.phen", simdir / "train.groups",
        "--bfile-test", simdir / "test", "--p-test", simdir / "test.phen",
        "lasso-base", "tanh", "0", "6", "25",
        "--outpath", out, "--seed", "2", "--burn-in", "3", "--trace",
    )
    (d,) = list(out.iterdir())
    return d


def test_simulate_xy_artifacts(simdir):
    names = {p.name for p in simdir.iterdir()}
    assert {
        "train.bed", "train.dims", "train.groups", "train.phen",
        "test.bed", "test.dims", "test.groups", "test.phen",
        "model.npz", "model.params", "args.json",
        "train_phen_stats.json", "test_phen_stats.json",
    } <= names
    stats = json.loads((simdir / "train_phen_stats.json").read_text())
    assert stats["env_variance"] > 0


def test_train_new_artifacts(rundir):
    names = {p.name for p in rundir.iterdir()}
    assert {"models", "args.json", "hyperparams", "training_stats", "trace"} <= names
    models = sorted(os.listdir(rundir / "models"))
    assert len(models) == 4  # chain 6, burn-in 3 -> saves at 3,4,5,6
    args = json.loads((rundir / "args.json").read_text())
    assert args["model_type"] == "lasso_base"
    trace_lines = (rundir / "trace").read_text().strip().split("\n")
    assert len(trace_lines) == 7  # initial + 6 iterations
    rec = json.loads(trace_lines[0])
    assert len(rec) == 2 and rec[0]["num_markers"] == 8


def test_predict_csv(simdir, rundir):
    out = run_cli(
        "predict", simdir / "test", simdir / "train.groups",
        "-m", rundir / "models",
    )
    rows = list(csv.reader(out.strip().split("\n")))
    assert len(rows) == 4  # one row per posterior sample
    assert len(rows[0]) == 80  # one column per individual
    float(rows[0][0])


def test_predict_packed_matches_dense(simdir, rundir):
    dense = run_cli(
        "predict", simdir / "test", simdir / "train.groups",
        "-m", rundir / "models",
    )
    packed = run_cli(
        "predict", simdir / "test", simdir / "train.groups",
        "-m", rundir / "models", "--packed-genotypes",
    )
    a = np.array([[float(v) for v in r] for r in csv.reader(dense.strip().split("\n"))])
    b = np.array([[float(v) for v in r] for r in csv.reader(packed.strip().split("\n"))])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_branch_r2(simdir, rundir):
    out = run_cli(
        "branch-r2", simdir / "test", simdir / "test.phen",
        simdir / "train.groups", "-m", rundir / "models",
    )
    rows = list(csv.reader(out.strip().split("\n")))
    assert len(rows) == 4 and len(rows[0]) == 2  # per branch


def test_activations_gradients_effect_sizes(simdir, rundir):
    run_cli(
        "activations", simdir / "test", simdir / "train.groups",
        "-m", rundir / "models",
    )
    acts = json.loads((rundir / "activations" / "3.json").read_text())
    assert len(acts) == 2  # branches
    assert len(acts[0]) == 2  # layers (depth 0 -> summary + output)
    assert len(acts[0][0]) == 80

    run_cli(
        "gradients", simdir / "test", simdir / "test.phen",
        simdir / "train.groups", "-m", rundir / "models",
    )
    g = json.loads((rundir / "gradients" / "3.json").read_text())
    assert len(g) == 2 and "wrt_weights" in g[0]

    run_cli(
        "population-effect-sizes", simdir / "test", simdir / "test.phen",
        simdir / "train.groups", "-m", rundir / "models",
    )
    pes = json.loads((rundir / "population_effect_sizes" / "3.json").read_text())
    assert len(pes) == 16  # total markers


def test_train_old_model(simdir, rundir, tmp_path):
    model = sorted((rundir / "models").iterdir())[0]
    out = tmp_path / "retrain"
    run_cli(
        "train",
        simdir / "train", simdir / "train.phen", simdir / "train.groups",
        "lasso-base", model, "--perturb-params", "0.05",
        "4", "10", "--outpath", out, "--seed", "7", "--burn-in", "2",
    )
    (d,) = list(out.iterdir())
    assert "dtheta0.05" in d.name
    assert len(os.listdir(d / "models")) == 3


def test_group_by_genes_cli(fixtures, tmp_path):
    out = run_cli(
        "group-by-genes", fixtures / "small.bim", fixtures / "small.gff3", "1",
        "-o", tmp_path,
    ).strip()
    lines = open(out).read().strip().split("\n")
    assert all(len(l.split()) == 2 for l in lines)
    meta = json.loads((tmp_path / "small.gene_grouping_meta").read_text())
    assert meta["0"]["feature"] == "gene"


def test_group_by_ld_cli(fixtures, tmp_path):
    import shutil

    for ext in (".bim", ".ld"):
        shutil.copy(fixtures / f"small{ext}", tmp_path / f"small{ext}")
    out = run_cli("group-by-ld", tmp_path / "small", "-o", tmp_path).strip()
    lines = open(out).read().strip().split("\n")
    groups = {}
    for l in lines:
        m, g = map(int, l.split())
        groups.setdefault(g, []).append(m)
    assert sorted(groups[0]) == [0, 1, 2, 3]


def test_simulate_y_cli(fixtures, tmp_path):
    # uniform grouping over the 11 fixture markers
    groups_file = tmp_path / "g.groups"
    groups_file.write_text("".join(f"{i}\t{i // 6}\n" for i in range(11)))
    run_cli(
        "simulate-y", fixtures / "small", fixtures / "small", groups_file,
        "ridge-base", "tanh", "-d", "0", "-o", tmp_path, "0.7",
        "--seed", "3",
    )
    d = [p for p in tmp_path.iterdir() if p.is_dir()][0]
    assert (d / "train.phen").exists() and (d / "model.params").exists()


def test_simulate_linear_model(tmp_path):
    run_cli(
        "simulate-xy", "linear", "tanh", "6", "2", "50", "1", "0", "0.6",
        "--seed", "1", "-p", "0.5", "-o", tmp_path,
    )
    d = [p for p in tmp_path.iterdir() if p.is_dir()][0]
    params = json.loads((d / "model.params").read_text())
    assert params["num_branches"] == 2
    effects = np.array(params["effects"]).ravel()
    assert (effects == 0).sum() > 0  # sparse


def test_analyze_with_sim_and_plots(simdir, rundir, tmp_path):
    pytest.importorskip("matplotlib")
    out = json.loads(run_cli(
        "analyze", rundir, "--sim", simdir, "--plots", tmp_path / "plots",
    ))
    assert out["iterations"] == 6
    assert "posterior_mean_vs_truth" in out
    written = {p.name for p in (tmp_path / "plots").iterdir()}
    assert {
        "training_stats.png", "posterior_means.png", "branch_trace.png",
        "r2_lpd.png", "perf_r2.png",
    } <= written


def test_empty_model_scan_is_an_error(simdir, rundir):
    """Pointing -m at the run dir (instead of <run>/models) used to emit
    zero CSV rows with rc=0 (VERDICT r3); it must now fail loudly with a
    hint at the models subdirectory."""
    with pytest.raises(SystemExit) as exc:
        run_cli(
            "predict", simdir / "test", simdir / "train.groups",
            "-m", rundir,
        )
    msg = str(exc.value)
    assert "no <ix>.npz model samples" in msg and "models" in msg


def test_model_scan_missing_dir_is_an_error(simdir, tmp_path):
    with pytest.raises(SystemExit) as exc:
        run_cli(
            "predict", simdir / "test", simdir / "train.groups",
            "-m", tmp_path / "nope",
        )
    assert "not a directory" in str(exc.value)


def test_x_bf16_requires_feat_major(simdir, tmp_path):
    """--x-bf16 without --feat-major used to be silently ignored (ADVICE
    r3); it must now exit with an error."""
    with pytest.raises(SystemExit) as exc:
        run_cli(
            "train-new",
            simdir / "train", simdir / "train.phen", simdir / "train.groups",
            "lasso-base", "tanh", "0", "2", "3",
            "--outpath", tmp_path, "--seed", "2", "--x-bf16",
        )
    assert "--x-bf16 requires --feat-major" in str(exc.value)
