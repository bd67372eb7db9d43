"""Reference bincode model-file interop (io/refmodel.py).

The reference serializes the full ``Net`` struct with bincode 1.3.3
defaults (net.rs:107-115). No Rust toolchain exists in this image, so the
format is pinned three ways: a byte-level golden of a minimal hand-computed
net, write->read round-trips across model families, and npz<->bin
conversion equivalence on predictions.
"""

import struct

import numpy as np
import pytest

from rs_bann_tpu.io import refmodel
from rs_bann_tpu.io.refmodel import RefBranchCfg, RefNet
from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net


def _tiny_refnet():
    """G=1, depth=0 (layer_widths [s=2, 1]), m=2, ridge_base."""
    w0 = np.asarray([[1.0, 3.0], [2.0, 4.0]], np.float32)  # (m=2, s=2)
    w1 = np.asarray([[5.0], [6.0]], np.float32)  # (s=2, 1)
    cfg = RefBranchCfg(
        num_params=8, num_weights=6, num_markers=2, layer_widths=[2, 1],
        weights=[w0, w1], biases=[np.asarray([7.0, 8.0], np.float32)],
        ows_reg_sum=61.0, ows_num_params=2,
        weight_precisions=[np.asarray([1.5], np.float32),
                           np.asarray([2.5], np.float32)],
        bias_precisions=[np.asarray([3.5], np.float32)],
        error_precision=np.asarray([4.5], np.float32),
        activation="tanh",
    )
    return RefNet(
        hyperparams=[3.0, 1.0, 3.0, 1.0, 3.0, 1.0],
        num_branches=1, branch_cfgs=[cfg],
        output_bias=[4.5, 1.0, 0.25],
        mse_train=np.asarray([9.0], np.float32),
        mse_test=None,
        lpd=np.asarray([], np.float32),
        lpd_local_terms=np.asarray([0.0], np.float32),
        gp_error_precision=4.5, gp_output_layer_precision=2.5,
        gp_ows_reg_sum=61.0, gp_ows_num_params=2,
    )


def test_golden_bytes(tmp_path):
    """Byte-for-byte against hand-assembled bincode 1.3.3 output."""
    p = tmp_path / "model.bin"
    refmodel.write_net(_tiny_refnet(), p)
    got = p.read_bytes()

    f = lambda *v: struct.pack(f"<{len(v)}f", *v)
    q = lambda *v: struct.pack(f"<{len(v)}Q", *v)
    fv = lambda *v: q(len(v)) + f(*v)  # Vec<f32>
    exp = (
        f(3.0, 1.0, 3.0, 1.0, 3.0, 1.0)  # hyperparams
        + q(1)  # num_branches
        + q(1)  # Vec<BranchCfg> len
        + q(8, 6, 2)  # num_params, num_weights, num_markers
        + q(2, 2, 1)  # layer_widths [2, 1]
        + q(2)  # Vec<Vec<f32>> weights len
        + fv(1.0, 2.0, 3.0, 4.0)  # w0 column-major
        + fv(5.0, 6.0)  # w1
        + q(1) + fv(7.0, 8.0)  # biases
        + q(2, 2, 1)  # params.layer_widths
        + q(2)  # params.num_markers
        + f(61.0) + q(2)  # output weight summary stats
        + q(2) + fv(1.5) + fv(2.5)  # weight_precisions
        + q(1) + fv(3.5)  # bias_precisions
        + fv(4.5)  # error_precision
        + struct.pack("<I", 0)  # ActivationFunction::Tanh
        + f(4.5, 1.0, 0.25)  # OutputBias
        + q(0, 0, 0)  # TrainingStats counters
        + fv(9.0)  # mse_train
        + b"\x00"  # mse_test: None
        + fv()  # lpd
        + f(0.0, 0.0)  # LPD rss/output terms
        + fv(0.0)  # LPD local terms
        + f(4.5, 2.5)  # GlobalParams precisions
        + f(61.0) + q(2)  # GlobalParams summary stats
    )
    assert got == exp


def test_read_round_trip(tmp_path):
    p = tmp_path / "model.bin"
    ref = _tiny_refnet()
    refmodel.write_net(ref, p)
    back = refmodel.read_net(p)
    assert back.num_branches == 1
    assert back.hyperparams == ref.hyperparams
    b = back.branch_cfgs[0]
    np.testing.assert_array_equal(b.weights[0], ref.branch_cfgs[0].weights[0])
    np.testing.assert_array_equal(b.weights[1], ref.branch_cfgs[0].weights[1])
    np.testing.assert_array_equal(b.biases[0], ref.branch_cfgs[0].biases[0])
    assert b.activation == "tanh"
    assert b.ows_reg_sum == 61.0 and b.ows_num_params == 2
    assert back.mse_test is None
    assert back.output_bias == [4.5, 1.0, 0.25]
    assert back.gp_ows_num_params == 2


@pytest.mark.parametrize("model_type,depth", [
    ("ridge_base", 0), ("ridge_ard", 1), ("lasso_base", 1), ("lasso_ard", 0),
])
def test_net_conversion_round_trip(tmp_path, model_type, depth):
    """Net -> RefNet -> bytes -> RefNet -> Net preserves predictions."""
    arch = NetArch.uniform(3, 5, 4, depth, 2, activation="tanh")
    state, _ = init_net(arch, model_type, InitCfg(seed=7))
    net = Net(model_type, arch, D.Hyperparameters(), state)

    p = tmp_path / "model.bin"
    refmodel.write_net(refmodel.from_net(net), p)
    net2 = refmodel.to_net(refmodel.read_net(p), model_type)

    assert net2.arch.m == arch.m and net2.arch.depth == depth
    rng = np.random.default_rng(0)
    X = rng.standard_normal((3, 16, arch.m_pad)).astype(np.float32)
    X[:, :, 5:] = 0.0  # padding lanes
    np.testing.assert_allclose(
        np.asarray(net.predict(X)), np.asarray(net2.predict(X)),
        rtol=1e-5, atol=1e-6,
    )
    # precisions survive (incl. ARD per-row rows)
    for l in range(arch.num_layers):
        a = np.asarray(net.state.precisions.weights[l])
        b = np.asarray(net2.state.precisions.weights[l])
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_cli_import_export(tmp_path):
    """export-ref-model then import-ref-model reproduces the npz model."""
    arch = NetArch.uniform(2, 4, 3, 0, 3)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=1))
    net = Net("ridge_base", arch, D.Hyperparameters(), state)
    models = tmp_path / "models"
    models.mkdir()
    net.save(str(models / "1.npz"))
    net.save(str(models / "2.npz"))

    from rs_bann_tpu.cli.main import main

    main(["export-ref-model", str(models), "-o", str(tmp_path / "bin")])
    assert (tmp_path / "bin" / "1.bin").is_file()
    main([
        "import-ref-model", str(tmp_path / "bin"),
        "--model-type", "ridge_base", "-o", str(tmp_path / "back"),
    ])
    back = Net.load(str(tmp_path / "back" / "1.npz"))
    rng = np.random.default_rng(3)
    X = rng.standard_normal((2, 8, arch.m_pad)).astype(np.float32)
    X[:, :, 4:] = 0.0
    np.testing.assert_allclose(
        np.asarray(net.predict(X)), np.asarray(back.predict(X)),
        rtol=1e-5, atol=1e-6,
    )
