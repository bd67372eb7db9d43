"""Reference model-file interop: bincode `.bin` <-> `Net` (npz).

The reference persists every posterior sample — and the simulated ground
truth — as bincode of the full ``Net`` struct
(/root/reference/src/net/net.rs:76-85, serialized with bincode 1.3.3
defaults at net.rs:107-115: little-endian, fixed-int, ``usize`` as u64,
``Vec`` length-prefixed u64, enum variants tagged u32, ``Option`` tagged
u8). This module reads and writes that exact byte format so

  * reference-produced artifacts (``model.bin``, ``models/<ix>.bin``) can
    be loaded into this framework for prediction / analysis / side-by-side
    comparison, and
  * models trained here can be exported for the reference binary to
    consume.

Serialized layout (field order = struct declaration order):

  Net                      net.rs:76-85
    hyperparams            params.rs:135-142   3 x {shape f32, scale f32}
    num_branches           u64
    branch_cfgs            Vec<BranchCfg>      branch_cfg.rs:8-16
      num_params             u64
      num_weights            u64
      num_markers            u64
      layer_widths           Vec<u64>
      params                 BranchParamsHost  params.rs:467-476
        weights                Vec<Vec<f32>>   (column-major per layer)
        biases                 Vec<Vec<f32>>
        layer_widths           Vec<u64>
        num_markers            u64
        output_weight_summary_stats  {reg_sum f32, num_params u64}
      precisions             BranchPrecisionsHost  params.rs:191-199
        weight_precisions      Vec<Vec<f32>>
        bias_precisions        Vec<Vec<f32>>
        error_precision        Vec<f32>
      activation_function    u32 tag           activation_functions.rs:6-12
    output_bias            {error_precision f32, precision f32, bias f32}
                           net.rs:30-36
    training_stats         train_stats.rs:25-32
      num_samples u64, num_accepted u64, num_early_rejected u64,
      mse_train Vec<f32>, mse_test Option<Vec<f32>>, lpd Vec<f32>
    log_posterior_density  log_posterior_density.rs:9-16
      f32, f32, Vec<f32>
    global_params          params.rs:13-18
      error_precision f32, output_layer_precision f32,
      output_weight_summary_stats {reg_sum f32, num_params u64}
    branch_type            PhantomData (zero bytes)

Weight matrices are ArrayFire column-major ``dim4(prev, curr)`` flattened
(params.rs:618-671), i.e. Fortran order.

CAVEAT — no ground-truth artifact exists: the reference repo ships no
``.bin`` file and Rust is unavailable in this image, so the byte-golden test
(tests/test_refmodel.py) is hand-assembled from the same reading of the
bincode 1.3.3 spec as this writer. A shared misreading of the spec would
pass silently; the first load of a genuinely reference-produced file is the
real validation.
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path
from typing import List, Optional

import numpy as np

# variant order of ActivationFunction (activation_functions.rs:6-12)
_ACT_TAGS = ["tanh", "relu", "leaky_relu", "silu", "identity"]


# ------------------------------------------------------------------ structs


@dataclasses.dataclass
class RefBranchCfg:
    num_params: int
    num_weights: int
    num_markers: int
    layer_widths: List[int]
    # BranchParamsHost
    weights: List[np.ndarray]  # per layer, (prev, curr) f32
    biases: List[np.ndarray]  # per non-output layer, (curr,) f32
    ows_reg_sum: float
    ows_num_params: int
    # BranchPrecisionsHost
    weight_precisions: List[np.ndarray]
    bias_precisions: List[np.ndarray]
    error_precision: np.ndarray  # (1,) f32
    activation: str


@dataclasses.dataclass
class RefNet:
    hyperparams: List[float]  # 6 floats: dense/summary/output x shape/scale
    num_branches: int
    branch_cfgs: List[RefBranchCfg]
    output_bias: List[float]  # [error_precision, precision, bias]
    # TrainingStats
    num_samples: int = 0
    num_accepted: int = 0
    num_early_rejected: int = 0
    mse_train: Optional[np.ndarray] = None
    mse_test: Optional[np.ndarray] = None
    lpd: Optional[np.ndarray] = None
    # LogPosteriorDensity
    lpd_rss_term: float = 0.0
    lpd_output_term: float = 0.0
    lpd_local_terms: Optional[np.ndarray] = None
    # GlobalParams
    gp_error_precision: float = 1.0
    gp_output_layer_precision: float = 1.0
    gp_ows_reg_sum: float = 0.0
    gp_ows_num_params: int = 0


# ------------------------------------------------------------------- reader


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u64(self) -> int:
        (v,) = struct.unpack_from("<Q", self.buf, self.pos)
        self.pos += 8
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.pos)
        self.pos += 4
        return v

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def f32(self) -> float:
        (v,) = struct.unpack_from("<f", self.buf, self.pos)
        self.pos += 4
        return v

    def f32_vec(self) -> np.ndarray:
        n = self.u64()
        out = np.frombuffer(self.buf, "<f4", count=n, offset=self.pos).copy()
        self.pos += 4 * n
        return out

    def u64_vec(self) -> List[int]:
        n = self.u64()
        out = np.frombuffer(self.buf, "<u8", count=n, offset=self.pos)
        self.pos += 8 * n
        return [int(v) for v in out]

    def vec_of_f32_vec(self) -> List[np.ndarray]:
        return [self.f32_vec() for _ in range(self.u64())]


def _read_branch_cfg(c: _Cursor) -> RefBranchCfg:
    num_params = c.u64()
    num_weights = c.u64()
    num_markers = c.u64()
    layer_widths = c.u64_vec()
    # BranchParamsHost
    flat_weights = c.vec_of_f32_vec()
    biases = c.vec_of_f32_vec()
    p_layer_widths = c.u64_vec()
    p_num_markers = c.u64()
    ows_reg_sum = c.f32()
    ows_num_params = c.u64()
    # BranchPrecisionsHost
    weight_precisions = c.vec_of_f32_vec()
    bias_precisions = c.vec_of_f32_vec()
    error_precision = c.f32_vec()
    act = _ACT_TAGS[c.u32()]
    if p_layer_widths != layer_widths or p_num_markers != num_markers:
        raise ValueError("Inconsistent BranchCfg/BranchParamsHost metadata")
    # reshape column-major: layer l maps prev -> curr
    weights = []
    prev = num_markers
    for curr, flat in zip(layer_widths, flat_weights):
        weights.append(flat.reshape(prev, curr, order="F"))
        prev = curr
    return RefBranchCfg(
        num_params, num_weights, num_markers, layer_widths, weights,
        [np.asarray(b) for b in biases], ows_reg_sum, ows_num_params,
        weight_precisions, bias_precisions, error_precision, act,
    )


def read_net(path) -> RefNet:
    """Parse a reference ``model.bin`` / ``models/<ix>.bin``."""
    c = _Cursor(Path(path).read_bytes())
    hyper = [c.f32() for _ in range(6)]
    num_branches = c.u64()
    n_cfg = c.u64()
    cfgs = [_read_branch_cfg(c) for _ in range(n_cfg)]
    output_bias = [c.f32(), c.f32(), c.f32()]
    num_samples = c.u64()
    num_accepted = c.u64()
    num_early_rejected = c.u64()
    mse_train = c.f32_vec()
    mse_test = c.f32_vec() if c.u8() else None
    lpd = c.f32_vec()
    lpd_rss = c.f32()
    lpd_out = c.f32()
    lpd_local = c.f32_vec()
    gp_err = c.f32()
    gp_outp = c.f32()
    gp_reg_sum = c.f32()
    gp_num_params = c.u64()
    if c.pos != len(c.buf):
        raise ValueError(
            f"Trailing bytes in {path}: consumed {c.pos} of {len(c.buf)}"
        )
    return RefNet(
        hyper, num_branches, cfgs, output_bias,
        num_samples, num_accepted, num_early_rejected,
        mse_train, mse_test, lpd, lpd_rss, lpd_out, lpd_local,
        gp_err, gp_outp, gp_reg_sum, gp_num_params,
    )


# ------------------------------------------------------------------- writer


def write_net(ref: RefNet, path) -> None:
    """Serialize a ``RefNet`` in the reference's exact bincode layout."""
    out = bytearray()
    pk = out.extend

    def u64(v):
        pk(struct.pack("<Q", int(v)))

    def f32(v):
        pk(struct.pack("<f", float(v)))

    def f32_vec(a):
        a = np.asarray([] if a is None else a, "<f4")
        u64(a.size)
        pk(a.tobytes())

    for v in ref.hyperparams:
        f32(v)
    u64(ref.num_branches)
    u64(len(ref.branch_cfgs))
    for b in ref.branch_cfgs:
        u64(b.num_params)
        u64(b.num_weights)
        u64(b.num_markers)
        u64(len(b.layer_widths))
        for w in b.layer_widths:
            u64(w)
        u64(len(b.weights))
        for w in b.weights:
            f32_vec(np.asarray(w, np.float32).reshape(-1, order="F"))
        u64(len(b.biases))
        for bb in b.biases:
            f32_vec(bb)
        u64(len(b.layer_widths))
        for w in b.layer_widths:
            u64(w)
        u64(b.num_markers)
        f32(b.ows_reg_sum)
        u64(b.ows_num_params)
        u64(len(b.weight_precisions))
        for wp in b.weight_precisions:
            f32_vec(wp)
        u64(len(b.bias_precisions))
        for bp in b.bias_precisions:
            f32_vec(bp)
        f32_vec(b.error_precision)
        pk(struct.pack("<I", _ACT_TAGS.index(b.activation)))
    for v in ref.output_bias:
        f32(v)
    u64(ref.num_samples)
    u64(ref.num_accepted)
    u64(ref.num_early_rejected)
    f32_vec(ref.mse_train)
    if ref.mse_test is None:
        pk(b"\x00")
    else:
        pk(b"\x01")
        f32_vec(ref.mse_test)
    f32_vec(ref.lpd)
    f32(ref.lpd_rss_term)
    f32(ref.lpd_output_term)
    f32_vec(
        ref.lpd_local_terms
        if ref.lpd_local_terms is not None
        else np.zeros(ref.num_branches, np.float32)
    )
    f32(ref.gp_error_precision)
    f32(ref.gp_output_layer_precision)
    f32(ref.gp_ows_reg_sum)
    u64(ref.gp_ows_num_params)
    Path(path).write_bytes(bytes(out))


# -------------------------------------------------------------- conversion


def to_net(ref: RefNet, model_type: str):
    """Convert a parsed reference model into a framework ``Net``.

    ``model_type`` comes from the run's ``args.json`` — the reference does
    not store it in the model file either (it re-reads args.json at
    rs-bann.rs:281-286).
    """
    import jax.numpy as jnp

    from ..models import density as D
    from ..models.arch import NetArch
    from ..models.net import Net
    from ..models.params import NetState, StackedParams, StackedPrecisions

    G = ref.num_branches
    cfgs = ref.branch_cfgs
    if len(cfgs) != G:
        raise ValueError("branch_cfgs length != num_branches")
    depth = len(cfgs[0].layer_widths) - 2
    if any(len(b.layer_widths) - 2 != depth for b in cfgs):
        raise ValueError("Branches of different depth are not supported")
    for g, b in enumerate(cfgs):
        # the NetArch hidden width is inferred from layer_widths[0]; a file
        # with non-uniform hidden widths (or a non-scalar output) would
        # otherwise convert silently into a different, zero-padded model
        if any(b.layer_widths[i] != b.layer_widths[0] for i in range(depth)):
            raise ValueError(
                f"branch {g}: non-uniform hidden widths {b.layer_widths} "
                "are not representable in NetArch"
            )
        if b.layer_widths[-1] != 1:
            raise ValueError(
                f"branch {g}: output width {b.layer_widths[-1]} != 1"
            )
    m = tuple(b.num_markers for b in cfgs)
    h = tuple(
        (b.layer_widths[0] if depth > 0 else 0) for b in cfgs
    )
    s = tuple(b.layer_widths[-2] for b in cfgs)
    act = cfgs[0].activation
    arch = NetArch(m=m, h=h, s=s, depth=depth, activation=act)
    L = arch.num_layers

    weights, biases, wprec, bprec = [], [], [], []
    ard = model_type in ("ridge_ard", "lasso_ard")
    for l in range(L):
        ip, op = arch.layer_in_pad(l), arch.layer_out_pad(l)
        w = np.zeros((G, ip, op), np.float32)
        for g, b in enumerate(cfgs):
            wi, wo = b.weights[l].shape
            w[g, :wi, :wo] = b.weights[l]
        weights.append(jnp.asarray(w))
        # ARD: per-input-row precisions for all but the output layer
        # (ridge_ard.rs:271-301); Base: one per layer
        pin = ip if (ard and l < L - 1) else 1
        wp = np.ones((G, pin, 1), np.float32)
        for g, b in enumerate(cfgs):
            vals = np.asarray(b.weight_precisions[l], np.float32)
            if pin == 1:
                wp[g, 0, 0] = vals[0]
            else:
                wp[g, : vals.size, 0] = vals
        wprec.append(jnp.asarray(wp))
        if l < L - 1:
            bias = np.zeros((G, op), np.float32)
            bp = np.ones((G, 1), np.float32)
            for g, b in enumerate(cfgs):
                bias[g, : b.biases[l].size] = b.biases[l]
                bp[g, 0] = b.bias_precisions[l][0]
            biases.append(jnp.asarray(bias))
            bprec.append(jnp.asarray(bp))

    state = NetState(
        StackedParams(tuple(weights), tuple(biases)),
        StackedPrecisions(
            tuple(wprec), tuple(bprec),
            jnp.asarray(ref.gp_error_precision, jnp.float32),
        ),
        jnp.asarray(ref.output_bias[2], jnp.float32),
        jnp.asarray(ref.output_bias[1], jnp.float32),
    )
    hyper = D.Hyperparameters(*ref.hyperparams)
    return Net(model_type, arch, hyper, state)


def from_net(net, model_type: Optional[str] = None) -> RefNet:
    """Convert a framework ``Net`` into reference bincode form."""
    from ..models import params as P

    model_type = model_type or net.model_type
    arch = net.arch
    st = net.state
    G, L = arch.num_branches, arch.num_layers
    ard = model_type in ("ridge_ard", "lasso_ard")
    ins = [np.asarray(a) for a in arch.layer_in_counts()]
    outs = [np.asarray(a) for a in arch.layer_out_counts()]

    wsum = 0.0
    n_out_w = 0
    out_w = np.asarray(st.params.weights[-1])  # [G, s_pad, 1]
    for g in range(G):
        w = out_w[g, : arch.s[g], 0]
        wsum += float(np.sum(np.abs(w)) if "lasso" in model_type
                      else np.sum(w * w))
        n_out_w += arch.s[g]

    cfgs = []
    for g in range(G):
        layer_widths = [int(outs[l][g]) for l in range(L)]
        weights, biases, wprec, bprec = [], [], [], []
        for l in range(L):
            wi, wo = int(ins[l][g]), int(outs[l][g])
            weights.append(np.asarray(st.params.weights[l])[g, :wi, :wo])
            vals = np.asarray(st.precisions.weights[l])[g, :, 0]
            if ard and l < L - 1:
                wprec.append(vals[:wi].astype(np.float32))
            else:
                wprec.append(np.asarray([vals[0]], np.float32))
            if l < L - 1:
                biases.append(np.asarray(st.params.biases[l])[g, :wo])
                bprec.append(
                    np.asarray([np.asarray(st.precisions.biases[l])[g, 0]],
                               np.float32)
                )
        num_weights = sum(int(ins[l][g]) * int(outs[l][g]) for l in range(L))
        num_params = num_weights + sum(layer_widths[:-1])
        err = float(np.asarray(st.precisions.error).reshape(-1)[0])
        cfgs.append(RefBranchCfg(
            num_params, num_weights, arch.m[g], layer_widths, weights,
            biases, wsum, n_out_w, wprec, bprec,
            np.asarray([err], np.float32), arch.activation,
        ))

    err = float(np.asarray(st.precisions.error).reshape(-1)[0])
    out_prec = float(np.asarray(st.precisions.weights[-1]).reshape(G, -1)[0, 0])
    return RefNet(
        list(net.hyper), G, cfgs,
        [err, float(np.asarray(st.output_bias_precision)),
         float(np.asarray(st.output_bias))],
        gp_error_precision=err,
        gp_output_layer_precision=out_prec,
        gp_ows_reg_sum=wsum,
        gp_ows_num_params=n_out_w,
        mse_train=np.zeros(0, np.float32),
        lpd=np.zeros(0, np.float32),
    )
