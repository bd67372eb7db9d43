"""Architecture bookkeeping and param-vector round trips.

Mirrors reference shape tests: architectures.rs:246-256 (22 params per branch
for markers=3, hidden=3, summary=2), branch_cfg_builder.rs:407-420 (17 params),
params.rs tests (param_vec order).
"""

import numpy as np
import jax.numpy as jnp

from rs_bann_tpu.models import params as P
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net


def test_num_params_reference_golden():
    # architectures.rs:246-256
    arch = NetArch.from_width_rules([3, 3], 1, ("fixed", 3), ("fixed", 2))
    assert arch.num_params_branch(0) == 22
    assert arch.num_params_branch(1) == 22
    # branch_cfg_builder.rs:407-420: markers=3, one hidden layer 3, summary 1
    arch2 = NetArch(m=(3,), h=(3,), s=(1,), depth=1)
    assert arch2.num_params_branch(0) == 17
    assert arch2.layer_widths(0) == [3, 1, 1]


def test_width_rules():
    arch = NetArch.from_width_rules(
        [20, 11], 0, ("fraction_of_input", 0.5), ("like_hidden",)
    )
    assert arch.h == (10, 5)
    assert arch.s == (10, 5)
    # width can't go below 1 (architectures.rs:103-106)
    arch2 = NetArch.from_width_rules([1], 0, ("fraction_of_input", 0.5), ("like_hidden",))
    assert arch2.h == (1,)


def test_param_vec_round_trip():
    arch = NetArch(m=(3, 2), h=(2, 2), s=(1, 1), depth=1, pad_multiple=4)
    state, _ = init_net(arch, "ridge_base", InitCfg(seed=5))
    vec = P.branch_param_vec(arch, state.params, 0)
    assert vec.shape[0] == arch.num_params_branch(0)
    # perturb and reload
    vec2 = vec + 1.5
    params2 = P.load_branch_param_vec(arch, state.params, 0, vec2)
    vec3 = P.branch_param_vec(arch, params2, 0)
    np.testing.assert_allclose(vec3, vec2, rtol=1e-6)
    # branch 1 untouched
    np.testing.assert_allclose(
        P.branch_param_vec(arch, params2, 1), P.branch_param_vec(arch, state.params, 1)
    )


def test_param_vec_reference_order():
    """params.rs:790-795: weights [0.1,0.2],[0.3], bias [0.4] -> [0.1,0.2,0.3,0.4]."""
    arch = NetArch(m=(2,), h=(1,), s=(1,), depth=0, pad_multiple=1)
    params = P.StackedParams(
        (jnp.array([[[0.1], [0.2]]]), jnp.array([[[0.3]]])),
        (jnp.array([[0.4]]),),
    )
    np.testing.assert_allclose(
        P.branch_param_vec(arch, params, 0), [0.1, 0.2, 0.3, 0.4], rtol=1e-6
    )


def test_padding_zeros_and_masks():
    arch = NetArch(m=(3, 7), h=(2, 4), s=(2, 3), depth=1, pad_multiple=8)
    state, _ = init_net(arch, "ridge_ard", InitCfg(seed=0))
    mw = P.weight_masks(arch)
    for l, w in enumerate(state.params.weights):
        np.testing.assert_array_equal(np.asarray(w * (1 - mw[l])), 0.0)
    assert arch.m_pad == 8 and arch.h_pad == 8
    # true counts survive
    wc = P.weight_counts(arch)
    assert float(wc[0][0]) == 3 * 2 and float(wc[0][1]) == 7 * 4


def test_spike_and_slab_marker_removal():
    arch = NetArch(m=(10,), h=(5,), s=(5,), depth=0)
    state, eff = init_net(
        arch, "ridge_base", InitCfg(num_effective_markers=3, seed=1)
    )
    w0 = np.asarray(state.params.weights[0][0])
    active_rows = (np.abs(w0).sum(axis=1) > 0).sum()
    assert active_rows == 3
    assert float(np.asarray(eff).sum()) == 3
