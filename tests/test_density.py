"""Golden-value tests of the branch math against the reference's pinned f32
expectations (ridge_base.rs:370-589 and mirrors in the other branch files).

The scenario: 3 markers, one hidden layer of width 2, summary width 1,
weights [[0,1,2],[3,4,5]] (column-major), summary weights [1,2], output
weight 2, biases [0,1] and [2]; x is the 4x3 matrix from the reference tests,
y = [0, 2, 1, 1.5].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_bann_tpu.models import density as D
from rs_bann_tpu.models import params as P
from rs_bann_tpu.models.arch import NetArch

ARCH = NetArch(m=(3,), h=(2,), s=(1,), depth=1, pad_multiple=1)
X = jnp.array([[1.0, 1.0, 0.0], [0.0, 1.0, 2.0], [0.0, 2.0, 0.0], [2.0, 0.0, 1.0]])
Y = jnp.array([0.0, 2.0, 1.0, 1.5])
HYPER = D.Hyperparameters(3.0, 2.0, 3.0, 2.0, 4.0, 5.0)


def make_branch():
    w0 = jnp.array([[0.0, 3.0], [1.0, 4.0], [2.0, 5.0]])
    w1 = jnp.array([[1.0], [2.0]])
    w2 = jnp.array([[2.0]])
    b0 = jnp.array([0.0, 1.0])
    b1 = jnp.array([2.0])
    return (w0, w1, w2), (b0, b1)


def uniform_precisions(v):
    return tuple(jnp.full((1, 1), v) for _ in range(3))


def uniform_bias_precisions(v):
    return tuple(jnp.full((1,), v) for _ in range(2))


def test_forward_feed_golden():
    """ridge_base.rs:370-419."""
    weights, biases = make_branch()
    _, acts = D.forward("tanh", weights, biases, X)
    exp0 = np.array(
        [0.7615942, 0.9999092, 0.9640276, 0.9640276, 0.99999976, 1.0, 0.99999994, 1.0]
    )
    np.testing.assert_allclose(np.asarray(acts[0]).T.reshape(-1), exp0, rtol=1e-4)
    exp1 = np.array([0.99985373, 0.99990916, 0.9999024, 0.9999024])
    np.testing.assert_allclose(np.asarray(acts[1]).reshape(-1), exp1, rtol=1e-4)
    exp2 = np.array([1.9997075, 1.9998183, 1.9998049, 1.9998049])
    np.testing.assert_allclose(np.asarray(acts[2]).reshape(-1), exp2, rtol=1e-4)


def test_rss_golden():
    weights, biases = make_branch()
    assert float(D.branch_rss("tanh", weights, biases, X, Y)) == pytest.approx(
        5.248245, rel=1e-4
    )


def test_log_density_joint_golden():
    """ridge_base.rs:421-470."""
    weights, biases = make_branch()
    lam = uniform_precisions(2.0)
    blam = uniform_bias_precisions(2.0)
    rss = D.branch_rss("tanh", weights, biases, X, Y)
    st = D.slice_branch(D.branch_statics(ARCH), 0)

    ld_e = D.joint_rss_term(jnp.asarray(2.0), rss, HYPER, 4.0)
    assert float(ld_e) == pytest.approx(-2.182509, rel=1e-4)

    ld_w = D._joint_local_weights("ridge_base", weights, lam, HYPER, st) + (
        D._joint_output_weights(
            "ridge_base", weights, lam, HYPER, jnp.asarray(0.0), jnp.asarray(1.0)
        )
    )
    assert float(ld_w) == pytest.approx(-58.428806, rel=1e-4)

    ld_b = D._joint_biases(biases, blam, HYPER, st)
    assert float(ld_b) == pytest.approx(-3.1876905, rel=1e-4)

    ld = D.log_density_joint(
        "ridge_base", weights, biases, lam, blam, jnp.asarray(2.0), rss,
        HYPER, st, jnp.asarray(0.0), jnp.asarray(1.0), 4.0,
    )
    assert float(ld) == pytest.approx(-63.799007, rel=1e-4)


def test_log_density_gradient_golden():
    """ridge_base.rs:544-589: jax.grad of the marginal density reproduces the
    reference's hand-written backprop + prior gradients."""
    weights, biases = make_branch()
    lam = uniform_precisions(1.0)
    pot = D.potential_fn("ridge_base", "tanh")
    gw, gb = jax.grad(pot, argnums=(0, 1))(
        weights, biases, lam, jnp.asarray(1.0), X, Y
    )
    exp_w0 = np.array([-0.0005189283, -1.0005465, -2.0000138, -3.0, -4.0, -5.0])
    np.testing.assert_allclose(
        np.asarray(gw[0]).T.reshape(-1), exp_w0, rtol=2e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gw[1]).reshape(-1), [-1.0014552, -2.0017552], rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(gw[2]).reshape(-1), [-5.4986963], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gb[0]), [-0.00053271546, 0.0], rtol=2e-3, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(gb[1]), [-0.0017552058], rtol=2e-3)


def test_log_density_gradient_joint_golden():
    """ridge_base.rs:472-542: joint gradients incl. precision coordinates."""
    weights, biases = make_branch()
    lam = uniform_precisions(2.0)
    blam = uniform_bias_precisions(2.0)
    st = D.slice_branch(D.branch_statics(ARCH), 0)
    pot = D.joint_potential_fn("ridge_base", "tanh")
    g = jax.grad(pot, argnums=(0, 1, 2, 3, 4))(
        weights, biases, lam, blam, jnp.asarray(2.0), X, Y,
        HYPER, st, jnp.asarray(0.0), jnp.asarray(1.0),
    )
    exp_w0 = np.array([-0.0010378566, -2.00109287, -4.00002756, -6.0, -8.0, -10.0])
    np.testing.assert_allclose(
        np.asarray(g[0][0]).T.reshape(-1), exp_w0, rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(g[0][2]).reshape(-1), [-10.997393], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g[1][0]), [-0.0010654309, -2.0], rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(g[1][1]), [-4.0035105], rtol=1e-3)
    exp_wp = [[-25.5], [-1.5], [-0.45000005]]
    for got, exp in zip(g[2], exp_wp):
        np.testing.assert_allclose(np.asarray(got).reshape(-1), exp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g[3][0]).reshape(-1), [0.5], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g[3][1]).reshape(-1), [-1.25], rtol=1e-5)
    assert float(g[4]) == pytest.approx(-0.32412243, rel=1e-4)


@pytest.mark.parametrize(
    "model_type", ["ridge_base", "ridge_ard", "lasso_base", "lasso_ard", "std_normal"]
)
def test_numeric_vs_autodiff_gradient(model_type):
    """The reference's de-facto correctness oracle (branch_sampler.rs:467-504):
    finite differences of the log density match the gradient within 1e-2."""
    rng = np.random.default_rng(0)
    weights, biases = make_branch()
    weights = tuple(w + 0.1 * rng.standard_normal(w.shape).astype(np.float32) for w in weights)
    if D.is_ard(model_type):
        lam = (
            jnp.asarray(rng.uniform(0.5, 2.0, (3, 1)).astype(np.float32)),
            jnp.asarray(rng.uniform(0.5, 2.0, (2, 1)).astype(np.float32)),
            jnp.full((1, 1), 1.3),
        )
    else:
        lam = tuple(jnp.full((1, 1), v) for v in (0.7, 1.1, 1.3))
    pot = D.potential_fn(model_type, "tanh")
    err = jnp.asarray(0.9)

    def f_flat(vec):
        ws, bs, ix = [], [], 0
        for w in weights:
            ws.append(vec[ix : ix + w.size].reshape(w.shape))
            ix += w.size
        for b in biases:
            bs.append(vec[ix : ix + b.size].reshape(b.shape))
            ix += b.size
        return pot(tuple(ws), tuple(bs), lam, err, X, Y)

    vec = jnp.concatenate(
        [w.reshape(-1) for w in weights] + [b.reshape(-1) for b in biases]
    )
    analytic = jax.grad(f_flat)(vec)
    delta = 1e-3
    num = np.zeros(vec.size)
    f0 = float(f_flat(vec))
    for i in range(vec.size):
        num[i] = (float(f_flat(vec.at[i].add(delta))) - f0) / delta
    np.testing.assert_allclose(np.asarray(analytic), num, atol=2e-2)


@pytest.mark.parametrize(
    "name,x,expected",
    [
        ("relu", [-1.0, 0.0, 2.0], [0.0, 0.0, 2.0]),
        ("leaky_relu", [-1.0, 0.0, 2.0], [-0.01, 0.0, 2.0]),
        ("identity", [-1.0, 0.0, 2.0], [-1.0, 0.0, 2.0]),
    ],
)
def test_activation_values(name, x, expected):
    """activation_functions.rs:22-45 semantics, incl. LeakyReLU slope 0.01."""
    from rs_bann_tpu.ops.activations import activation

    np.testing.assert_allclose(
        np.asarray(activation(name)(jnp.asarray(x))), expected, atol=1e-7
    )


def test_activation_cli_name_mapping():
    from rs_bann_tpu.ops.activations import canonical

    assert canonical("re-lu") == "relu"
    assert canonical("leaky-re-lu") == "leaky_relu"
    assert canonical("SiLU") == "silu"
    with pytest.raises(ValueError):
        canonical("swishy")


def test_top_level_api():
    import rs_bann_tpu

    assert rs_bann_tpu.NetArch is not None
    assert rs_bann_tpu.MCMCCfg(chain_length=3).burn_in == 2
