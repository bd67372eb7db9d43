"""Activation functions.

Parity with the reference's ``ActivationFunction`` enum
(/root/reference/src/net/activation_functions.rs:22-45). Note the reference's
LeakyReLU uses slope 0.01 on the negative side via ArrayFire's ``sign`` (which
is 1 for negative values): h(x) = x*[x>0] + 0.01*x*[x<0].

Derivatives are never hand-written here — the sampler differentiates the log
density with ``jax.grad`` — but ``dhdx`` is provided for cross-checks against
the reference's backprop conventions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ACTIVATIONS = {}


def _register(name):
    def deco(fn):
        _ACTIVATIONS[name] = fn
        return fn

    return deco


@_register("tanh")
def _tanh(x):
    return jnp.tanh(x)


@_register("relu")
def _relu(x):
    return x * (x > 0)


@_register("leaky_relu")
def _leaky_relu(x):
    return x * (x > 0) + 0.01 * x * (x < 0)


@_register("silu")
def _silu(x):
    return x * jax.nn.sigmoid(x)


@_register("identity")
def _identity(x):
    return x


# Canonical names used in serialized args.json files by the reference CLI
# (clap ValueEnum kebab-case of Tanh/ReLU/LeakyReLU/SiLU/Identity).
CLI_NAMES = {
    "tanh": "tanh",
    "re-lu": "relu",
    "relu": "relu",
    "leaky-re-lu": "leaky_relu",
    "leaky_relu": "leaky_relu",
    "si-lu": "silu",
    "silu": "silu",
    "identity": "identity",
}


def canonical(name: str) -> str:
    key = name.strip().lower().replace(" ", "")
    if key in CLI_NAMES:
        return CLI_NAMES[key]
    raise ValueError(f"unknown activation function: {name}")


def activation(name: str):
    """Return h(x) for the given activation name."""
    return _ACTIVATIONS[canonical(name)]


def dhdx(name: str):
    """Elementwise derivative, for numerical cross-checks only."""
    fn = activation(name)

    def d(x):
        return jax.vmap(jax.grad(lambda v: fn(v).sum()))(x.reshape(-1, 1)).reshape(x.shape)

    return d
