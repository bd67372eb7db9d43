import sys, os, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from rs_bann_tpu.models import density as D
from rs_bann_tpu.models.arch import NetArch
from rs_bann_tpu.models.init import InitCfg, init_net
from rs_bann_tpu.models.net import Net
from rs_bann_tpu.samplers.mcmc_cfg import MCMCCfg

G, m, n, h, depth, C, L = 64, 64, 4096, 32, 1, 4, 64
arch = NetArch.uniform(G, m, h, depth, h)
state, _ = init_net(arch, "ridge_base", InitCfg(seed=0))
net = Net("ridge_base", arch, D.Hyperparameters(), state)
rng = np.random.default_rng(0)
Xf = np.zeros((G, arch.m_pad, n), np.float32)
Xf[:, :m, :] = rng.standard_normal((G, m, n), dtype=np.float32)
X = D.FeatX(jnp.asarray(Xf, dtype=jnp.bfloat16))
y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
cfg = MCMCCfg(chain_length=1, burn_in=10**9, hmc_integration_length=L,
              hmc_step_size_mode="izmailov", update_mode="parallel",
              num_chains=C, seed=0)
keys = jax.random.split(jax.random.key(0), C)
carry = jax.jit(lambda s, X_, y_, ks: jax.vmap(lambda k: net.init_carry(X_, y_, k, state=s))(ks))(net.state, X, y, keys)
sweep = jax.jit(jax.vmap(net.make_sweep(cfg), in_axes=(0,None,None)))
carry, st = sweep(carry, X, y)
print("warm mse:", float(np.asarray(st.mse_train).ravel()[0]))
import shutil; shutil.rmtree("/tmp/jax_trace_r5", ignore_errors=True)
with jax.profiler.trace("/tmp/jax_trace_r5"):
    for _ in range(3):
        carry, st = sweep(carry, X, y)
    _ = float(np.asarray(st.mse_train).ravel()[0])
print("trace done")

# Parse with (PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python):
#   from tensorflow.tsl.profiler.protobuf import xplane_pb2
#   ... sum event durations per event_metadata name (see ROADMAP r5 notes)
#
# r5 measured attribution at the flagship shape (G=64 m=64 n=4096 h=32 C=4
# L=64, 3 sweeps traced):
#   jit_sweep_parallel total 65.4 ms, of which the folded trajectory kernel
#   %vmap_jit__traj_chains_impl__ = 60.7 ms (93%) -> the folded path (not
#   the vmap fallback) is what executes; ~7% is dispatch + async copies.
# Lever experiments (median of 4x10 sweeps, host-readback barrier):
#   NB=1/TN=4096: 24.8 ms/sweep (660k steps/s)   [default]
#   NB=2/TN=1024: 24.8 ms/sweep; NB=2/TN=512: 23.9 ms (+4%)
#   tanh->relu: -3%; tanh->identity: -12% (activation VPU share)
#   dot-form epilogue (pred/dW_out/da as blockdiag dots): -15% (SLOWER)
# Conclusion: the kernel is BALANCED across MXU issue, VPU elementwise and
# the per-step dependency chain; no single >25% lever without an
# architecture change (e.g. multi-step fusion across branches).
