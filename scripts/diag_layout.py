"""Micro-benchmark: MXU layouts for the stacked branch leapfrog (VERDICT r2 #1).

Isolates the hot op of the flagship sweep — value_and_grad of the branch
potential, vmapped over (C, G), scanned over L leapfrog steps — and compares:

  A. sample-major (current): x [G, n, m];  z = x @ W        (lane waste 8x)
  B. feature-major:          x [G, m, n];  z = W^T @ x      (modeled 2.8x)
  C. feature-major + bf16 matmul inputs (f32 accumulation)
  D. feature-major + VPU output layer (reduce instead of matvec)

Shape: G=64, m=64, n=4096, h=32, s=32, C=4, L=64 — the BENCH flagship.
True matmul FLOPs per leapfrog step: 59.5 MF (bench.py model).
Run alone (single-client TPU tunnel).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    import jax

    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


G, m, n, h, s, C, L = 64, 64, 4096, 32, 32, 4, 64
F_TRUE = 3 * (2 * n * (m * h + h * s + s)) - 2 * n * m * h  # per branch-step


def main():
    import jax
    import jax.numpy as jnp

    log("device:", jax.devices()[0].device_kind)
    t0 = time.time()
    sync(jnp.zeros(8) + 1.0)
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    rng = np.random.default_rng(0)
    Xs = jnp.asarray(rng.standard_normal((G, n, m), dtype=np.float32))
    Xf = jnp.asarray(np.ascontiguousarray(np.asarray(Xs).transpose(0, 2, 1)))
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    W0 = jnp.asarray(rng.standard_normal((C, G, m, h), np.float32) / np.sqrt(m))
    W1 = jnp.asarray(rng.standard_normal((C, G, h, s), np.float32) / np.sqrt(h))
    W2 = jnp.asarray(rng.standard_normal((C, G, s, 1), np.float32) / np.sqrt(s))
    b0 = jnp.zeros((C, G, h))
    b1 = jnp.zeros((C, G, s))

    def pot_sample_major(params, x):
        w0, w1, w2, bb0, bb1 = params
        a = jnp.tanh(x @ w0 + bb0[None, :])
        a = jnp.tanh(a @ w1 + bb1[None, :])
        out = (a @ w2)[:, 0]
        r = out - y
        return -0.5 * jnp.sum(r * r)

    def pot_feature_major(params, xf, dtype=None, vpu_out=False):
        w0, w1, w2, bb0, bb1 = params
        if dtype is not None:
            xf = xf.astype(dtype)
        mm = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cast = (lambda v: v.astype(dtype)) if dtype is not None else (lambda v: v)
        a = jnp.tanh(mm(cast(w0.T), xf) + bb0[:, None])
        a = jnp.tanh(mm(cast(w1.T), cast(a)) + bb1[:, None])
        if vpu_out:
            out = jnp.sum(w2[:, 0][:, None] * a, axis=0)
        else:
            out = mm(cast(w2.T), cast(a))[0]
        r = out - y
        return -0.5 * jnp.sum(r * r)

    def bench(tag, pot, x, params):
        vg = jax.value_and_grad(pot)
        one = jax.vmap(jax.vmap(vg, in_axes=((0, 0, 0, 0, 0), 0)),
                       in_axes=((0, 0, 0, 0, 0), None))

        @jax.jit
        def run(params, x):
            def body(p, _):
                _, g = one(p, x)
                # mimic a leapfrog position update so the scan cannot be
                # collapsed: params move by a tiny gradient step
                p = jax.tree.map(lambda a_, g_: a_ + 1e-6 * g_, p, g)
                return p, None

            p, _ = jax.lax.scan(body, params, None, length=L)
            return p

        t0 = time.time()
        out = run(params, x)
        sync(out)
        compile_s = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = run(params, x)
        sync(out)
        dt = (time.time() - t0) / reps
        steps = C * G * L
        tf = steps * F_TRUE / dt / 1e12
        log(f"[{tag}] compile {compile_s:.1f}s; {dt*1e3:.1f} ms/run; "
            f"{steps/dt:,.0f} steps/s; {tf:.1f} TF/s true "
            f"({100*tf/197:.1f}% of bf16 peak)")
        return dt

    params = (W0, W1, W2, b0, b1)
    bench("A sample-major f32", pot_sample_major, Xs, params)
    bench("B feat-major f32",
          lambda p, x: pot_feature_major(p, x), Xf, params)
    bench("C feat-major bf16",
          lambda p, x: pot_feature_major(p, x, dtype=jnp.bfloat16), Xf, params)
    bench("D feat-major f32 vpu-out",
          lambda p, x: pot_feature_major(p, x, vpu_out=True), Xf, params)
    bench("E feat-major bf16 vpu-out",
          lambda p, x: pot_feature_major(
              p, x, dtype=jnp.bfloat16, vpu_out=True), Xf, params)


if __name__ == "__main__":
    main()
