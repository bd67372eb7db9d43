"""Isolate the flagship sweep's real bottleneck (layouts measured equal).

Times, in one TPU process:
  1. bare batched branch matmul (G=64 instances) fwd only, per call
  2. the same total FLOPs as ONE large matmul
  3. one vmapped value_and_grad of the branch potential (no scan)
  4. a lax.scan of L=64 trivial bodies (scan overhead floor)
  5. a lax.scan of L=64 value_and_grad bodies (the leapfrog core without
     momentum/Hamiltonian logic)
  6. scan of L=64 full-leapfrog-like bodies (+ momentum + kinetic + where)
All under jit, synced, repeated 3x, median reported.
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


def timed(tag, fn, *args, reps=3, inner=1, flops=None):
    import jax

    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        ts.append((time.time() - t0) / inner)
    dt = float(np.median(ts))
    msg = f"[{tag}] {dt*1e3:.3f} ms"
    if flops:
        msg += f" -> {flops/dt/1e12:.1f} TF/s ({100*flops/dt/1e12/197:.1f}% peak)"
    log(msg)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    log("device:", jax.devices()[0].device_kind)
    t0 = time.time()
    sync(jnp.zeros(8) + 1.0)
    log(f"tunnel warm: {time.time() - t0:.1f}s")

    G, m, n, h, s, L = 64, 64, 4096, 32, 32, 64
    rng = np.random.default_rng(0)
    Xf = jnp.asarray(rng.standard_normal((G, m, n), dtype=np.float32))
    W0 = jnp.asarray(rng.standard_normal((G, h, m), np.float32) / 8)
    W1 = jnp.asarray(rng.standard_normal((G, s, h), np.float32) / 6)
    w2 = jnp.asarray(rng.standard_normal((G, s), np.float32) / 6)
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    f_l0 = 2 * G * n * m * h

    # 1. bare batched layer-0 matmul
    @jax.jit
    def bmm(W0, Xf):
        return jax.lax.dot_general(
            W0, Xf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    timed("1 batched l0 matmul G=64 [h,m]@[m,n]", bmm, W0, Xf, flops=f_l0)

    # 2. same FLOPs, one large matmul
    A = jnp.asarray(rng.standard_normal((2048, 4096), np.float32))
    B = jnp.asarray(rng.standard_normal((4096, 2048), np.float32))

    @jax.jit
    def big(A, B):
        return A @ B

    timed("2 one 2048x4096x2048 matmul", big, A, B,
          flops=2 * 2048 * 4096 * 2048)

    # 3. one vmapped value_and_grad of the potential (no scan)
    def pot(params, xf):
        w0, w1, ww2 = params
        a0 = jnp.tanh(jax.lax.dot_general(
            w0, xf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        a1 = jnp.tanh(jax.lax.dot_general(
            w1, a0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        out = jnp.sum(ww2[:, None] * a1, axis=0)
        r = out - y
        return -0.5 * jnp.sum(r * r)

    vg = jax.vmap(jax.value_and_grad(pot), in_axes=((0, 0, 0), 0))
    f_step = G * (3 * (2 * n * (m * h + h * s + s)) - 2 * n * m * h)

    @jax.jit
    def one_vg(params, xf):
        return vg(params, xf)

    params = (jnp.swapaxes(W0, 1, 2), jnp.swapaxes(W1, 1, 2), w2)
    dt3 = timed("3 vmapped value_and_grad (1 step)", one_vg, params, Xf,
                flops=f_step)

    # 4. trivial scan overhead
    @jax.jit
    def scan_trivial(x):
        def body(c, _):
            return c * 1.0000001, None

        c, _ = jax.lax.scan(body, x, None, length=L)
        return c

    timed("4 scan of 64 trivial bodies", scan_trivial, jnp.ones((8, 128)))

    # 5. scan of L value_and_grad bodies
    @jax.jit
    def scan_vg(params, xf):
        def body(p, _):
            _, g = vg(p, xf)
            p = jax.tree.map(lambda a, b: a + 1e-6 * b, p, g)
            return p, None

        p, _ = jax.lax.scan(body, params, None, length=L)
        return p

    dt5 = timed("5 scan of 64 vg bodies", scan_vg, params, Xf,
                flops=L * f_step)
    log(f"   per-step in scan: {dt5/L*1e3:.3f} ms vs single {dt3*1e3:.3f} ms")

    # 6. + momentum/kinetic/where (leapfrog-like)
    @jax.jit
    def scan_leap(params, xf):
        mom = jax.tree.map(jnp.zeros_like, params)

        def body(carry, _):
            p, mo, dead = carry
            _, g = vg(p, xf)
            mo = jax.tree.map(lambda a, b: a + 0.5e-6 * b, mo, g)
            p1 = jax.tree.map(lambda a, b: a + 1e-6 * b, p, mo)
            _, g1 = vg(p1, xf)
            mo = jax.tree.map(lambda a, b: a + 0.5e-6 * b, mo, g1)
            k = sum(jnp.sum(x * x) for x in jax.tree.leaves(mo))
            dead1 = dead | (k > 1e12)
            keep = lambda o, nw: jnp.where(dead1, o, nw)
            p = jax.tree.map(keep, p, p1)
            return (p, mo, dead1), None

        (p, _, _), _ = jax.lax.scan(body, (params, mom, jnp.asarray(False)),
                                    None, length=L)
        return p

    dt6 = timed("6 scan of 64 leapfrog-like bodies (2 vg each)", scan_leap,
                params, Xf, flops=2 * L * f_step)
    log(f"   per-vg in leapfrog scan: {dt6/L/2*1e3:.3f} ms")


if __name__ == "__main__":
    main()
