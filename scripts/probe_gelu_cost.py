"""Cost probe: is a piecewise tanh/exp2 gelu structurally cheaper than
XLA's erf on the VPU?  Measures the isolated fc1+act+fc2 pair at the
flagship MLP shape (chained, fetch-forced protocol) for:

  relu / tanh-gelu / exact-erf gelu / candidate (structure only,
  placeholder coefficients — timing is coefficient-independent).

Round-2 reference numbers (per MLP-pair unit): erf 4.70, tanh 4.08,
relu 4.02 ms.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, S, C, HID = 8, 1569, 768, 3072
CHAIN = 24

_L2E = 1.4426950408889634


def act_relu(x):
    return jax.nn.relu(x)


def act_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def act_erf(x):
    return jax.nn.gelu(x, approximate=False)


def act_candidate(x):
    """Structure of the piecewise hw gelu (placeholder coefficients):
    center = 0.5x(1+tanh(x * poly5(u))), tail = -exp2(-c*u - d) * poly4(1/u)
    for x < -3; one select."""
    xf = x.astype(jnp.float32)
    u = xf * xf
    # center: odd poly deg 11 (6 coeffs on u)
    t = xf * (0.797884 + u * (0.03567 + u * (1e-4 + u * (1e-6 + u * (1e-8 + u * 1e-10)))))
    g_c = 0.5 * xf * (1.0 + jnp.tanh(t))
    # tail: phi(x) * r(1/u), r deg 4
    w = 1.0 / u
    r = 1.0 + w * (-1.0 + w * (3.0 + w * (-15.0 + w * 105.0)))
    g_t = -jnp.exp2(-0.72134752 * u - 1.3257481) * r
    g = jnp.where(xf < -3.0, g_t, g_c)
    return g.astype(x.dtype)


def act_candidate2(x):
    """Divide-free tail: -exp2(poly6(clamp(x))) — the asymptotic
    correction log2(r(1/u)) folded into a polynomial in x over the
    clamped tail interval [-14.2, -3]."""
    xf = x.astype(jnp.float32)
    u = xf * xf
    t = xf * (0.797884 + u * (0.03567 + u * (1e-4 + u * (1e-6 + u * (1e-8 + u * 1e-10)))))
    g_c = 0.5 * xf * (1.0 + jnp.tanh(t))
    xc = jnp.maximum(xf, -14.2)
    q = -1.3257 + xc * (1e-3 + xc * (-0.72134 + xc * (1e-4 + xc * (1e-5 + xc * (1e-6 + xc * 1e-8)))))
    g_t = -jnp.exp2(q)
    g = jnp.where(xf < -3.0, g_t, g_c)
    return g.astype(x.dtype)


def act_center_only(x):
    """Deg-11 tanh center, no tail branch (isolates select+tail cost)."""
    xf = x.astype(jnp.float32)
    u = xf * xf
    t = xf * (0.797884 + u * (0.03567 + u * (1e-4 + u * (1e-6 + u * (1e-8 + u * 1e-10)))))
    return (0.5 * xf * (1.0 + jnp.tanh(t))).astype(x.dtype)


def main():
    acts = {
        "relu": act_relu,
        "tanh": act_tanh,
        "erf": act_erf,
        "cand": act_candidate,
        "cand2": act_candidate2,
        "center": act_center_only,
    }
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, S, C) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(C, HID) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rs.randn(HID, C) * 0.02, jnp.bfloat16)

    for name, act in acts.items():
        def chain(x, w1, w2, act=act):
            for _ in range(CHAIN):
                h = act(x @ w1)
                x = (h @ w2) + x * 1e-3
            return x, x.mean()

        f = jax.jit(chain)
        q, m = f(x, w1, w2)
        float(np.asarray(m))  # compile + warmup, fetch-forced
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            q, m = f(q, w1, w2)
        mh = float(np.asarray(m))
        dt = (time.perf_counter() - t0) / iters / CHAIN * 1000
        print(f"{name}: {dt:.3f} ms/pair (mean {mh:.4f})", flush=True)


if __name__ == "__main__":
    main()
