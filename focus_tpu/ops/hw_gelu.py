"""Exact-erf gelu for reduced-precision activations via hardware
tanh/exp2 — numerically *stronger* and ~0.4 ms/MLP-pair cheaper than
lowering ``lax.erf``.

Motivation (BENCH_NOTES round 3): the flagship eval step spends ~9 ms in
the fc2 fusions because XLA expands ``erf`` into a software
rational-polynomial path, while the VPU executes ``tanh``/``exp2``
natively (measured: relu 0.81 / tanh-gelu 0.81 / erf-gelu 1.46 / this
1.05 ms per [8,1569,768]x3072 MLP pair).

Form (coefficients minimax-fitted in scripts/fit_hw_gelu.py against the
f64-exact ``x * ndtr(x)``):

  center (x >= -3):  0.5 x (1 + tanh(x * p(x^2)))   p odd, degree 11
  tail   (x <  -3):  -exp2(q(max(x, -14.2)))        q degree 6 in x

The center clamp at x=5.5 puts tanh in its f32 saturation zone so the
output rounds to ``x`` exactly for all larger inputs; the tail clamp is
past the point where the true gelu rounds to bf16 -0.

Accuracy (exhaustive over every finite bf16 input, vs f64 truth):
  - max relative error of the f32 pipeline: 2.1e-4  (~1/10 bf16 ulp)
  - bf16-rounded outputs equal round-to-nearest of the TRUE gelu for
    65262/65280 values; the 18 exceptions are half-ulp ties (1 ulp off).
  - the previous path — ``jax.nn.gelu(approximate=False)`` evaluated on
    bf16, whose internal bf16 rounding of ``x/sqrt(2)`` feeds ``erf`` —
    misrounds 1612 values (up to ~2% relative near the x~-2.7 dip).

So for bf16 activations this IS the exact erf gelu at tensor precision
(strictly closer to truth than the ``lax.erf`` composition it replaces);
it is NOT used for f32 inputs, where 2.1e-4 relative would be a real
approximation (``tests/test_hw_gelu.py`` pins all of the above).

Reference semantics: torch ``nn.GELU()`` exact-erf gelu
(/root/reference/slowfast/models/ORViT/utils.py:88).
"""

import jax
import jax.numpy as jnp

XSPLIT = -3.0
XCLAMP = -14.2
XPOS = 5.5

# t = x * sum_k CENTER[k] * (x*x)**k   (scripts/fit_hw_gelu.py)
CENTER = (
    0.7976706158074203,
    0.03666717307183224,
    -0.00018735820502878965,
    -2.4888000983736062e-05,
    1.1688997263350011e-06,
    -1.6180745903533862e-08,
)
# q = sum_k TAIL[k] * x**k
TAIL = (
    -2.035860660004078,
    -0.39558379039637137,
    -0.822430543939081,
    -0.014217791553621571,
    -0.001129822152926939,
    -4.749629703742469e-05,
    -8.205061004020072e-07,
)

# benchmarking escape hatch only — semantics are identical either way
# (±1 bf16 ulp); scripts monkeypatch this for A/B timing.
ENABLED = True


# polynomial derivatives (d/du and d/dx respectively)
DCENTER = tuple((k + 1) * c for k, c in enumerate(CENTER[1:]))
DTAIL = tuple((k + 1) * c for k, c in enumerate(TAIL[1:]))

_LN2 = 0.6931471805599453


def _poly(x, coeffs):
    acc = jnp.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * x + jnp.float32(c)
    return acc


def _hw_gelu_impl(x):
    xf = x.astype(jnp.float32)
    xp = jnp.minimum(xf, jnp.float32(XPOS))
    t = xp * _poly(xp * xp, CENTER)
    g_center = jnp.float32(0.5) * xf * (jnp.float32(1.0) + jnp.tanh(t))
    xc = jnp.maximum(xf, jnp.float32(XCLAMP))
    g_tail = -jnp.exp2(_poly(xc, TAIL))
    return jnp.where(xf < jnp.float32(XSPLIT), g_tail, g_center).astype(
        x.dtype
    )


@jax.custom_vjp
def hw_gelu(x):
    """Exact-erf gelu for bf16 (or other sub-f32) activations.

    Evaluates in f32 and rounds once at the end; see module docstring
    for the exhaustive accuracy guarantee.  custom_vjp: the backward
    recomputes the analytic derivative from the saved LOW-PRECISION
    input — XLA autodiff would otherwise stack the f32 upcast as a scan
    residual (591 MB per 4-layer scan at the flagship train shape,
    an instant OOM; the erf path it replaces also saves only bf16).
    """
    return _hw_gelu_impl(x)


def _hw_gelu_fwd(x):
    return _hw_gelu_impl(x), x


def _hw_gelu_bwd(x, dy):
    xf = x.astype(jnp.float32)
    xp = jnp.minimum(xf, jnp.float32(XPOS))
    u = xp * xp
    p = _poly(u, CENTER)
    t = xp * p
    th = jnp.tanh(t)
    # d t/d xp = p(u) + 2 u p'(u); the xp clamp's cut of the tanh term
    # beyond XPOS is absorbed by (1 - th^2) ~ 6e-8 there. The sech^2
    # term multiplies the CLAMPED xp, not xf: with xf the product grows
    # linearly past saturation whenever tanh rounds to 1-ulp-below-1
    # (gradient error O(xf * 1e-7) for activation spikes), while the
    # true gelu'(x) is exactly 1 there.
    dt = p + jnp.float32(2.0) * u * _poly(u, DCENTER)
    d_center = jnp.float32(0.5) * (jnp.float32(1.0) + th) + (
        jnp.float32(0.5) * xp * (jnp.float32(1.0) - th * th) * dt
    )
    xc = jnp.maximum(xf, jnp.float32(XCLAMP))
    # d/dx[-exp2(q)] = -ln2 exp2(q) q'; exp2 underflow zeroes it at the
    # clamp, matching the true ~1e-44 derivative there
    d_tail = -jnp.float32(_LN2) * jnp.exp2(_poly(xc, TAIL)) * _poly(
        xc, DTAIL
    )
    g = jnp.where(xf < jnp.float32(XSPLIT), d_tail, d_center)
    return ((dy.astype(jnp.float32) * g).astype(dy.dtype),)


hw_gelu.defvjp(_hw_gelu_fwd, _hw_gelu_bwd)


def use_hw_gelu(dtype) -> bool:
    """True when ``hw_gelu`` is the right exact-gelu path for ``dtype``:
    reduced-precision floats whose ulp is far above the 2.1e-4 pipeline
    error.  f32/f64 keep the ``lax.erf`` lowering."""
    return ENABLED and jnp.dtype(dtype).itemsize <= 2 and jnp.issubdtype(
        jnp.dtype(dtype), jnp.floating
    )
