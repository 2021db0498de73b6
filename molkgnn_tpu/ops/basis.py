"""Radial / spherical basis functions for the 3D-geometry baselines.

The reference relies on sympy codegen inside PyG's DimeNet layers and the
local SphereNet copy (/root/reference/models/ChIRoNet/gnn_3D/
spherenet.py:121-255): symbolic spherical Bessel functions with numerically
located roots, normalized, and real spherical harmonics (m=0 Legendre, plus
m-dependent torsion harmonics for SphereNet), lambdified at construction.

TPU-native approach: the same symbolic construction runs ONCE on the host at
module build (sympy + scipy root finding — host-only, never traced), and the
resulting closed-form expressions are lambdified against jax.numpy so the
runtime evaluation is pure fused XLA elementwise code.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Callable, List

import jax.numpy as jnp
import numpy as np
import sympy as sym
from scipy.optimize import brentq
from scipy.special import spherical_jn


@lru_cache(maxsize=None)
def _sph_bessel_formulas(n: int):
    """Symbolic j_0..j_{n-1} via the Rayleigh formula."""
    x = sym.symbols("x")
    f = [sym.sin(x) / x]
    a = sym.sin(x) / x
    for i in range(1, n):
        b = sym.diff(a, x) / x
        f += [sym.simplify(b * (-x) ** i)]
        a = sym.simplify(b)
    return x, f


@lru_cache(maxsize=None)
def bessel_zeros(n: int, k: int) -> np.ndarray:
    """First k positive zeros of j_0..j_{n-1} (scipy brentq bracketing,
    matching the reference's Jn_zeros, spherenet.py:151-167)."""
    zeros = np.zeros((n, k), dtype=np.float64)
    zeros[0] = np.arange(1, k + 1) * np.pi
    points = np.arange(1, k + n) * np.pi
    racines = np.zeros(k + n - 1)
    for i in range(1, n):
        for j in range(k + n - 1 - i):
            racines[j] = brentq(
                lambda x: spherical_jn(i, x), points[j], points[j + 1]
            )
        points = racines.copy()
        zeros[i][:k] = racines[:k]
    return zeros


@lru_cache(maxsize=None)
def bessel_basis_fns(n: int, k: int) -> List[List[Callable]]:
    """Normalized spherical-Bessel radial basis b_{ln}(x), x = d/cutoff in
    (0, 1] — the DimeNet bessel_basis construction."""
    zeros = bessel_zeros(n, k)
    normalizer = []
    for order in range(n):
        row = []
        for i in range(k):
            # 0.5 * j_{order+1}(z)^2 is the L2 norm of j_order(z x) x on [0,1]
            row.append(
                1.0
                / np.sqrt(0.5 * spherical_jn(order + 1, zeros[order, i]) ** 2)
            )
        normalizer.append(row)

    x, f = _sph_bessel_formulas(n)
    fns = []
    for order in range(n):
        row = []
        for i in range(k):
            expr = normalizer[order][i] * f[order].subs(
                x, zeros[order, i] * x
            )
            row.append(sym.lambdify([x], expr, modules=[jnp, "numpy"]))
        fns.append(row)
    return fns


@lru_cache(maxsize=None)
def real_sph_harm_fns(n: int) -> List[Callable]:
    """Y_l0(theta) = sqrt((2l+1)/4pi) P_l(cos theta) for l = 0..n-1."""
    theta = sym.symbols("theta")
    z = sym.symbols("z")
    fns = []
    for l in range(n):
        P = sym.legendre(l, z)
        Y = sym.sqrt(sym.Rational(2 * l + 1, 4) / sym.pi) * P.subs(
            z, sym.cos(theta)
        )
        if l == 0:
            const = float(Y)
            fns.append(lambda t, c=const: jnp.zeros_like(t) + c)
        else:
            fns.append(sym.lambdify([theta], Y, modules=[jnp, "numpy"]))
    return fns


@lru_cache(maxsize=None)
def real_sph_harm_m_fns(l_max: int):
    """Torsion harmonics Y_lm(theta, phi) for 0 <= m <= l < l_max (real
    form), as used by SphereNet (spherenet.py:169-255). Returns a list of
    rows: fns[l][m]."""
    theta, phi, z = sym.symbols("theta phi z")
    out = []
    for l in range(l_max):
        row = []
        for m in range(l + 1):
            P = sym.assoc_legendre(l, m, z)
            norm = sym.sqrt(
                sym.Rational(2 * l + 1, 4)
                / sym.pi
                * sym.Rational(
                    math.factorial(l - m), math.factorial(l + m)
                )
            )
            if m == 0:
                Y = norm * P.subs(z, sym.cos(theta))
            else:
                Y = (
                    sym.sqrt(2)
                    * norm
                    * P.subs(z, sym.cos(theta))
                    * sym.cos(m * phi)
                )
            expr = sym.simplify(Y)
            if expr.is_number:
                const = float(expr)
                row.append(
                    lambda t, p, c=const: jnp.zeros_like(t) + c
                )
            elif phi not in expr.free_symbols:
                fn = sym.lambdify([theta], expr, modules=[jnp, "numpy"])
                row.append(lambda t, p, f=fn: f(t))
            else:
                row.append(
                    sym.lambdify([theta, phi], expr, modules=[jnp, "numpy"])
                )
        out.append(row)
    return out


def envelope(x: jnp.ndarray, exponent: int = 5) -> jnp.ndarray:
    """Smooth polynomial cutoff envelope u(x) (PyG Envelope; DimeNet eq. 8):
    1/x + a x^{p-1} + b x^p + c x^{p+1}, zero for x >= 1."""
    p = exponent + 1
    a = -(p + 1) * (p + 2) / 2.0
    b = p * (p + 2)
    c = -p * (p + 1) / 2.0
    x_safe = jnp.where(x > 0, x, 1.0)
    xp0 = x_safe ** (p - 1)
    val = 1.0 / x_safe + a * xp0 + b * xp0 * x_safe + c * xp0 * x_safe * x_safe
    return jnp.where(x < 1.0, val, 0.0)


def bessel_rbf(
    dist: jnp.ndarray, freq: jnp.ndarray, cutoff: float, exponent: int = 5
) -> jnp.ndarray:
    """BesselBasisLayer: env(d/c) * sin(freq * d/c) with learnable freq
    (init n*pi)."""
    x = dist[:, None] / cutoff
    return envelope(x, exponent) * jnp.sin(freq[None, :] * x)


def spherical_sbf(
    dist: jnp.ndarray,
    angle: jnp.ndarray,
    idx_kj: jnp.ndarray,
    num_spherical: int,
    num_radial: int,
    cutoff: float,
    exponent: int = 5,
) -> jnp.ndarray:
    """SphericalBasisLayer: b_{ln}(d_kj/c) * env * Y_l0(angle) ->
    [T, num_spherical * num_radial]."""
    x = dist / cutoff
    env = envelope(x, exponent)
    bfns = bessel_basis_fns(num_spherical, num_radial)
    rbf = jnp.stack(
        [bfns[l][n](x) for l in range(num_spherical) for n in range(num_radial)],
        axis=1,
    )
    rbf = rbf * env[:, None]  # [E, S*R]
    sfns = real_sph_harm_fns(num_spherical)
    cbf = jnp.stack([f(angle) for f in sfns], axis=1)  # [T, S]
    t = angle.shape[0]
    out = rbf[idx_kj].reshape(t, num_spherical, num_radial) * cbf[:, :, None]
    return out.reshape(t, num_spherical * num_radial)
