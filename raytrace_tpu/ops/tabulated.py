"""Tabulated plasmasphere surrogate for the hot RHS chain.

The axisymmetric CA1992 medium is separable: the ionosphere depends on r
only (one exp) and the plasmasphere term on L only (the expensive branch
stack -- ~6 of the ~18 transcendentals per fused dispersion eval,
reference lineage RayTrace_lat.jl:70-83). This module replaces the two
EXPENSIVE branches with cubic-Hermite interpolants in L:

  - branch 1 (saturated): ln ne1 = LN10 ((-0.3145 L + 3.9043)
    + a exp((2-L)/1.5))                                   -- 2 exp
  - branch 3 (trough, incl. optional refill blend): ln of
    trough L^-4.5 + (1 - exp((2-L)/10))                   -- 3-4 exp/log

while branch 2 (the plasmapause drop) stays CLOSED FORM -- it is linear
in log space (ln ne2 = ln ne_lppi + LN10 (lppi - L)/0.1, constant slope),
so it costs nothing to keep exact. The three-way hard select is the SAME
`where` as the closed form (models/plasmasphere.py::ne_plasma_cm3), so
the C0 kinks at Lppi/Lppo are reproduced EXACTLY -- interpolation error
lives only inside each smooth branch (cubic Hermite: h^4/384 max|f''''|,
~1e-9 relative at the default n=2048 over L in [1, 40] -- the sharp
plasmapause drop is the CLOSED-FORM branch, so only the gentle saturated
and trough profiles are interpolated; the wide domain covers the
high-latitude L = r/cos^2(lat) excursions of low-altitude ray segments,
with a flat-in-log clamp beyond).

The value AND d/dL come from the same Hermite polynomial, so the fused
hand chain (ops/fused.py::_compose_ne) is the exact derivative of the
interpolated medium -- the fused==autodiff identity holds table-side too
(tests/test_tabulated.py).

This is the one structural utilization lever the roofline analysis left
untried (VERDICT r3 weak #3): trading VPU transcendentals for VMEM
gathers (two 4-wide row gathers per eval). Whether that wins on a real
chip is an empirical question -- benchmarks/tabulated_r04.py measures it
either way.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import medium, plasmasphere

LN10 = plasmasphere.LN10


class NeTable(NamedTuple):
    """Branch-wise Hermite table of the CA1992 plasmasphere (cm^-3, log
    space; duct/DE excluded -- those ride _compose_ne exactly as in the
    closed form)."""

    l0: float        # first node, L
    inv_dl: float    # 1 / node spacing
    n: int           # node count (STATIC)
    rows: jnp.ndarray  # (n, 4): ln ne1, d ln ne1/dL, ln ne3, d ln ne3/dL


def _check_env(env):
    if env.ps_model == "gcpm":
        raise ValueError(
            "tabulated medium covers the axisymmetric CA1992 family; "
            "GCPM is already smooth/cheap (no branch stack to replace)"
        )
    if medium.mlt_on(env):
        raise ValueError(
            "tabulated medium is 1D in L; the MLT-resolved plasmasphere "
            "is (L, phi) -- not supported"
        )
    if float(env.ps_smooth) != 0.0:
        raise ValueError(
            "tabulated medium implements the hard-branch (reference-"
            f"exact) select only; got ps_smooth={float(env.ps_smooth)}"
        )


def _ln_branches(L, env):
    """(ln ne1, ln ne3) of the smooth branches, closed form (build time)."""
    log_ne1 = (-0.3145 * L + 3.9043) + env.ps_season * jnp.exp(
        (2.0 - L) / 1.5
    )
    ln1 = LN10 * log_ne1
    Lsafe = jnp.maximum(L, 1e-6)
    ne3 = env.ps_trough * jnp.exp(-4.5 * jnp.log(Lsafe)) + (
        1.0 - jnp.exp((2.0 - L) / 10.0)
    )
    ln3 = jnp.log(ne3)
    if not (isinstance(env.ps_refill, float) and env.ps_refill == 0.0):
        w = plasmasphere.refill_weight(L, env.ps_refill, env.ps_refill_q,
                                       env.ps_refill_lref)
        ln3 = (1.0 - w) * ln3 + w * ln1
    return ln1, ln3


def build_ne_table(env: medium.EnvParams, n=2048, l_min=1.0, l_max=40.0):
    """Sample the smooth branches and their L-derivatives at n uniform
    nodes (host-side, once per trace -- microseconds, like the Lppo
    pre-solve)."""
    _check_env(env)
    ls = jnp.linspace(l_min, l_max, n)
    f1 = lambda L: _ln_branches(L, env)[0]
    f3 = lambda L: _ln_branches(L, env)[1]
    rows = jnp.stack(
        [jax.vmap(f1)(ls), jax.vmap(jax.grad(f1))(ls),
         jax.vmap(f3)(ls), jax.vmap(jax.grad(f3))(ls)], axis=1,
    )
    return NeTable(l0=float(l_min),
                   inv_dl=float((n - 1) / (l_max - l_min)), n=int(n),
                   rows=rows)


def _hermite_rows(tab: NeTable, L):
    """Hermite value+derivative of BOTH branches at L: returns
    (ln1, dln1, ln3, dln3). Two 4-wide row gathers total."""
    x = (L - tab.l0) * tab.inv_dl
    x = jnp.clip(x, 0.0, tab.n - 1.000001)
    i = jnp.floor(x).astype(jnp.int32)
    t = x - i
    r0 = jnp.take(tab.rows, i, axis=0)        # (..., 4)
    r1 = jnp.take(tab.rows, i + 1, axis=0)
    dl = 1.0 / tab.inv_dl
    v0 = jnp.stack([r0[..., 0], r0[..., 2]], axis=-1)
    v1 = jnp.stack([r1[..., 0], r1[..., 2]], axis=-1)
    d0 = jnp.stack([r0[..., 1], r0[..., 3]], axis=-1) * dl
    d1 = jnp.stack([r1[..., 1], r1[..., 3]], axis=-1) * dl
    t = t[..., None]
    t2 = t * t
    t3 = t2 * t
    val = ((2.0 * t3 - 3.0 * t2 + 1.0) * v0 + (t3 - 2.0 * t2 + t) * d0
           + (-2.0 * t3 + 3.0 * t2) * v1 + (t3 - t2) * d1)
    der = ((6.0 * t2 - 6.0 * t) * v0 + (3.0 * t2 - 4.0 * t + 1.0) * d0
           + (6.0 * t - 6.0 * t2) * v1 + (3.0 * t2 - 2.0 * t) * d1)
    der = der * tab.inv_dl
    return val[..., 0], der[..., 0], val[..., 1], der[..., 1]


def ne_p_and_dl(tab: NeTable, L, env: medium.EnvParams):
    """(ne_p, d ne_p/dL): tabulated branches 1/3, closed-form branch 2,
    the reference's exact hard select (ne_plasma_cm3's `where`)."""
    ln1, dln1, ln3, dln3 = _hermite_rows(tab, L)
    ln2 = jnp.log(env.ne_lppi) + (LN10 / 0.1) * (env.lppi - L)
    dln2 = jnp.full_like(ln2, -LN10 / 0.1)
    ln = jnp.where(L <= env.lppi, ln1, jnp.where(L <= env.lppo, ln2, ln3))
    dln = jnp.where(L <= env.lppi, dln1,
                    jnp.where(L <= env.lppo, dln2, dln3))
    ne_p = jnp.exp(ln)
    return ne_p, ne_p * dln


def ne_and_grads_tab(r, lat, env: medium.EnvParams, tab: NeTable):
    """Drop-in for ops.fused._ne_and_grads on the axisymmetric CA1992
    medium: same (ne_m3, dne/dr, dne/dlat) contract, with the expensive
    branch transcendentals replaced by two table row-gathers."""
    ni = env.iono_n0 * jnp.exp(-env.iono_decay * (r - env.iono_r0))
    ni_r = -env.iono_decay * ni
    if not (isinstance(env.iono_mix, float) and env.iono_mix == 1.0):
        nb = env.iono_n0_b * jnp.exp(-env.iono_decay_b * (r - env.iono_r0))
        ni = env.iono_mix * ni + (1.0 - env.iono_mix) * nb
        ni_r = env.iono_mix * ni_r + (1.0 - env.iono_mix) * (
            -env.iono_decay_b * nb
        )
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    inv_cl = 1.0 / cl
    inv_cl2 = inv_cl * inv_cl
    L = r * inv_cl2
    L_r = inv_cl2
    L_lat = 2.0 * L * sl * inv_cl

    ne_p, dne_p = ne_p_and_dl(tab, L, env)
    from .fused import _compose_ne

    return _compose_ne(r, env, ni, ni_r, ne_p, dne_p, L_r, L_lat, L)


def interp_error_bound(tab: NeTable, env: medium.EnvParams, n_test=40001):
    """Measured sup-norm relative density error of the tabulated ne_p vs
    the closed form over a dense L grid (reported next to the perf
    number -- the accuracy side of the trade)."""
    ls = jnp.linspace(tab.l0, tab.l0 + (tab.n - 1) / tab.inv_dl, n_test)
    exact = plasmasphere.ne_plasma_cm3(
        ls, env.lppi, env.lppo, env.ne_lppi, env.ps_season, env.ps_trough,
        env.ps_smooth, env.ps_refill, env.ps_refill_q, env.ps_refill_lref,
    )
    approx = ne_p_and_dl(tab, ls, env)[0]
    return float(jnp.max(jnp.abs(approx / exact - 1.0)))
