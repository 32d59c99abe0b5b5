"""Derive the hot bi-Maxwellian susceptibility behind raytrace_tpu.growth.

ROADMAP #6 asked for quantitative wave growth/damping along rays but noted
"trustworthy growth-rate formulas" were not quotable from memory in this
zero-egress environment. Like tools/derive_ros3.py, the answer is to DERIVE
the result mechanically and verify it against independently-known facts.

Starting kernel (linearized Vlasov, parallel propagation k || B, right-
circular polarization, nonrelativistic; the textbook starting point for
whistler cyclotron growth -- Kennel & Petschek 1966 class):

  chi_s = (wph^2/w^2) * Int d3v (vperp/2) *
          [ (w - k vpar) df/dvperp + k vperp df/dvpar ] / (w - k vpar - wc)

with f the bi-Maxwellian (thermal speeds apar, aperp) normalized to 1 and
wc > 0 the electron gyrofrequency in the same sign convention as the cold
Stix R term this repo traces (R = 1 - Xe/(1 - Ye): electron resonance at
w -> wc, resonant electrons counter-stream, vres = (w - wc)/k < 0).

This script reduces the integral symbolically to

  chi = (wph^2/w^2) * [ (Tr - 1) + ( zeta (Tr - 1) + w/(k apar) ) Z(zeta) ]

with Tr = aperp^2/apar^2 = Tperp/Tpar, zeta = (w - wc)/(k apar), and Z the
plasma dispersion function -- and then PROVES two independent facts about
it (hard assertions, not eyeballs):

  (a) cold limit (apar, aperp -> 0 with Z's asymptotic series):
      chi -> -wph^2 / (w (w - wc)), exactly the electron term of the cold
      Stix R this framework already implements (ops/dispersion.stix_rlp,
      ratio form -Xe/(1 - Ye)) -- so the hot kernel's conventions are
      pinned to the repo's own cold dispersion;
  (b) marginal stability: the coefficient of Z (whose imaginary part
      sqrt(pi) exp(-zeta^2) carries ALL growth/damping) vanishes exactly
      at  A := Tr - 1 = w/(wc - w),  the Kennel-Petschek critical
      anisotropy -- which analysis.kp_critical_anisotropy already pins as
      f/(fce - f) from the independent threshold argument.

The weak-growth rate used by raytrace_tpu.growth is then

  gamma = -Im chi_hot / (dD/dw),   D(w, k) = R_cold(w) - c^2 k^2 / w^2,

with Im Z(zeta) = sqrt(pi) exp(-zeta^2) (Landau contour, k > 0) and dD/dw
in closed form (growth.py, parity-tested against a numerical derivative of
stix_rlp). Hot-population back-reaction on the REAL dispersion is neglected
(n_hot << n_e, the standard KP approximation).

Run: python tools/derive_growth.py  (asserts both checks; ~1 min of sympy)
"""

import sympy as sp

w, k, wc, wph = sp.symbols("w k wc wph", positive=True)
apar, aperp = sp.symbols("apar aperp", positive=True)
vpar, vperp = sp.symbols("vpar vperp", real=True)


def main():
    f = (sp.exp(-vpar**2 / apar**2 - vperp**2 / aperp**2)
         / (sp.pi ** sp.Rational(3, 2) * apar * aperp**2))

    integrand = (vperp / 2) * (
        (w - k * vpar) * sp.diff(f, vperp) + k * vperp * sp.diff(f, vpar)
    )
    # d3v = 2 pi vperp dvperp dvpar; vperp over (0, oo) first
    num = sp.simplify(sp.integrate(
        2 * sp.pi * vperp * integrand, (vperp, 0, sp.oo), conds="none"
    ))
    print("[1] N(vpar) after the vperp integral:")
    sp.pprint(num)

    gauss = sp.exp(-vpar**2 / apar**2) / (sp.sqrt(sp.pi) * apar)
    p_poly = sp.simplify(sp.expand(num / gauss))

    # chi = (wph^2/w^2) Int p(vpar) gauss / (-k (vpar - vres)) dvpar;
    # divide: p = q (vpar - vres) + rem, use gaussian moments for q,
    # Int gauss/(vpar - vres) = Z(zeta)/apar with zeta = vres/apar
    vres = sp.Symbol("vres", real=True)
    q_poly, rem = sp.div(sp.Poly(sp.expand(p_poly), vpar),
                         sp.Poly(vpar - vres, vpar))
    rem = sp.simplify(rem.as_expr())
    qq = sp.Poly(q_poly.as_expr(), vpar)
    moments = [1, 0, apar**2 / 2]   # <1>, <vpar>, <vpar^2> of gauss
    P_int = sum(
        qq.coeff_monomial(vpar**i) * moments[i]
        for i in range(qq.degree() + 1)
    )
    zeta = sp.Symbol("zeta")
    Zf = sp.Function("Z")(zeta)
    chi = (wph**2 / w**2) * (-1 / k) * (P_int + rem * Zf / apar)
    chi = sp.simplify(chi.subs(vres, zeta * apar))
    print("\n[2] chi (collected in Z):")
    sp.pprint(sp.collect(sp.expand(chi), Zf))

    # -- check (a): cold limit reproduces the Stix R electron term --
    zeta_expr = (w - wc) / (k * apar)
    Zasym = (-1 / zeta - sp.Rational(1, 2) / zeta**3
             - sp.Rational(3, 4) / zeta**5)
    s = sp.Symbol("s", positive=True)
    chi_cold = chi.subs(Zf, Zasym).subs(zeta, zeta_expr).subs(aperp, s * apar)
    lim = sp.simplify(sp.limit(chi_cold, apar, 0))
    expected = -wph**2 / (w * (w - wc))
    assert sp.simplify(lim - expected) == 0, lim
    print("\n[3] cold limit == -wph^2/(w(w-wc))  (the Stix R electron "
          "term, ops/dispersion.stix_rlp): PASS")

    # -- check (b): Z-coefficient zero exactly at the KP threshold --
    Qcoef = sp.expand(chi).coeff(Zf)
    A = sp.Symbol("A")
    Qc = Qcoef.subs(zeta, zeta_expr).subs(aperp**2, (A + 1) * apar**2)
    sol = sp.solve(sp.simplify(Qc * k * w**2 / wph**2), A)
    assert len(sol) == 1 and sp.simplify(sol[0] - w / (wc - w)) == 0, sol
    print("[4] Im chi = 0  <=>  A = w/(wc - w)  (Kennel-Petschek critical "
          "anisotropy, analysis.kp_critical_anisotropy): PASS")

    # the pieces growth.py implements:
    print("\n[5] implementation form: with Tr = Tperp/Tpar, "
          "zeta = (w - wc)/(kpar apar):")
    print("    Q = (wph^2/w^2) * (zeta (Tr - 1) + w/(kpar apar))")
    print("    Im chi = sqrt(pi) exp(-zeta^2) Q")
    print("    gamma = -Im chi / (dR/dw + 2 mu^2/w)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
