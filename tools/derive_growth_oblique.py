"""Derive the OBLIQUE hot bi-Maxwellian susceptibility behind
raytrace_tpu.growth.gamma_oblique.

tools/derive_growth.py derived the PARALLEL (k || B) hot susceptibility and
pinned its conventions to this repo's cold Stix machinery. The documented
out-of-scope remainder was "genuinely oblique kinetics with harmonic sums"
-- the Landau (m=0) and cyclotron (m = +-1, ...) resonances of a wave with
wave-normal angle psi != 0, which is what damps unducted oblique whistlers
(the physics behind ducting mattering at all). Writing the oblique hot
tensor from memory is exactly the kind of unverifiable quotation this
repo's derivation-tool pattern exists to avoid, so this script derives it
mechanically from the linearized Vlasov equation:

  f1(v, 0) = -(q/m) Int_{-inf}^0 dtau [E + v'(tau) x B1] . grad_v f0(v')
             along the unperturbed helical orbit through v,
  B1 = (k x E)/w  (Faraday),  k = kperp xhat + kpar zhat,  B0 = B0 zhat,
  Omega = q B0 / m_s   (SIGNED gyrofrequency; electrons Omega < 0).

The gyrophase algebra is done by explicit harmonic bookkeeping (the
Jacobi-Anger expansion e^{i a sin x} = sum_n J_n(a) e^{inx} applied as a
selection rule on integer offsets, NOT as a truncated series -- each
resonance m gets its exact finite set of Bessel products), giving

  chi_ij = (wps^2/w) sum_m Int d^3v N^(m)_ij(vperp, vpar)
                                   / (w - kpar vpar - m Omega)

with N^(m)_ij a 3x3 matrix of J_{m-1}, J_m, J_{m+1}(a) products,
a = kperp vperp / Omega, d^3v = 2 pi vperp dvperp dvpar (N is the plain
gyroaverage). The Landau contour (Im w -> 0+, kpar > 0) turns the m-pole
into the resonant anti-Hermitian part

  chi^res = i A,   A_ij = -(pi wps^2)/(w kpar) sum_m
                          2 pi Int vperp dvperp N^(m)_ij(vperp, vres_m),
  vres_m = (w - m Omega)/kpar,

and the weak-growth rate of a cold eigenmode (unit polarization e of the
dispersion tensor D_ij = (c^2/w^2)(k_i k_j - k^2 d_ij) + eps^cold_ij,
D e = 0) is

  gamma = -(e* . A . e) / (d/dw [e* . D . e]).

Five validations, each a hard assertion:

  (1) HERMITICITY: N^(m)_ij == conj(N^(m)_ji) termwise (real w, a, vperp,
      vpar) -- the resonant part is i*(Hermitian), as dissipation theory
      requires; the bookkeeping produces it with no Bessel identities.
  (2) DIRECT ORBIT-INTEGRAL CROSS-CHECK (the strongest): at random
      OBLIQUE numeric parameters (complex w, kperp, kpar, signed Omega,
      vperp, vpar, complex E), sum_m N^(m)_ij E_j * i/(w - kpar vpar -
      m Omega) over |m| <= 12 must equal the brute-force numeric
      gyroaverage + tau-quadrature of the exact orbit integral -- every
      harmonic weight, sign, and phase checked at once, independently of
      the Jacobi-Anger bookkeeping.
  (3) RANK-1 STRUCTURE: N^(m) = U T T-dagger with
        T   = (vperp (J_{m-1}+J_{m+1})/2, -i vperp (J_{m-1}-J_{m+1})/2,
               vpar J_m)         [the gyroaveraged resonant current:
               (vperp m J_m/atilde, -i vperp J_m', vpar J_m)]
        U   = (1 - kpar vpar / w) fp + (kpar vperp / w) fz
      -- asserted exactly; this factored form (positive-semidefinite
      for U > 0: dissipation) is what growth.gamma_oblique implements.
  (4) PARALLEL LIMIT: kperp -> 0, contracted with the R-mode polarization
      e = (1, i, 0)/sqrt(2) and integrated over the bi-Maxwellian, the
      resonant sum collapses to the single electron-cyclotron term and
      equals EXACTLY the Im chi = sqrt(pi) exp(-zeta^2) Q of
      tools/derive_growth.py (whose cold limit was itself pinned to this
      repo's Stix R), zeta = (w - wc)/(kpar apar) -- normalization,
      cyclotron weight, and the signed-Omega convention all pinned.
  (5) LANDAU PIN: the m = 0, zz element at kperp -> 0, integrated over
      the bi-Maxwellian, equals the resonant numerator of the 1D
      electrostatic susceptibility derived independently here from the
      unmagnetized 1D Vlasov equation (parallel motion is unaffected by
      B0, so the magnetized m=0 kernel MUST reduce to it) -- the Landau
      weight is pinned by physics outside the orbit machinery.

raytrace_tpu.growth.gamma_oblique implements the factored form (3) with
Gauss-Legendre quadrature over vperp and scipy Bessel J; a test
(tests/test_growth.py) checks it against gamma_whistler at psi -> 0 and
against the structural facts asserted here.

Run: python tools/derive_growth_oblique.py   (~1-2 min)
"""

import numpy as np
import sympy as sp

# symbols ------------------------------------------------------------------
w = sp.Symbol("w")                      # wave angular frequency
kperp, kpar = sp.symbols("kperp kpar", positive=True)
Om = sp.Symbol("Omega", real=True, nonzero=True)   # SIGNED gyrofrequency
vperp = sp.Symbol("vperp", positive=True)
vpar = sp.Symbol("vpar", real=True)
a = sp.Symbol("a", real=True)           # kperp vperp / Omega
fp = sp.Symbol("fp", real=True)         # df0/dvperp (orbit invariant)
fz = sp.Symbol("fz", real=True)         # df0/dvpar  (orbit invariant)
Ex, Ey, Ez = sp.symbols("Ex Ey Ez")
apar, aperp = sp.symbols("apar aperp", positive=True)
Tr = sp.Symbol("Tr", positive=True)     # Tperp/Tpar = aperp^2/apar^2
m_idx = sp.Symbol("m", integer=True)    # resonance harmonic (symbolic)


def laurent_dict(expr, z, shift=6):
    """{offset: coeff} of a Laurent polynomial in z."""
    e = sp.expand(expr * z**shift)
    out = {}
    for key, c in sp.collect(e, z, evaluate=False).items():
        off = (0 if key == 1 else int(sp.degree(key, gen=z))) - shift
        c = sp.simplify(c)
        if c != 0:
            out[off] = out.get(off, 0) + c
    return out


def derive_numerators():
    """N^(m)_ij such that chi_ij = (wps^2/w) sum_m Int 2pi vperp dvperp
    dvpar N^(m)_ij / (w - kpar vpar - m Omega)."""
    z = sp.Symbol("z")                  # e^{i psi_tau}, gyrophase at tau
    cosp, sinp = (z + 1 / z) / 2, (z - 1 / z) / (2 * sp.I)
    E = sp.Matrix([Ex, Ey, Ez])
    kvec = sp.Matrix([kperp, 0, kpar])
    v_t = sp.Matrix([vperp * cosp, vperp * sinp, vpar])
    grad_f0 = sp.Matrix([fp * cosp, fp * sinp, fz])

    # E + v' x (k x E)/w = E (1 - k.v'/w) + k (v'.E)/w   (BAC-CAB)
    F = E * (1 - kvec.dot(v_t) / w) + kvec * (v_t.dot(E)) / w
    g_harm = laurent_dict(sp.expand(F.dot(grad_f0)), z)

    # observation velocity v(0): {phi-offset r: coeff}
    v_harm = [
        {1: vperp / 2, -1: vperp / 2},                       # v_x
        {1: vperp / (2 * sp.I), -1: -vperp / (2 * sp.I)},    # v_y
        {0: vpar},                                           # v_z
    ]

    # Bookkeeping (see module docstring):
    #   e^{i Phi} = e^{i(kpar vpar - w) tau} e^{i a sin phi} e^{-i a sin
    #   psi_tau}; Jacobi-Anger both ways (J_n(a) e^{in phi}, J_p(a)
    #   e^{-ip psi_tau}); a G-term e^{is psi_tau} joins the p-series;
    #   psi_tau = phi - Om tau, so the tau-exponent is i(kpar vpar - w +
    #   (p - s) Om) tau -> resonance index m = p - s, tau-integral over
    #   (-inf, 0] = i/(w - kpar vpar - m Om) (Im w > 0); the gyroaverage
    #   selects n = m - r. Prefactors: f1 carries -(q/m_s); j = q n_s
    #   Int v f1; chi = i j/(eps0 w E): (i/w)(q n_s)(-q/m_s)(i) =
    #   + n_s q^2/(eps0 m_s w) = (wps^2/w) -- folded out front.
    N = sp.zeros(3, 3)
    for i in range(3):
        for r, vc in v_harm[i].items():
            for s, gc in g_harm.items():
                term = (vc * gc
                        * sp.besselj(m_idx + s, a)      # p = m + s
                        * sp.besselj(m_idx - r, a))     # n = m - r
                for j, Esym in enumerate((Ex, Ey, Ez)):
                    N[i, j] = N[i, j] + sp.expand(term).coeff(Esym)
    return N.applyfunc(lambda e: sp.simplify(sp.expand(e)))


def at_resonance(expr):
    """Substitute the m-resonance condition vpar -> (w - m Omega)/kpar
    and the Bessel-argument identity kperp = a Omega / vperp (a and
    kperp are independent symbols in the derivation; the identities
    below only hold with them tied)."""
    return sp.simplify(expr.subs(vpar, (w - m_idx * Om) / kpar)
                       .subs(kperp, a * Om / vperp))


def check_hermiticity(N):
    """Hermiticity holds AT THE RESONANCE vpar = vres_m (where the
    anti-Hermitian part is evaluated); off-resonance the numerator has
    the usual two-gradient (U/W) structure and need not be Hermitian.
    real w on the Landau contour; a, vperp, fp, fz real; J real."""
    conj = lambda e: sp.expand(e).subs(sp.I, -sp.I)  # noqa: E731
    for i in range(3):
        for j in range(3):
            d = at_resonance(N[i, j]) - at_resonance(conj(N[j, i]))
            assert sp.simplify(d) == 0, (i, j)
    print("[1] Hermiticity at resonance: N^(m)_ij|res == "
          "conj(N^(m)_ji)|res: PASS")


def check_direct_orbit_integral(N, n_draws=4, mmax=12, seed=7):
    """Brute-force oblique validation: harmonic sum (all |m| <= mmax)
    vs direct numeric gyroaverage + tau-quadrature of the orbit
    integral, at complex w (Im w > 0 for convergence)."""
    from scipy.integrate import quad

    rng = np.random.default_rng(seed)
    fpv, fzv = 1.3, -0.7               # arbitrary fixed gradient values
    kernel = sp.zeros(3, 3)
    for mm in range(-mmax, mmax + 1):
        kernel += N.subs(m_idx, mm) * (sp.I / (w - kpar * vpar - mm * Om))
    fk = sp.lambdify((w, kperp, kpar, Om, vperp, vpar, a),
                     kernel.subs({fp: fpv, fz: fzv}), "scipy")

    for _ in range(n_draws):
        wv = rng.uniform(0.5, 2.0) + 0.35j
        kpe, kpa = rng.uniform(0.3, 1.5, 2)
        Omv = rng.choice([-1.0, 1.0]) * rng.uniform(0.7, 1.8)
        vpe = rng.uniform(0.2, 1.2)
        vpa = rng.uniform(-1.0, 1.0)
        Ev = rng.normal(size=3) + 1j * rng.normal(size=3)
        av = kpe * vpe / Omv
        pred = np.asarray(
            fk(wv, kpe, kpa, Omv, vpe, vpa, av), complex) @ Ev

        def integrand(tau, phi, i):
            psi_t = phi - Omv * tau
            v_t = np.array([vpe * np.cos(psi_t), vpe * np.sin(psi_t), vpa])
            gradf = np.array(
                [fpv * np.cos(psi_t), fpv * np.sin(psi_t), fzv])
            kv = np.array([kpe, 0.0, kpa])
            F = Ev * (1 - kv.dot(v_t) / wv) + kv * (v_t.dot(Ev)) / wv
            phase = ((kpa * vpa - wv) * tau
                     + av * (np.sin(phi) - np.sin(psi_t)))
            vi0 = np.array([vpe * np.cos(phi), vpe * np.sin(phi), vpa])[i]
            return vi0 * F.dot(gradf) * np.exp(1j * phase)

        nphi = 48                       # trapezoid on periodic: spectral
        phis = 2 * np.pi * np.arange(nphi) / nphi
        got = np.zeros(3, complex)
        for i in range(3):
            for phi in phis:
                got[i] += quad(lambda t: integrand(t, phi, i).real,
                               -60.0, 0.0, limit=600)[0]
                got[i] += 1j * quad(lambda t: integrand(t, phi, i).imag,
                                    -60.0, 0.0, limit=600)[0]
        got /= nphi
        err = np.max(np.abs(pred - got) / np.maximum(np.abs(got), 1e-12))
        assert err < 5e-7, (err, pred, got)
    print(f"[2] direct orbit-integral cross-check (all |m|<={mmax}, "
          f"oblique, {n_draws} random draws): PASS")


def check_rank1(N):
    """N^(m)|res = (U/vperp) * T T-dagger -- the factored form
    gamma_oblique uses. The 1/vperp cancels the d^3v measure's vperp,
    so A_ij = -(pi wps^2)/(w kpar) sum_m 2pi Int dvperp U T_i T_j*."""
    Jm = sp.besselj(m_idx, a)
    Jm1, Jp1 = sp.besselj(m_idx - 1, a), sp.besselj(m_idx + 1, a)
    T = sp.Matrix([vperp * (Jm1 + Jp1) / 2,
                   -sp.I * vperp * (Jm1 - Jp1) / 2,
                   vpar * Jm])
    # T-dagger written explicitly (conjugate of the I factor only: J of
    # integer order at real argument is real). T_y = -i vperp J_m'(a):
    # the textbook gyroaveraged-current polarization.
    Tc = sp.Matrix([[vperp * (Jm1 + Jp1) / 2,
                     sp.I * vperp * (Jm1 - Jp1) / 2,
                     vpar * Jm]])
    U = (1 - kpar * vpar / w) * fp + (kpar * vperp / w) * fz
    M = T * Tc
    for i in range(3):
        for j in range(3):
            d = at_resonance(N[i, j]) - at_resonance(U / vperp * M[i, j])
            assert sp.simplify(d) == 0, (i, j, d)
    print("[3] rank-1 factorization at resonance: N^(m)|res = "
          "(U/vperp) T T-dagger with")
    print("      T = (vperp (J_{m-1}+J_{m+1})/2, "
          "-i vperp (J_{m-1}-J_{m+1})/2, vpar J_m)")
    print("      U = (1 - kpar vpar/w) fp + (kpar vperp/w) fz: PASS")
    return T, U


def bimax():
    f0 = (sp.exp(-vpar**2 / apar**2 - vperp**2 / aperp**2)
          / (sp.pi ** sp.Rational(3, 2) * apar * aperp**2))
    return f0, sp.diff(f0, vperp), sp.diff(f0, vpar)


def check_parallel_limit(N):
    """kperp -> 0: e_R* . A . e_R reproduces derive_growth.py's parallel
    Im chi for electrons (Omega = -wc, wc > 0)."""
    wc = sp.Symbol("wc", positive=True)
    f0, dfp, dfz = bimax()
    eR = sp.Matrix([1, sp.I, 0]) / sp.sqrt(2)

    total = sp.Integer(0)
    contributing = []
    for mm in (-2, -1, 0, 1, 2):
        contracted = (eR.conjugate().T * N.subs(m_idx, mm) * eR)[0, 0]
        lim = sp.limit(contracted, a, 0)    # J_nu(0) = delta_nu0
        if lim == 0:
            continue
        contributing.append(mm)
        vres = (w - mm * Om) / kpar
        expr = lim.subs(fp, dfp).subs(fz, dfz).subs(vpar, vres)
        igr = sp.integrate(2 * sp.pi * vperp * expr,
                           (vperp, 0, sp.oo), conds="none")
        total += (-sp.pi / kpar) * igr      # (wps^2/w) folded out
    total = sp.simplify(total.subs(Om, -wc))
    zeta = (w - wc) / (kpar * apar)
    expected = (sp.sqrt(sp.pi) * sp.exp(-zeta**2) / w) * (
        zeta * (Tr - 1) + w / (kpar * apar))
    expected = expected.subs(Tr, aperp**2 / apar**2)
    assert sp.simplify(sp.expand(total - expected)) == 0
    assert contributing == [-1], contributing
    print("[4] parallel limit: kperp->0 R-mode contraction == "
          "derive_growth.py's parallel Im chi (electron cyclotron term "
          "only, m = -1 in the signed-Omega convention): PASS")


def check_landau_pin(N):
    """m = 0, zz, kperp -> 0 vs an INDEPENDENT 1D unmagnetized
    derivation: -iw f1 + i k v f1 = -(q/m) E df0/dv gives
    chi_zz^1D = (wp^2/w) Int dv v (df0/dv)/(w - k v) (identical
    prefactor convention); resonant numerator at v = w/k."""
    f0, dfp, dfz = bimax()
    N0zz = sp.limit(N.subs(m_idx, 0)[2, 2], a, 0)
    vres = w / kpar
    expr = N0zz.subs(fp, dfp).subs(fz, dfz).subs(vpar, vres)
    got = sp.simplify(sp.integrate(2 * sp.pi * vperp * expr,
                                   (vperp, 0, sp.oo), conds="none"))
    f0_1d = sp.exp(-vpar**2 / apar**2) / (sp.sqrt(sp.pi) * apar)
    n_1d = sp.simplify((vpar * sp.diff(f0_1d, vpar)).subs(vpar, vres))
    assert sp.simplify(sp.expand(got - n_1d)) == 0
    print("[5] Landau pin: m=0 zz kernel at kperp->0 == independent 1D "
          "Vlasov resonant numerator: PASS")


def main():
    N = derive_numerators()
    check_hermiticity(N)
    check_direct_orbit_integral(N)
    T, U = check_rank1(N)
    check_parallel_limit(N)
    check_landau_pin(N)
    print("\n[6] implementation form (raytrace_tpu.growth.gamma_oblique):")
    print("  A_ij = -(pi wps^2)/(w kpar) sum_m 2pi Int dvperp")
    print("         U(vperp, vres_m) T_i T_j*  at vpar = vres_m")
    print("  (the d^3v measure's vperp cancels the U/vperp scalar)")
    print("  gamma = -(e* . A . e)/(d/dw e* . D . e)")
    print("        = (pi wps^2)/(w kpar) sum_m 2pi Int dvperp")
    print("          U |conj(T) . e|^2 / Lambda'  (single-signed per")
    print("          resonance: U < 0 everywhere for a Maxwellian ->")
    print("          damping; anisotropy can flip U's sign -> growth)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
