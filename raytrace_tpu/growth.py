"""Quantitative whistler growth/damping along rays (Kennel-Petschek class).

The reference framework traces ray PATHS; the physical question those paths
exist to answer is whether the wave AMPLIFIES or DAMPS along them -- the
magnetospheric-amplification calculation of Kennel & Petschek 1966. This
module closes ROADMAP #6 (the last "medium extensions" tier): a
quantitative linear growth rate for whistler-mode waves interacting with a
hot anisotropic electron population, evaluated pointwise along traced rays
and integrated to a path gain.

The physics is NOT quoted from a table: the hot bi-Maxwellian
susceptibility for parallel-propagating R-mode waves is derived
symbolically in tools/derive_growth.py (linearized-Vlasov kernel, velocity
integrals done by sympy), with two hard-asserted validations pinning its
conventions to this repo's own machinery:

  (a) its cold limit is exactly the electron term of the cold Stix R that
      ops/dispersion.stix_rlp implements (so w, wc, k sign conventions are
      the framework's own);
  (b) its marginal-stability point is exactly the Kennel-Petschek critical
      anisotropy A_c = f/(fce - f) that analysis.kp_critical_anisotropy
      pins from the independent threshold argument.

Weak-growth evaluation (|gamma| << w, standard for magnetospheric hiss/
chorus/whistler amplification):

    D(w, k) = R_cold(w) - c^2 k^2 / w^2          (parallel R-mode)
    gamma   = -Im chi_hot / (dD/dw)              at the cold root
    Im chi_hot = sqrt(pi) exp(-zeta^2) * Q
    Q = (eta wpe^2 / w^2) * ( zeta (Tr - 1) + w / (kpar apar) )
    zeta = (w - wc) / (kpar apar)                (resonant velocity / apar)

with Tr = Tperp/Tpar, apar = sqrt(2 Tpar / m_e), eta = n_hot/n_e. The hot
population's back-reaction on the REAL dispersion is neglected (eta << 1,
the standard KP approximation), so k comes from the framework's cold
dispersion solver. In gamma_whistler/gamma_emic, obliquity enters only
through the parallel wavenumber kpar = k(psi) cos(psi) in the resonance
condition (quasi-longitudinal approximation -- adequate for the
small-psi / ducted regime where whistler amplification happens).

GENUINELY OBLIQUE kinetics -- the full harmonic sum with Landau (m=0)
and cyclotron (m = -+1, ...) resonances at the exact cold oblique root
and polarization -- is gamma_oblique below, derived and five-way
validated in tools/derive_growth_oblique.py. It is what quantifies the
Landau damping of unducted oblique whistlers (the physical reason
ducting matters for amplification).

Sign conventions follow the traced whistler: growth (gamma > 0) exactly
when A > A_c AND resonant electrons exist (exp(-zeta^2) > 0); isotropic or
under-anisotropic populations give cyclotron DAMPING (gamma < 0) -- both
ends tested in tests/test_growth.py.

Host-side analysis code (numpy), like analysis.py: gamma is a diagnostic
evaluated on saved trajectories, not part of the traced hot loop.
"""

from dataclasses import dataclass

import numpy as np

from .constants import C_LIGHT, FCE_E, FPE2_E, M_E, Q_E
from .constants import RE as _RE_M
from .ops import dispersion

_TWO_PI = 2.0 * np.pi
_NEPER_DB = 20.0 / np.log(10.0)    # 1 neper = 8.6859 dB (amplitude)


@dataclass(frozen=True)
class HotElectrons:
    """A hot anisotropic electron fraction riding on the cold density.

    eta: n_hot / n_e (KP weak-growth assumes eta << 1; the cold dispersion
         is evaluated with the full n_e, standard since n_hot is included
         in quasi-neutrality either way at this order).
    t_par_ev: parallel temperature in eV (apar = sqrt(2 T / m_e)).
    anisotropy: A = Tperp/Tpar - 1 (0 = isotropic -> pure damping)."""

    eta: float = 1.0e-3
    t_par_ev: float = 10.0e3
    anisotropy: float = 1.0


@dataclass(frozen=True)
class HotProtons:
    """A hot anisotropic proton fraction (EMIC growth -- gamma_emic).

    Same convention as HotElectrons; apar uses the PROTON mass."""

    eta: float = 1.0e-3
    t_par_ev: float = 30.0e3
    anisotropy: float = 1.0


def _dstix_dw(w, ne_m3, bmag, mode, eta_he=0.0, eta_o=0.0):
    """Closed-form d/dw of the cold Stix R (mode='whistler') or L
    (mode='emic') in angular units.

    R = 1 - sum_s wps^2 / (w (w + sig_s)), sig_e = -wce, sig_i = +wci;
    L flips every sig (the ratio forms -X/(1 -+ Y) of
    ops/dispersion.stix_rlp, rewritten); each term's derivative is
    wps^2 (2w + sig_s) / (w (w + sig_s))^2. Parity vs a numerical
    derivative of stix_rlp: tests/test_growth.py."""
    n_cm3 = ne_m3 * 1.0e-6
    flip = -1.0 if mode == "emic" else 1.0
    out = 0.0
    species = [(FPE2_E, -FCE_E)]
    for fpe2_i, fce_i in dispersion.ion_species(eta_he, eta_o):
        species.append((fpe2_i, fce_i))
    for fpe2_s, fce_signed in species:
        wps2 = _TWO_PI**2 * fpe2_s * n_cm3
        sig = flip * _TWO_PI * fce_signed * bmag
        den = w * (w + sig)
        out = out + wps2 * (2.0 * w + sig) / (den * den)
    return out


def _dr_dw(w, ne_m3, bmag, eta_he=0.0, eta_o=0.0):
    return _dstix_dw(w, ne_m3, bmag, "whistler", eta_he, eta_o)


def gamma_whistler(f, bmag, ne_m3, hot: HotElectrons, psi=0.0,
                   eta_he=0.0, eta_o=0.0):
    """Local temporal growth rate gamma [rad/s] of the whistler amplitude.

    f: wave frequency, Hz; bmag: |B|, T; ne_m3: cold electron density,
    m^-3; psi: wave-normal angle (rad; 0 = field-aligned). Arrays
    broadcast. Positive gamma = growth.

    Refractive index: the QUASI-LONGITUDINAL whistler index -- the cold
    Stix R with every magnetic term's Y replaced by Y |cos psi| (i.e.
    stix_rlp evaluated at an effective B |cos psi|), which is exactly R
    at psi = 0 and the classic Helliwell QL whistler branch off-axis.
    (The framework's traced quartic '+' root is deliberately NOT used
    here: it is bug-compatible with the reference's root selection,
    whose mu^2 is negative at the canonical configs and abs()'d --
    ops/dispersion.py module docstring. The growth diagnostic needs the
    physical R-mode branch.) kpar = (w/c) mu_ql |cos psi| carries the
    resonance; points where the QL index is evanescent (incl. the
    resonance cone Y cos psi -> 1 ... psi -> 90 deg, where QL growth
    theory does not apply) return 0."""
    return _gamma_cyclotron(f, bmag, ne_m3, hot, psi, "whistler",
                            eta_he, eta_o)


def gamma_emic(f, bmag, ne_m3, hot: HotProtons, psi=0.0,
               eta_he=0.0, eta_o=0.0):
    """Local temporal growth rate gamma [rad/s] of the EMIC amplitude.

    The ion-cyclotron counterpart of gamma_whistler, for the '-' root
    the framework also traces (wave_mode="emic"): L-mode waves below the
    proton gyrofrequency, driven by a hot anisotropic PROTON fraction.
    The derived susceptibility (tools/derive_growth.py) is species-
    agnostic -- the identical P + Q Z(zeta) form applies with the
    resonant species' plasma/gyro frequency and thermal speed, pinned by
    the same cold-limit identity (the L-mode cold proton term is
    -wpi^2/(w(w - wci)), the exact mirror of the R-mode electron term).
    Growth iff A_p > f/(fci - f), the proton KP threshold; validated
    against a full-kinetic L-mode root solve in tests/test_growth.py.
    Multi-ion cold backgrounds (eta_he/eta_o) shift the L-mode index;
    the hot resonance stays at the proton gyrofrequency."""
    return _gamma_cyclotron(f, bmag, ne_m3, hot, psi, "emic",
                            eta_he, eta_o)


def _gamma_cyclotron(f, bmag, ne_m3, hot, psi, mode, eta_he, eta_o):
    from .constants import FCE_P, FPE2_P, M_P

    f = np.asarray(f, np.float64)
    bmag = np.asarray(bmag, np.float64)
    ne_m3 = np.asarray(ne_m3, np.float64)
    psi = np.asarray(psi, np.float64)

    w = _TWO_PI * f
    n_cm3 = ne_m3 * 1.0e-6
    if mode == "whistler":
        wc = _TWO_PI * FCE_E * bmag
        wp2_hot = hot.eta * _TWO_PI**2 * FPE2_E * n_cm3
        apar = np.sqrt(2.0 * Q_E * hot.t_par_ev / M_E)
        rlp_idx = 0          # cold R carries the QL whistler branch
    elif mode == "emic":
        wc = _TWO_PI * FCE_P * bmag
        wp2_hot = hot.eta * _TWO_PI**2 * FPE2_P * n_cm3
        apar = np.sqrt(2.0 * Q_E * hot.t_par_ev / M_P)
        rlp_idx = 1          # cold L carries the QL EMIC branch
    else:
        raise ValueError(f"unknown mode {mode!r}")

    cpsi = np.abs(np.cos(psi))
    b_eff = bmag * cpsi
    mu2_ql = np.asarray(
        dispersion.stix_rlp(ne_m3, b_eff, f, eta_he, eta_o)[rlp_idx],
        np.float64,
    )
    propagating = mu2_ql > 0.0
    mu2s = np.where(propagating, mu2_ql, 1.0)
    k = (w / C_LIGHT) * np.sqrt(mu2s)
    kpar = np.maximum(k * cpsi, 1.0e-30)

    # the RESONANCE uses the true gyrofrequency (particles gyrate about
    # the real B); only the cold index takes the QL Y cos psi substitution
    tr = hot.anisotropy + 1.0
    zeta = (w - wc) / (kpar * apar)
    q = (wp2_hot / (w * w)) * (
        zeta * (tr - 1.0) + w / (kpar * apar)
    )
    # exp(-zeta^2) underflows harmlessly to 0 far from resonance
    im_chi = np.sqrt(np.pi) * np.exp(-np.minimum(zeta * zeta, 700.0)) * q

    # dD/dw of D = mu2_ql(w) - c^2 k^2/w^2 at fixed k, consistently at
    # the effective field (psi enters D only through Y cos psi)
    ddw = _dstix_dw(w, ne_m3, b_eff, mode, eta_he, eta_o) + 2.0 * mu2s / w
    gamma = -im_chi / ddw
    return np.where(propagating, gamma, 0.0)


def _dp_dw(w, ne_m3, eta_he=0.0, eta_o=0.0):
    """Closed-form d/dw of the cold Stix P = 1 - sum_s wps^2/w^2."""
    n_cm3 = ne_m3 * 1.0e-6
    fpe2_tot = FPE2_E + sum(
        fpe2_i for fpe2_i, _ in dispersion.ion_species(eta_he, eta_o)
    )
    return 2.0 * _TWO_PI**2 * fpe2_tot * n_cm3 / w**3


def cold_mode_oblique(f, bmag, ne_m3, psi, eta_he=0.0, eta_o=0.0):
    """Physical whistler-branch cold root + polarization at oblique psi.

    Solves the Stix quartic A mu^4 - B mu^2 + C = 0 built from S, D, P
    (A = S sin^2 + P cos^2, B = RL sin^2 + PS(1 + cos^2), C = PRL) and
    selects the PHYSICAL whistler branch: in the whistler band
    (f_ci << f < f_ce < f_pe) exactly one root is propagating (at psi=0
    the roots are R > 0 and L < 0), so the branch is "the positive
    root"; when both propagate (outside the band) the larger index is
    the whistler-like one. Deliberately NOT the traced quartic's
    bug-compatible '+' root (ops/dispersion module docstring) -- kinetic
    growth needs the physical branch, same policy as gamma_whistler's
    QL index.

    Polarization: the null vector of the full dispersion tensor
    D_ij = mu^2 (kap_i kap_j - d_ij) + eps_ij (Stix frame: k in the
    x-z plane, B0 = z), computed as the cross product of the two most
    independent rows (any two rows of a rank-2 matrix span the
    orthogonal complement of its null space).

    Returns dict: mu2, propagating (bool), e ((..., 3) complex unit
    polarization), lam_p (d/dw[e* . D . e] at fixed k, the weak-growth
    denominator), S, D, P."""
    f = np.asarray(f, np.float64)
    bmag = np.asarray(bmag, np.float64)
    ne_m3 = np.asarray(ne_m3, np.float64)
    psi = np.asarray(psi, np.float64)
    w = _TWO_PI * f

    r_, l_, p_ = (np.asarray(x, np.float64)
                  for x in dispersion.stix_rlp(ne_m3, bmag, f,
                                               eta_he, eta_o))
    s_, d_ = (r_ + l_) / 2.0, (r_ - l_) / 2.0
    sn, cs = np.abs(np.sin(psi)), np.abs(np.cos(psi))
    sn2, cs2 = sn * sn, cs * cs

    qa = s_ * sn2 + p_ * cs2
    qb = r_ * l_ * sn2 + p_ * s_ * (1.0 + cs2)
    qc = p_ * r_ * l_
    disc = qb * qb - 4.0 * qa * qc
    ok = disc >= 0.0
    sq = np.sqrt(np.where(ok, disc, 0.0))
    # stable quadratic: the (B + sign(B) sq) form avoids cancellation
    qden = qb + np.where(qb >= 0.0, sq, -sq)
    qden = np.where(qden == 0.0, 1.0, qden)
    root1 = qden / (2.0 * np.where(qa == 0.0, np.finfo(np.float64).tiny,
                                   qa))
    root2 = 2.0 * qc / qden
    both = np.stack([root1, root2], axis=-1)
    pos = both > 0.0
    # whistler branch: the positive root; if both positive, the larger
    mu2 = np.where(
        pos.any(axis=-1),
        np.where(pos.all(axis=-1), both.max(axis=-1),
                 np.where(pos[..., 0], both[..., 0], both[..., 1])),
        1.0,
    )
    propagating = ok & pos.any(axis=-1)
    n2 = np.where(propagating, mu2, 1.0)

    # dispersion-tensor rows (complex); null vector from row crosses
    zero = np.zeros_like(n2)
    row0 = np.stack([s_ - n2 * cs2, -1j * d_ + zero, n2 * cs * sn],
                    axis=-1)
    row1 = np.stack([1j * d_ + zero, s_ - n2 + zero * 1j, zero + 0j],
                    axis=-1)
    row2 = np.stack([n2 * cs * sn + 0j, zero + 0j, p_ - n2 * sn2 + 0j],
                    axis=-1)
    crosses = [np.cross(row0, row1), np.cross(row0, row2),
               np.cross(row1, row2)]
    norms = [np.sum(np.abs(c) ** 2, axis=-1) for c in crosses]
    stackc = np.stack(crosses, axis=0)
    stackn = np.stack(norms, axis=0)
    pick = np.argmax(stackn, axis=0)
    e = np.take_along_axis(stackc, pick[None, ..., None], axis=0)[0]
    en = np.sqrt(np.sum(np.abs(e) ** 2, axis=-1, keepdims=True))
    e = e / np.where(en == 0.0, 1.0, en)

    # lam_p = d/dw [e* . D . e] at fixed k:
    #   e* . d(eps)/dw . e + (-2/w) n^2 (|kap.e|^2 - 1)
    dr = _dstix_dw(w, ne_m3, bmag, "whistler", eta_he, eta_o)
    dl = _dstix_dw(w, ne_m3, bmag, "emic", eta_he, eta_o)
    ds_, dd_ = (dr + dl) / 2.0, (dr - dl) / 2.0
    dp_ = _dp_dw(w, ne_m3, eta_he, eta_o)
    e0, e1, e2 = e[..., 0], e[..., 1], e[..., 2]
    deps = (ds_ * (np.abs(e0) ** 2 + np.abs(e1) ** 2)
            + dp_ * np.abs(e2) ** 2
            + 2.0 * dd_ * np.imag(np.conj(e0) * e1))
    kap_e = sn * e0 + cs * e2
    lam_p = deps + (-2.0 / w) * n2 * (np.abs(kap_e) ** 2 - 1.0)
    return {"mu2": n2, "propagating": propagating, "e": e,
            "lam_p": lam_p, "S": s_, "D": d_, "P": p_}


def gamma_oblique(f, bmag, ne_m3, hot: HotElectrons, psi,
                  harmonics=(-1, 0, 1), n_quad=96,
                  eta_he=0.0, eta_o=0.0, return_parts=False):
    """Fully oblique kinetic growth/damping rate gamma [rad/s] of the
    whistler branch: cyclotron (m = -+1) AND Landau (m = 0) resonances
    with the hot bi-Maxwellian electron fraction, at the exact cold
    oblique root and polarization.

    This supersedes the quasi-longitudinal gamma_whistler at psi != 0:
    it is the machinery that shows UNducted oblique whistlers Landau-
    damping (the reason ducts matter). Every formula is derived and
    validated in tools/derive_growth_oblique.py (linearized-Vlasov orbit
    integral; five hard-asserted checks incl. a direct numeric
    orbit-integral cross-check and reduction to the parallel
    derive_growth.py kernel):

      gamma = -(e* . A . e) / (d/dw [e* . D . e]),
      e* A e = -(pi wph^2)/(w kpar) sum_m 2pi Int dvperp U_m |T_m . e|^2
      U_m  = [(m Omega/w) fp + (kpar vperp/w) fz] at vpar = vres_m
      T_m  = (vperp (J_{m-1}+J_{m+1})/2, -i vperp (J_{m-1}-J_{m+1})/2,
              vres_m J_m),  argument a = kperp vperp / Omega,
      vres_m = (w - m Omega)/kpar,   Omega = -wce (signed, electrons).

    The vperp integral is Gauss-Legendre quadrature on vperp/aperp in
    [0, 8] (n_quad nodes, Gaussian weight explicit) -- the integrand is
    analytic there, so convergence is spectral. harmonics: which m to
    include; (-1, 0, 1) covers the principal cyclotron + Landau +
    anomalous terms (|m| <= 2-3 only matters at large kperp rho).
    Evanescent points and psi at/beyond the resonance cone return 0.
    Requires scipy (Bessel J); host-side analysis code like the rest of
    this module."""
    try:
        from scipy.special import jv
    except ImportError as exc:            # pragma: no cover
        raise ImportError(
            "gamma_oblique needs scipy.special.jv for the Bessel "
            "harmonic weights; scipy is unavailable") from exc

    f = np.asarray(f, np.float64)
    bmag = np.asarray(bmag, np.float64)
    ne_m3 = np.asarray(ne_m3, np.float64)
    psi = np.asarray(psi, np.float64)
    f, bmag, ne_m3, psi = np.broadcast_arrays(f, bmag, ne_m3, psi)

    cold = cold_mode_oblique(f, bmag, ne_m3, psi, eta_he, eta_o)
    w = _TWO_PI * f
    mu = np.sqrt(cold["mu2"])
    sn, cs = np.abs(np.sin(psi)), np.abs(np.cos(psi))
    k = (w / C_LIGHT) * mu
    kpar = np.maximum(k * cs, 1.0e-30)
    kperp = k * sn

    wce = _TWO_PI * FCE_E * bmag
    omega_e = -wce                        # signed electron gyrofrequency
    n_cm3 = ne_m3 * 1.0e-6
    wp2_hot = hot.eta * _TWO_PI**2 * FPE2_E * n_cm3
    apar = np.sqrt(2.0 * Q_E * hot.t_par_ev / M_E)
    tr = hot.anisotropy + 1.0
    aperp = apar * np.sqrt(tr)

    # Gauss-Legendre on x = vperp/aperp in [0, 8] (e^{-64} tail cut),
    # Gaussian weight explicit in the integrand: the integrand is
    # analytic on the interval (half-range Gauss-Hermite stumbles on
    # the |x| parity kink, and numpy's hermgauss overflows above ~190
    # nodes), so this converges spectrally and scales to any n_quad.
    xg, wg = np.polynomial.legendre.leggauss(int(n_quad))
    x_hi = 8.0
    xq = 0.5 * x_hi * (xg + 1.0)
    wq = 0.5 * x_hi * wg * np.exp(-xq * xq)

    vperp = aperp[..., None] * xq         # (..., nq)
    a_arg = kperp[..., None] * vperp / omega_e[..., None]
    e = cold["e"]
    e0, e1, e2 = (e[..., 0, None], e[..., 1, None], e[..., 2, None])

    c0 = 1.0 / (np.pi**1.5 * apar * aperp**2)   # f0 / e^{-x^2-zeta^2}
    contraction = np.zeros(f.shape, np.float64)
    parts = {}
    for m in harmonics:
        m = int(m)
        vres = (w - m * omega_e) / kpar
        gauss_par = np.exp(
            -np.minimum((vres / apar) ** 2, 700.0))
        # U_m with the e^{-x^2} Gaussian factored into the quadrature
        # weight: U = -(2 vperp c0 gauss_par / w) *
        #             [m Omega / aperp^2 + kpar vres / apar^2] e^{-x^2}
        u_coef = -(2.0 * c0 * gauss_par / w) * (
            m * omega_e / aperp**2 + kpar * vres / apar**2
        )
        jm = jv(m, a_arg)
        jm1, jp1 = jv(m - 1, a_arg), jv(m + 1, a_arg)
        # conj(T) . e with T_y = -i vperp Jm': conj(T_y) e_y = +i ... e_y
        t_dot_e = (vperp * (jm1 + jp1) / 2.0 * e0
                   + 1j * vperp * (jm1 - jp1) / 2.0 * e1
                   + vres[..., None] * jm * e2)
        g = u_coef[..., None] * vperp * np.abs(t_dot_e) ** 2
        i_m = aperp * np.sum(wq * g, axis=-1)
        part = -(np.pi * wp2_hot / (w * kpar)) * 2.0 * np.pi * i_m
        contraction = contraction + part
        if return_parts:
            parts[m] = part

    gamma = np.where(
        cold["propagating"] & (cs > 1.0e-12),
        -contraction / cold["lam_p"],
        0.0,
    )
    if return_parts:
        gamma_m = {
            m: np.where(cold["propagating"] & (cs > 1.0e-12),
                        -p / cold["lam_p"], 0.0)
            for m, p in parts.items()
        }
        return gamma, {"gamma_m": gamma_m, "mu2": cold["mu2"],
                       "e": e, "lam_p": cold["lam_p"]}
    return gamma


def path_gain(traj_u, f, env, hot: HotElectrons, frame="2d_lat",
              psi_mode="local", kinetics="ql"):
    """Growth-rate profile + integrated amplitude gain along trajectories.

    traj_u: (S, B, n) saved snapshots (or (S, n) for one ray) in the
    given frame ("2d_lat" | "2d_colat" | "3d"); f: Hz, scalar or (B,).
    The gain integral uses the ray's OWN group-delay channel (state T:
    u[..., 3] in 2D, u[..., 6] in 3D):
      gain(s) = Int gamma dT  [nepers],  amplitude ratio = exp(gain),
    with non-advancing-T snapshots (post-termination padding) masked out.
    The 3D frame is field-model-general like make_save_fn_3d: |B| from
    the vector field, density at the magnetic latitude, psi from the
    B.rho geometry.

    psi_mode: "local" evaluates gamma at the ray's instantaneous
    wave-normal angle (quasi-longitudinal kpar = k cos psi); "parallel"
    forces psi = 0 (the classic KP equatorial-amplification estimate).

    kinetics: "ql" uses gamma_whistler (quasi-longitudinal, cyclotron
    resonance only); "oblique" uses gamma_oblique (exact cold oblique
    root + polarization, cyclotron AND Landau resonances) -- the right
    setting for unducted rays whose psi grows along the path.

    Returns dict: gamma (S, B) [rad/s], gain_neper (S, B) cumulative,
    gain_db (S, B), t (S, B) group time [s]."""
    from .models import medium

    u = np.asarray(traj_u, np.float64)
    squeeze = u.ndim == 2
    if squeeze:
        u = u[:, None, :]
    r = u[..., 0]
    if frame == "2d_lat":
        lat = u[..., 1]
        psi = np.asarray(dispersion.psi_lat(u[..., 1], u[..., 2]))
        bm = np.asarray(medium.b_mag(r, lat, env), np.float64)
        ne = np.asarray(medium.ne_total_m3(r, lat, env), np.float64)
        t_idx = 3
    elif frame == "2d_colat":
        lat = np.pi / 2 - u[..., 1]
        psi = np.asarray(dispersion.psi_colat(u[..., 1], u[..., 2]))
        bm = np.asarray(medium.b_mag(r, lat, env), np.float64)
        ne = np.asarray(medium.ne_total_m3(r, lat, env), np.float64)
        t_idx = 3
    elif frame == "3d":
        theta, phi = u[..., 1], u[..., 2]
        psi = np.asarray(dispersion.psi_3d(
            r, theta, phi, u[..., 3], u[..., 4], u[..., 5], env
        ))
        mlat = np.asarray(medium.mlat_3d(r, theta, phi, env))
        br, bt, bp = medium.b_vec(r, theta, phi, env)
        bm = np.sqrt(
            np.asarray(br, np.float64) ** 2
            + np.asarray(bt, np.float64) ** 2
            + np.asarray(bp, np.float64) ** 2
        )
        ne = np.asarray(medium.ne_total_m3(r, mlat, env), np.float64)
        t_idx = 6
    else:
        raise ValueError(f"unsupported frame {frame!r}")
    if psi_mode == "parallel":
        psi = np.zeros_like(psi)
    elif psi_mode != "local":
        raise ValueError(f"unknown psi_mode {psi_mode!r}")
    f_b = np.broadcast_to(np.asarray(f, np.float64), bm.shape)
    if kinetics == "ql":
        gam = gamma_whistler(
            f_b, bm, ne, hot, psi=psi,
            eta_he=float(env.eta_he), eta_o=float(env.eta_o),
        )
    elif kinetics == "oblique":
        gam = gamma_oblique(
            f_b, bm, ne, hot, psi,
            eta_he=float(env.eta_he), eta_o=float(env.eta_o),
        )
    else:
        raise ValueError(f"unknown kinetics {kinetics!r}")

    # group time: the T state is already in SECONDS (ops/rhs.py folds
    # RE_OVER_C into dT/dtau; ensemble_stats reports u[:, -1] directly
    # as mean_group_delay_s)
    t = u[..., t_idx]
    dt = np.diff(t, axis=0)
    advancing = dt > 0.0
    dt = np.where(advancing, dt, 0.0)
    mid = 0.5 * (gam[1:] + gam[:-1])
    gain = np.concatenate(
        [np.zeros_like(gam[:1]), np.cumsum(mid * dt, axis=0)], axis=0
    )
    out = {
        "gamma": gam,
        "gain_neper": gain,
        "gain_db": gain * _NEPER_DB,
        "t": t,
    }
    if squeeze:
        out = {kk: v[:, 0] for kk, v in out.items()}
    return out


def group_velocity_parallel(f, bmag, ne_m3, mode="whistler",
                            eta_he=0.0, eta_o=0.0):
    """Parallel group velocity [m/s] of the R-mode whistler (or L-mode
    EMIC): v_g = c / (mu + w dmu/dw) with mu^2 = R (or L) and
    dmu/dw = (dR/dw)/(2 mu) from the closed-form _dstix_dw. Returns 0
    where the mode is evanescent. Cross-checked against the framework's
    own group-delay integrand (f/mu) dmu/df in tests/test_growth.py."""
    f = np.asarray(f, np.float64)
    bmag = np.asarray(bmag, np.float64)
    ne_m3 = np.asarray(ne_m3, np.float64)
    w = _TWO_PI * f
    idx = 0 if mode == "whistler" else 1
    mu2 = np.asarray(
        dispersion.stix_rlp(ne_m3, bmag, f, eta_he, eta_o)[idx], np.float64
    )
    ok = mu2 > 0.0
    mu = np.sqrt(np.where(ok, mu2, 1.0))
    dmudw = _dstix_dw(w, ne_m3, bmag, mode, eta_he, eta_o) / (2.0 * mu)
    vg = C_LIGHT / (mu + w * dmudw)
    return np.where(ok, vg, 0.0)


def transit_gain_db(l_shell, f, env, hot, mode="whistler",
                    lat_max_deg=45.0, n_lat=301):
    """Single-transit Kennel-Petschek gain [dB]: the amplitude gain of a
    field-aligned wave packet crossing the equatorial growth region once,

        G = Int gamma(lambda) / v_g(lambda) ds(lambda)   [nepers] * 8.686

    integrated along the dipole field line of the given L-shell
    (arc length ds = L cos(lat) sqrt(1 + 3 sin^2 lat) d lat), with gamma
    from the derived susceptibility and v_g from the closed-form parallel
    group velocity. This is THE number magnetospheric amplification
    studies quote (tens of dB per transit for strong chorus/whistler
    events); the ducted-propagation assumption (wave stays field-aligned)
    is what ducts exist to realize. mode="emic" uses HotProtons and the
    L-mode. Scalar f or array; returns gain_db broadcast over f.

    Reading the magnitude: this is the LINEAR gain. Values of hundreds
    of dB (easily reached at eta ~ 1e-3 of a dense plasmasphere) do not
    describe observable waves -- they are the Kennel-Petschek
    instability argument itself: a flux this unstable amplifies its own
    waves until pitch-angle scattering removes the anisotropy, so such
    configurations self-limit toward marginal stability (gain of order
    e^3 per transit in KP's classic treatment). The interesting uses
    are WHERE the gain peaks in f and L, the threshold structure, and
    modest-gain (weakly unstable) populations."""
    from .models import medium

    lat = np.radians(np.linspace(-lat_max_deg, lat_max_deg, n_lat))
    r = np.asarray(l_shell, np.float64) * np.cos(lat) ** 2
    bm = np.asarray(medium.b_mag(r, np.abs(lat), env), np.float64)
    ne = np.asarray(medium.ne_total_m3(r, np.abs(lat), env), np.float64)
    ds = (np.asarray(l_shell, np.float64) * np.cos(lat)
          * np.sqrt(1.0 + 3.0 * np.sin(lat) ** 2)) * _RE_M

    f = np.atleast_1d(np.asarray(f, np.float64))
    out = np.zeros(f.shape, np.float64)
    eh, eo = float(env.eta_he), float(env.eta_o)
    for i, fi in enumerate(f):
        gam = _gamma_cyclotron(
            np.full_like(bm, fi), bm, ne, hot, 0.0, mode, eh, eo
        )
        vg = group_velocity_parallel(
            np.full_like(bm, fi), bm, ne, mode, eh, eo
        )
        integrand = np.where(vg > 0.0, gam / np.maximum(vg, 1.0), 0.0)
        out[i] = np.trapezoid(integrand * ds, lat)
    gain = out * _NEPER_DB
    return gain if gain.size > 1 else float(gain[0])


def equatorial_gain_profile(l_shell, f, env, hot: HotElectrons,
                            psi=0.0):
    """gamma(f) at the equator of a given L-shell -- the classic KP
    amplification spectrum (which frequencies grow, where the threshold
    cuts off). Frequencies above f_c = fce * A/(1 + A) are damped
    (A < A_c there); the growth peak sits below that cutoff.

    Returns dict: gamma [rad/s], fce [Hz], f_cutoff [Hz]."""
    from .models import medium

    r = np.asarray(l_shell, np.float64)
    lat = np.zeros_like(r)
    bm = np.asarray(medium.b_mag(r, lat, env), np.float64)
    ne = np.asarray(medium.ne_total_m3(r, lat, env), np.float64)
    f = np.asarray(f, np.float64)
    bm_b, f_b = np.broadcast_arrays(bm, f)
    ne_b = np.broadcast_to(ne, bm_b.shape)
    gam = gamma_whistler(
        f_b, bm_b, ne_b, hot, psi=psi,
        eta_he=float(env.eta_he), eta_o=float(env.eta_o),
    )
    fce = FCE_E * bm_b
    return {
        "gamma": gam,
        "fce": fce,
        "f_cutoff": fce * hot.anisotropy / (1.0 + hot.anisotropy),
    }
