"""Cold-plasma (Stix) dispersion: phase refractive index for whistler waves.

Solves A mu^4 - B mu^2 + C = 0 with
  A = S sin^2 psi + P cos^2 psi
  B = RL sin^2 psi + PS (1 + cos^2 psi)
  C = PRL
  F^2 = (RL - PS)^2 sin^4 psi + 4 (P D cos psi)^2,   mu^2 = (B +- F)/(2A)
for a quasi-neutral electron-proton plasma (reference:
RayMain.jl:125-264, RayTrace_lat.jl:44-194, RayTrace_3D.jl:93-219).
The '+' root is the electron whistler mode (mu^2 -> R as psi -> 0,
RayMain.jl:242-244); the '-' root is the EMIC mode.

TPU-first design decisions:
  - ratio form: X = f_p^2/f^2, Y = f_c/f instead of raw angular frequencies
    (identical algebra, better float32 range).
  - magnitude normalization: R, L, P are scaled by s = max(|R|,|L|,|P|)
    before forming A, B, C, F; the quartic is scale-covariant
    (mu^2(sR,sL,sP) = s mu^2(R,L,P)), so mu^2 = s * mu2_normalized. This
    keeps intermediates like F^2 ~ O(1) instead of O(1e20), which is what
    makes the float32 TPU path viable.
  - numerically stable root via the product identity mu2+ * mu2- = C/A
    (the Bortnik 2004 branch the reference left commented out,
    RayMain.jl:204-209): when B < 0 the '+' root uses 2C/(B - F).
  - evanescent regions (mu^2 < 0) produce mu = sqrt(|mu^2|) like the
    reference's abs() guard (RayMain.jl:212-238), with the sign of mu^2
    exposed so the integrator can flag EVANESCENT status instead of
    crashing a batch.

All functions are pure scalars, to be batched with jax.vmap and
differentiated with jax.grad.
"""

import jax.numpy as jnp

from ..constants import (
    FCE_E, FCE_HE, FCE_O, FCE_P, FPE2_E, FPE2_HE, FPE2_O, FPE2_P,
)
from ..models import dipole, medium


def ion_species(eta_he=0.0, eta_o=0.0):
    """[(fpe2_coeff * fraction, fce_coeff), ...] of the PRESENT singly-
    charged ion species under quasi-neutrality n_e = n_p + n_He + n_O.

    Python-float-zero fractions drop their species at trace time (the
    protons-only default compiles to the exact reference algebra).
    Traced/nonzero fractions keep theirs."""
    def _off(v):
        return isinstance(v, float) and v == 0.0

    frac_p = 1.0 - eta_he - eta_o
    species = [(FPE2_P * frac_p, FCE_P)]
    if not _off(eta_he):
        species.append((FPE2_HE * eta_he, FCE_HE))
    if not _off(eta_o):
        species.append((FPE2_O * eta_o, FCE_O))
    return species


def stix_rlp(ne_m3, bmag, f, eta_he=0.0, eta_o=0.0):
    """Stix R, L, P for a quasi-neutral multi-ion plasma.

    ne_m3: electron density, m^-3; bmag: |B| in T; f: Hz. eta_he/eta_o:
    He+/O+ number-density fractions of n_e (protons carry the rest --
    the reference is protons-only, RayMain.jl:154, the default here).
    Reference: RayMain.jl:156-176 (written there with angular
    frequencies; this is the same expression in X = fpe^2/f^2,
    Y = fce/f ratio form)."""
    n_cm3 = ne_m3 * 1.0e-6
    f2 = f * f
    xe = FPE2_E * n_cm3 / f2
    ye = FCE_E * bmag / f
    # R = 1 - Xe/(1 - Ye) - sum_i Xi/(1 + Yi);
    # L = 1 - Xe/(1 + Ye) - sum_i Xi/(1 - Yi)
    r = 1.0 - xe / (1.0 - ye)
    l = 1.0 - xe / (1.0 + ye)
    p = 1.0 - xe
    for fpe2_i, fce_i in ion_species(eta_he, eta_o):
        xi = fpe2_i * n_cm3 / f2
        yi = fce_i * bmag / f
        r = r - xi / (1.0 + yi)
        l = l - xi / (1.0 - yi)
        p = p - xi
    return r, l, p


def mu2_signed(r, l, p, psi, root=1.0):
    """Signed mu^2 of the selected root at wave-normal angle psi.

    root=+1: whistler branch (B+F); root=-1: EMIC branch (B-F).
    Negative return value means the wave is evanescent there."""
    return mu2_signed_trig(r, l, p, jnp.sin(psi), jnp.cos(psi), root)


def mu2_signed_trig(r, l, p, sinpsi, cospsi, root=1.0):
    """mu2_signed taking (sin psi, cos psi) directly.

    The dispersion relation only ever needs the trig of psi, and both 2D
    (dip-angle) and 3D (B.rho) geometries produce sin/cos psi in closed
    form without inverse trig -- which keeps arctan/arccos out of the hot
    path entirely (also: Mosaic has no atan/acos lowering, so this is what
    makes the Pallas kernel possible)."""
    s = jnp.maximum(jnp.maximum(jnp.abs(r), jnp.abs(l)), jnp.abs(p))
    rn, ln, pn = r / s, l / s, p / s
    dn = 0.5 * (rn - ln)
    sn = 0.5 * (rn + ln)
    sin2 = sinpsi * sinpsi
    cos2 = cospsi * cospsi
    a = sn * sin2 + pn * cos2
    b = rn * ln * sin2 + pn * sn * (1.0 + cos2)
    c = pn * rn * ln
    rl_ps = rn * ln - pn * sn
    f2 = rl_ps * rl_ps * sin2 * sin2 + 4.0 * (pn * dn * cospsi) ** 2
    fdisc = jnp.sqrt(f2)
    # stable quadratic roots: direct form when it does not cancel, else
    # the product identity 2C/(B -+ F)   (mu2+ mu2- = C/A)
    direct = (b + root * fdisc) / (2.0 * a)
    product = 2.0 * c / (b - root * fdisc)
    mu2n = jnp.where(root * b >= 0.0, direct, product)
    return s * mu2n


def mu_from_mu2(mu2):
    """mu = sqrt(|mu^2|) -- the reference's abs() guard (RayMain.jl:213)."""
    return jnp.sqrt(jnp.abs(mu2))


# --- 2D geometry: wave-normal angle from vertical-referenced chi ---


def psi_lat(lat, chi):
    """psi = pi/2 + dip + chi, dip = atan(2 tan lat).

    Reference: RayTrace_lat.jl:47-50."""
    return jnp.pi / 2.0 + dipole.dip_angle_lat(lat) + chi


def psi_colat(theta, chi):
    """psi = pi/2 + dip + chi, dip = atan(2 cot theta).

    Reference: RayMain.jl:128-131."""
    return jnp.pi / 2.0 + dipole.dip_angle_colat(theta) + chi


def psi_trig_lat(lat, chi):
    """(sin psi, cos psi) for psi = pi/2 + dip + chi without inverse trig.

    dip = atan(2 tan lat) gives sin dip = 2 sin lat / q, cos dip =
    cos lat / q with q = sqrt(cos^2 lat + 4 sin^2 lat) = sqrt(1 + 3
    sin^2 lat); then sin psi = cos(dip + chi), cos psi = -sin(dip + chi)
    by angle addition. Identical values to sin/cos(psi_lat(...))."""
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    q = jnp.sqrt(1.0 + 3.0 * sl * sl)
    sindip = 2.0 * sl / q
    cosdip = cl / q
    sc, cc = jnp.sin(chi), jnp.cos(chi)
    sinpsi = cosdip * cc - sindip * sc
    cospsi = -(sindip * cc + cosdip * sc)
    return sinpsi, cospsi


# --- scalar refractive-index functions (vmap/grad targets) ---


def mu_2d_lat(r, lat, chi, f, env: medium.EnvParams, root=1.0):
    """Whistler phase refractive index at (r [RE], lat, chi, f [Hz]).

    The single pure function replacing phase_refractive_index
    (RayTrace_lat.jl:44-194). d(mu)/d(chi) of this function IS the
    reference's analytic dmu/dpsi (psi = pi/2 + dip + chi)."""
    sinpsi, cospsi = psi_trig_lat(lat, chi)
    ne = medium.ne_total_m3(r, lat, env)
    b = medium.b_mag(r, lat, env)
    rr, ll, pp = stix_rlp(ne, b, f, env.eta_he, env.eta_o)
    return mu_from_mu2(mu2_signed_trig(rr, ll, pp, sinpsi, cospsi, root))


def mu_2d_colat(r, theta, chi, f, env: medium.EnvParams, root=1.0):
    """Colatitude-frame variant (RayMain.jl:125-264).

    dip = atan(2 cot theta) == atan(2 tan lat) at lat = pi/2 - theta, so
    the latitude trig path is exact here too."""
    lat = jnp.pi / 2.0 - theta
    return mu_2d_lat(r, lat, chi, f, env, root)


def psi_3d(r, theta, phi, rho_r, rho_t, rho_p, env: medium.EnvParams):
    """Wave-normal angle from the refractive-index vector rho and B.

    cos psi = (B . rho)/(|B||rho|); reference: RayTrace_3D.jl:136-141.
    Diagnostics only -- the compute path uses psi_trig_3d."""
    return jnp.arccos(psi_trig_3d(r, theta, phi, rho_r, rho_t, rho_p, env)[1])


def psi_trig_3d(r, theta, phi, rho_r, rho_t, rho_p, env: medium.EnvParams):
    """(sin psi, cos psi) from B and rho without arccos.

    psi in [0, pi] so sin psi >= 0 (computed from |B x rho|, see
    _psi_trig_bmag_3d). Dispatches on env.b_model (centered or tilted
    dipole)."""
    sinpsi, cospsi, _ = _psi_trig_bmag_3d(
        r, theta, phi, rho_r, rho_t, rho_p, env
    )
    return sinpsi, cospsi


def _psi_trig_bmag_3d(r, theta, phi, rho_r, rho_t, rho_p,
                      env: medium.EnvParams):
    """(sin psi, cos psi, |B|) from one field evaluation.

    sin psi comes from the CROSS product |B x rho|/(|B||rho|), not
    sqrt(1 - cos^2): at field-aligned propagation (psi -> 0 or pi, the
    natural whistler state) 1 - cos^2 cancels to the float32 rounding
    floor and both the value and anything autodiff chains through it go
    wrong (measured: 65% of a 3D fan falsely wedge-retired,
    benchmarks/perf_r03j.py); the cross form is ~eps-accurate there."""
    br, bt, bp = medium.b_vec(r, theta, phi, env)
    bmag = jnp.sqrt(br * br + bt * bt + bp * bp)
    rmag = jnp.sqrt(rho_r * rho_r + rho_t * rho_t + rho_p * rho_p)
    inv_brm = 1.0 / (bmag * rmag)
    cospsi = jnp.clip(
        (br * rho_r + bt * rho_t + bp * rho_p) * inv_brm, -1.0, 1.0
    )
    c_r = bt * rho_p - bp * rho_t
    c_t = bp * rho_r - br * rho_p
    c_p = br * rho_t - bt * rho_r
    sinpsi = jnp.sqrt(c_r * c_r + c_t * c_t + c_p * c_p) * inv_brm
    return sinpsi, cospsi, bmag


def consistent_rho_3d(r, theta, phi, khat, f, env: medium.EnvParams, root=1.0):
    """Initial refractive-index vector ON the dispersion surface.

    rho0 = mu(psi(khat)) * khat for a unit wave-normal direction khat.
    The reference launches with rho0 = (1, 1, 0) (RayTrace_3D.jl:390-391),
    whose magnitude sqrt(2) is ~100x off the local mu -- an off-shell state
    the Haselgrove system never corrects, which is what drives its group
    delay negative (docs/NOTE_3D_GROUP_DELAY.md). This helper builds the
    physical launch."""
    kr, kt, kp = khat
    n = jnp.sqrt(kr * kr + kt * kt + kp * kp)
    kr, kt, kp = kr / n, kt / n, kp / n
    mu = mu_3d(r, theta, phi, kr, kt, kp, f, env, root)
    return mu * kr, mu * kt, mu * kp


def mu_3d(r, theta, phi, rho_r, rho_t, rho_p, f, env: medium.EnvParams, root=1.0):
    """3D whistler refractive index (reference: RayTrace_3D.jl:93-219).

    jax.grad of this w.r.t. (rho_r, rho_t, rho_p) replaces the reference's
    analytic Kimura-1966 dmu/drho_k chain (RayTrace_3D.jl:261-311), and
    w.r.t. (r, theta, phi) replaces its finite differences.

    Field model dispatches on env.b_model: the tilted dipole breaks
    meridional symmetry (d mu/d phi != 0) and organizes the density by
    the tilted-frame magnetic latitude. An MLT-resolved plasmasphere
    (env.ps_mlt, medium.mlt_ps_params) breaks it through the DENSITY:
    longitude maps to local time, so rays see the dusk plume / day-night
    trough -- d mu/d phi != 0 even for the centered dipole. When both
    compose (ps_mlt + tilted/IGRF), the MLT axis is the MAGNETIC
    longitude (medium.mlon_3d -- the plasmasphere rides the field), so
    the density's local-time structure stays anchored to the tilted
    frame; for the centered dipole mlon_3d is phi exactly."""
    sinpsi, cospsi, b = _psi_trig_bmag_3d(
        r, theta, phi, rho_r, rho_t, rho_p, env
    )
    lat = medium.mlat_3d(r, theta, phi, env)
    ne = medium.ne_total_m3(r, lat, env, phi=medium.mlon_3d(r, theta, phi, env))
    rr, ll, pp = stix_rlp(ne, b, f, env.eta_he, env.eta_o)
    return mu_from_mu2(mu2_signed_trig(rr, ll, pp, sinpsi, cospsi, root))
