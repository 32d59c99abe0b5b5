"""Composite propagation medium: dipole B-field + electron density.

The medium is a pure function of position closed over a small NamedTuple of
scalars (`EnvParams`) -- a jittable pytree, so one compiled trace serves any
parameter set. This replaces the reference's copy-pasted module globals
(RayMain.jl:110-116, RayTrace_lat.jl:26-41, plasmasphere.jl:42-46) and
eliminates its global-closure hazards (e.g. the `t`-for-`mlt` leak at
plasmasphere.jl:90).

Quasi-neutral 2-species plasma: n_p = n_e (reference: RayMain.jl:154).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import B0_2D, B0_3D
from . import dipole, ionosphere, plasmasphere


class EnvParams(NamedTuple):
    """All-scalar medium parameters (jittable pytree leaf set)."""

    b0: jnp.float64 | float          # equatorial surface field, T
    iono_n0: float                   # ionosphere fit amplitude, cm^-3
    iono_decay: float                # ionosphere fit decay, 1/RE
    iono_r0: float                   # ionosphere fit offset, RE
    ps_weight: float                 # 1.0 = plasmasphere on, 0.0 = off
    lppi: float                      # plasmapause inner limit, L
    lppo: float                      # plasmapause outer limit, L
    ne_lppi: float                   # branch-1 density at Lppi, cm^-3
    ps_season: float                 # CA1992 seasonal/solar coefficient
    ps_trough: float                 # 5800 + 300 mlt
    de_weight: float                 # 1.0 = diffusive-equilibrium correction
    ps_smooth: float = 0.0           # >0: sigmoid-blend width at Lppi/Lppo
    # day/night ionosphere mixture (the MLT interpolation the reference
    # planned at plasmasphere.jl:110-113): ne_iono = iono_mix * fit_a +
    # (1 - iono_mix) * fit_b, with fit_b = (iono_n0_b, iono_decay_b,
    # iono_r0). iono_mix == 1.0 (default) is the pure single-fit medium.
    iono_n0_b: float = 0.0           # nightside fit amplitude, cm^-3
    iono_decay_b: float = 0.0        # nightside fit decay, 1/RE
    iono_mix: float = 1.0            # dayside weight in [0, 1]; STATIC
    # plasmasphere model selector (STATIC string; gates code paths):
    # "ca1992" (reference 3-branch piecewise) | "gcpm" (the simplified
    # GCPM the reference planned, RayMain.jl:99-101 -- see
    # plasmasphere.ne_gcpm_cm3)
    ps_model: str = "ca1992"
    gcpm_ne0: float = 0.0            # equatorial density at L = 2, cm^-3
    gcpm_lscale: float = 0.0         # e-folding scale in L
    gcpm_bpow: float = 0.0           # mirror-ratio (field-aligned) exponent
    gcpm_knee: float = 0.0           # plasmapause blend width in L; STATIC-
                                     # free (plain traced scalar)
    # magnetic-field model selector (STATIC string): "dipole" (centered
    # axial) | "tilted" (moment tilted b_tilt rad toward longitude
    # b_tilt_phi -- 3D frame only, models/dipole.b_vec_tilted) | "igrf"
    # (degree-3 IGRF truncation, models/dipole.b_vec_igrf -- 3D only;
    # igrf_coeffs holds the 15 Schmidt coefficients, b_tilt/b_tilt_phi
    # are derived from its degree-1 part to organize the density models)
    b_model: str = "dipole"
    b_tilt: float = 0.0              # moment tilt, rad (Earth ~ 0.2007)
    b_tilt_phi: float = 0.0          # tilt azimuth, rad
    # field-aligned density duct (plasmasphere.duct_factor): Gaussian
    # crest (duct_amp > 0) / trough (< 0) across L, centered at duct_l0
    # with width duct_w. duct_amp is STATIC: a python-float 0.0 compiles
    # the duct away entirely (the headline duct-free medium pays nothing).
    duct_amp: float = 0.0
    duct_l0: float = 0.0             # duct center, L
    duct_w: float = 0.0              # duct Gaussian width, L
    igrf_coeffs: tuple = ()          # STATIC: 15 Schmidt coefficients (nT)
                                     # for b_model="igrf" (dipole.IGRF13_2020)
    # multi-ion composition (extension; the reference is protons-only,
    # RayMain.jl:154): He+/O+ number-density fractions of n_e under
    # quasi-neutrality, protons carrying the rest. STATIC gates:
    # python-float 0.0 compiles the species away (exact reference algebra
    # and zero extra cost by default).
    eta_he: float = 0.0
    eta_o: float = 0.0
    # density-level trough refilling (STATIC, CA1992 only): 0 = eroded
    # trough (reference-exact), 1 = refilled to the saturated profile;
    # see plasmasphere.ne_plasma_cm3
    ps_refill: float = 0.0
    # L-dependent refill timescale exponent (STATIC): tau(L) ~ L^q, so
    # ps_refill is the weight at L = ps_refill_lref and each shell
    # refills on its own clock (plasmasphere.refill_weight; q ~ 4 is the
    # flux-tube-volume scaling -- days at high L, hours low). 0 = the
    # global per-epoch weight.
    ps_refill_q: float = 0.0
    ps_refill_lref: float = 4.0
    # MLT-resolved (non-axisymmetric) plasmasphere for the 3D frame
    # (STATIC gate ps_mlt; CA1992 + centered dipole only). The reference
    # freezes MLT as a scalar even in its 3D trace (RayTrace_3D.jl:114);
    # here longitude phi maps to local time (mlt = mlt0 + phi * 12/pi)
    # and modulates:
    #   - the plasmapause: lppi(phi) = lppi * S(a0 + phi), S the smooth
    #     low-order Fourier shape of the DERIVED last-closed-
    #     equipotential teardrop (convection.mlt_shape_fourier) with
    #     S(a0) == 1, so the phi = 0 meridian is the axisymmetric
    #     medium exactly; ne_lppi and lppo follow by branch-1/branch-2
    #     continuity (see mlt_ps_params);
    #   - the trough level: trough(phi) = ps_trough
    #     + tamp * (cos(pi mlt0/12) - cos(pi mlt/12)) -- the smooth
    #     periodic extension of the reference's frozen 5800 + 300 mlt
    #     term, exact at phi = 0, full day-night swing 2 * tamp.
    ps_mlt: float = 0.0              # STATIC: 0 = axisymmetric (exact ref)
    ps_mlt_a0: float = 0.0           # base angle (mlt0-12) pi/12, rad
    ps_mlt_c: tuple = ()             # Fourier shape coeffs (c0, c1, s1,...)
    ps_mlt_tamp: float = 0.0         # trough day-night half-amplitude
    ps_mlt_c3: float = 0.0           # log10 trough density at the base
                                     # knee: g1(lppi) - 10 (lppo - lppi)


def make_env(
    b0=B0_3D,
    iono_fit=ionosphere.TRACED_FIT,
    plasmasphere_on=True,
    kp_max=3.0,
    day=0.0,
    rbar=90.0,
    mlt=2.0,
    de_correction=False,
    ps_smooth=0.0,
    iono_mlt=False,
    ps_model="ca1992",
    gcpm_bpow=1.0,
    gcpm_knee=plasmasphere.GCPM_KNEE,
    b_model="dipole",
    b_tilt=0.0,
    b_tilt_phi=0.0,
    igrf_coeffs=None,
    duct_amp=0.0,
    duct_l0=3.0,
    duct_w=0.1,
    eta_he=0.0,
    eta_o=0.0,
    ps_refill=0.0,
    ps_refill_q=0.0,
    ps_refill_lref=4.0,
    ps_mlt=False,
    ps_mlt_harmonics=3,
    ps_mlt_tamp=1800.0,
):
    """Build EnvParams; runs the host-side plasmapause pre-solve.

    Defaults reproduce the canonical reference run (plasmasphere.jl:42-46):
    Kp_max=3 (Lppi=4.22), d=0, Rbar=90, mlt=2.

    iono_mlt=True enables the day/night ionosphere interpolation the
    reference planned but never built (plasmasphere.jl:110-113): the
    IRI dayside and nightside fits blended by the smooth MLT weight of
    `mlt` (the same MLT that already feeds the CA1992 trough term).

    ps_model="gcpm" selects the simplified-GCPM plasmasphere the
    reference planned (RayMain.jl:99-101; plasmasphere.ne_gcpm_cm3):
    exponential decay in L times the dipole mirror ratio to the power
    gcpm_bpow, smoothly joined to the CA1992 trough at Lppo.

    ps_mlt=True makes the plasmasphere MLT-RESOLVED for the 3D frame
    (see the EnvParams field comments): the plasmapause follows the
    drift-derived teardrop (dusk plume) via a ps_mlt_harmonics-harmonic
    Fourier shape anchored at this env's mlt, and the trough level gets
    the smooth periodic day-night modulation (half-amplitude
    ps_mlt_tamp cm^-3 L^4.5; the reference's 300/h slope over a 12 h
    swing is 1800). The 2D frames trace the phi = 0 meridian, which is
    this medium's axisymmetric limit. With ps_model="gcpm" the same
    teardrop scales the GCPM knee center and the same day-night term
    modulates its trough (mlt_gcpm_params) -- the C-infinity knee
    moves with local time without creating branch seams.

    ps_mlt composes with b_model="tilted"/"igrf": the MLT axis is then
    the MAGNETIC longitude (mlon_3d/dipole.mlon_tilted -- the
    plasmasphere corotates organized by the field, so its local-time
    structure is anchored to the tilted frame, exactly as its latitude
    structure already is via mlat_3d). Convention: env `mlt` is the
    local time of the phi_m = 0 magnetic meridian; tilt -> 0 recovers
    the centered-dipole geographic-phi mapping up to rounding (the
    b_model="dipole" branch of mlon_3d is phi itself, bitwise)."""
    lppi = plasmasphere.lppi_from_kp(kp_max)
    lppo, ne_lppi = plasmasphere.initialize_plasmasphere(lppi, day, rbar, mlt)
    if iono_mlt:
        day_fit = ionosphere.IRI_DAYSIDE_FIT
        night_fit = ionosphere.IRI_NIGHTSIDE_FIT
        iono_kw = dict(
            iono_n0=day_fit[0], iono_decay=day_fit[1], iono_r0=day_fit[2],
            iono_n0_b=night_fit[0], iono_decay_b=night_fit[1],
            iono_mix=float(ionosphere.day_weight(mlt)),
        )
    else:
        iono_kw = dict(
            iono_n0=iono_fit[0], iono_decay=iono_fit[1], iono_r0=iono_fit[2],
        )
    if ps_model not in ("ca1992", "gcpm"):
        raise ValueError(f"unknown ps_model {ps_model!r}")
    if duct_amp != 0.0:
        if not plasmasphere_on:
            raise ValueError("a density duct needs the plasmasphere on")
        if not duct_w > 0.0:
            raise ValueError("duct_w must be > 0 when duct_amp != 0")
        if duct_amp <= -1.0:
            raise ValueError("duct_amp <= -1 makes the density negative")
    if eta_he < 0.0 or eta_o < 0.0 or eta_he + eta_o >= 1.0:
        raise ValueError(
            "ion fractions must satisfy 0 <= eta_he, eta_o and "
            "eta_he + eta_o < 1 (protons carry the rest)"
        )
    if not 0.0 <= ps_refill <= 1.0:
        raise ValueError("ps_refill must lie in [0, 1]")
    if ps_refill != 0.0 and ps_model != "ca1992":
        raise ValueError("ps_refill blends the CA1992 trough only")
    if ps_refill_q < 0.0 or ps_refill_lref <= 0.0:
        raise ValueError(
            "ps_refill_q must be >= 0 and ps_refill_lref > 0"
        )
    if b_model not in ("dipole", "tilted", "igrf"):
        raise ValueError(f"unknown b_model {b_model!r}")
    mlt_kw = {}
    if ps_mlt:
        if not plasmasphere_on:
            raise ValueError(
                "ps_mlt modulates the plasmapause; it needs "
                "plasmasphere_on=True"
            )
        # tilted/IGRF compose: the MLT axis is the magnetic longitude
        # (mlon_3d), so no geographic-vs-magnetic ambiguity remains --
        # see the docstring convention note
        from .. import convection

        a0, coeffs = convection.mlt_shape_fourier(
            kp_max, mlt, n_harm=int(ps_mlt_harmonics)
        )
        if ps_model == "ca1992":
            # base-knee trough log-density: the branch-2/branch-3
            # crossing condition log10 ne3(lppo) = g1(lppi) -
            # (lppo - lppi)/0.1, with (lppi, lppo) from the host
            # pre-solve -- defining lppo(phi) from this frozen constant
            # keeps lppo(0) == lppo EXACTLY
            g1_lppi = float(plasmasphere._branch1_log10(
                float(lppi), plasmasphere.season_coeff(day, rbar)))
            c3 = float(g1_lppi - 10.0 * (lppo - lppi))
        else:
            # GCPM: the knee is scaled directly (mlt_gcpm_params), no
            # branch-continuity constant exists
            c3 = 0.0
        mlt_kw = dict(
            ps_mlt=1.0,
            ps_mlt_a0=float(a0),
            ps_mlt_c=coeffs,
            ps_mlt_tamp=float(ps_mlt_tamp),
            ps_mlt_c3=c3,
        )
    if b_model == "tilted":
        b_kw = dict(b_model="tilted", b_tilt=float(b_tilt),
                    b_tilt_phi=float(b_tilt_phi))
    elif b_model == "igrf":
        coeffs = tuple(
            float(c) for c in
            (dipole.IGRF13_2020 if igrf_coeffs is None else igrf_coeffs)
        )
        if len(coeffs) != 15:
            raise ValueError("igrf_coeffs must hold 15 Schmidt coefficients")
        # the degree-1 part IS a tilted centered dipole: use it for b0 and
        # the magnetic-latitude organization of the density models
        b0_igrf, tilt, phi0 = dipole.igrf_dipole(coeffs)
        b0 = b0_igrf
        b_kw = dict(b_model="igrf", b_tilt=tilt, b_tilt_phi=phi0,
                    igrf_coeffs=coeffs)
    else:
        b_kw = {}
    gcpm_kw = (
        dict(
            ps_model="gcpm",
            gcpm_ne0=plasmasphere.GCPM_NE0,
            gcpm_lscale=plasmasphere.GCPM_LSCALE,
            gcpm_bpow=float(gcpm_bpow),
            gcpm_knee=float(gcpm_knee),
        )
        if ps_model == "gcpm"
        else {}
    )
    return EnvParams(
        b0=b0,
        ps_weight=1.0 if plasmasphere_on else 0.0,
        lppi=lppi,
        lppo=lppo,
        ne_lppi=ne_lppi,
        ps_season=plasmasphere.season_coeff(day, rbar),
        ps_trough=5800.0 + 300.0 * mlt,
        de_weight=1.0 if de_correction else 0.0,
        ps_smooth=ps_smooth,
        **iono_kw,
        **gcpm_kw,
        **b_kw,
        duct_amp=float(duct_amp),
        duct_l0=float(duct_l0),
        duct_w=float(duct_w),
        eta_he=float(eta_he),
        eta_o=float(eta_o),
        ps_refill=float(ps_refill),
        ps_refill_q=float(ps_refill_q),
        ps_refill_lref=float(ps_refill_lref),
        **mlt_kw,
    )


# fields that gate code paths at trace time -- keep python floats (or
# strings) when casting an EnvParams to device values
STATIC_FIELDS = ("ps_weight", "de_weight", "ps_smooth", "iono_mix",
                 "ps_model", "b_model", "duct_amp", "igrf_coeffs",
                 "eta_he", "eta_o", "ps_refill", "ps_refill_q",
                 "ps_refill_lref", "ps_mlt")


def cast_env(env: EnvParams, dtype):
    """EnvParams with continuous scalars as dtype device values and the
    structural flags left static (see run.py for why)."""
    import jax.numpy as jnp_

    return env._replace(**{
        name: jnp_.asarray(getattr(env, name), dtype)
        for name in env._fields if name not in STATIC_FIELDS
    })


def make_env_raymain():
    """Medium of RayMain.jl: legacy B0, ionosphere only (RayMain.jl:150-154)."""
    return make_env(b0=B0_2D, plasmasphere_on=False)


def make_env_lat():
    """Medium of RayTrace_lat.jl: legacy B0, ionosphere + CA1992."""
    return make_env(b0=B0_2D, plasmasphere_on=True)


def mlt_on(env: EnvParams):
    """Static gate check for the MLT-resolved plasmasphere."""
    return not (isinstance(env.ps_mlt, float) and env.ps_mlt == 0.0)


def _mlt_shape(phi, env: EnvParams):
    """The shared local-time structure of every MLT-resolved medium:
    the Fourier plasmapause teardrop S(ang) with its phi-slope, and the
    day-night trough modulation with its phi-slope. Single source for
    mlt_ps_params (CA1992) and mlt_gcpm_params (GCPM) -- the two
    plasmasphere models must never diverge in MLT structure (the C++
    oracle mirrors this pair at native/src/oracle.cpp mlt_shape_at).

    Harmonics by angle recursion: one sin + one cos total, regardless
    of harmonic count. Returns (shape, dshape, trough_e, dtrough)."""
    c = env.ps_mlt_c
    n_harm = (len(c) - 1) // 2
    ang = env.ps_mlt_a0 + phi
    s1a, c1a = jnp.sin(ang), jnp.cos(ang)
    sk, ck = s1a, c1a
    shape = c[0]
    dshape = jnp.zeros_like(s1a)
    for k in range(1, n_harm + 1):
        if k > 1:
            sk, ck = sk * c1a + ck * s1a, ck * c1a - sk * s1a
        shape = shape + c[2 * k - 1] * ck + c[2 * k] * sk
        dshape = dshape + k * (c[2 * k] * ck - c[2 * k - 1] * sk)
    trough_e = env.ps_trough + env.ps_mlt_tamp * (
        c1a - jnp.cos(env.ps_mlt_a0)
    )
    dtrough = -env.ps_mlt_tamp * s1a
    return shape, dshape, trough_e, dtrough


def mlt_ps_params(phi, env: EnvParams, with_grads=False):
    """Effective CA1992 parameters (lppi, lppo, ne_lppi, trough_c) at
    longitude phi for an MLT-resolved medium (make_env(ps_mlt=True)).

    Chain (see the EnvParams field comments; everything smooth in phi):
      ang      = ps_mlt_a0 + phi          (eastward-from-noon MLT angle)
      lppi(phi) = lppi * S(ang)           (derived-LCE Fourier shape,
                                           S(a0) == 1 -- exact at phi=0)
      ne_lppi(phi) = 10^g1(lppi(phi))     (branch-1 continuity at the
                                           inner knee, like the host
                                           pre-solve does at phi=0)
      lppo(phi) = lppi(phi)
                  + 0.1 (g1(lppi(phi)) - ps_mlt_c3)
                                          (branch-2/3 crossing with the
                                           trough log-density frozen at
                                           its base value -- exact at
                                           phi=0 by construction of c3)
      trough(phi) = ps_trough + tamp (cos ang - cos a0)
                                          (cos(pi mlt/12) = -cos(ang),
                                           so the day-night modulation
                                           reuses the shape's cos)

    The harmonics are evaluated by angle recursion: one sin + one cos
    total, regardless of harmonic count. with_grads=True additionally
    returns (dlppi, dlppo, dg1i, dtrough)/dphi for the fused chain,
    where dg1i is d g1(lppi(phi))/dphi (the branch-1 log10 slope times
    dlppi)."""
    shape, dshape, trough_e, dtrough = _mlt_shape(phi, env)
    lppi_e = env.lppi * shape
    dlppi = env.lppi * dshape
    e_i = jnp.exp((2.0 - lppi_e) / 1.5)
    g1i = (-0.3145 * lppi_e + 3.9043) + env.ps_season * e_i
    dg1i = (-0.3145 - env.ps_season * e_i / 1.5) * dlppi
    ne_lppi_e = jnp.exp(plasmasphere.LN10 * g1i)
    lppo_e = lppi_e + 0.1 * (g1i - env.ps_mlt_c3)
    dlppo = dlppi + 0.1 * dg1i
    params = (lppi_e, lppo_e, ne_lppi_e, trough_e)
    if with_grads:
        return params, (dlppi, dlppo, dg1i, dtrough)
    return params


def mlt_gcpm_params(phi, env: EnvParams, with_grads=False):
    """Effective GCPM parameters (lppo, trough_c) at longitude phi for
    an MLT-resolved medium (make_env(ps_mlt=True, ps_model="gcpm")).

    The simplified-GCPM plasmasphere has exactly two MLT-sensitive
    parameters: the knee position (the log-sigmoid blend center, lppo)
    and the CA1992-trough level it joins to. Both take the SAME
    local-time structure as the CA1992 chain (mlt_ps_params): the knee
    rides the derived-LCE Fourier teardrop, lppo(phi) = lppo * S(ang)
    with S(a0) == 1 (base value exact at phi = 0), and the trough gets
    the smooth day-night modulation. No continuity constants are needed
    -- the GCPM knee is a C-infinity log-sigmoid blend, so scaling its
    center moves the dusk plume without creating seams (and, unlike
    CA1992's hard branches, without any kink surface for trajectories
    to ride -- native-oracle trajectory parity is tight here,
    tests/test_mlt3d.py)."""
    shape, dshape, trough_e, dtrough = _mlt_shape(phi, env)
    lppo_e = env.lppo * shape
    if with_grads:
        return (lppo_e, trough_e), (env.lppo * dshape, dtrough)
    return lppo_e, trough_e


def ne_total_m3(r, lat, env: EnvParams, phi=None):
    """Total electron density in m^-3 at (r [RE], lat [rad]).

    ne = (ne_iono(r) + w_ps * DE?(ne_plasma(L))) * 1e6
    Reference composition: RayTrace_lat.jl:70-83; DE variant
    plasmasphere.jl:171.

    phi: longitude (rad) for the MLT-resolved plasmasphere -- required
    by the 3D frame when env.ps_mlt is on, ignored otherwise (the 2D
    frames trace the phi = 0 meridian, where the MLT medium reduces to
    the axisymmetric parameters exactly)."""
    ne_i = ionosphere.ne_iono_cm3(r, env.iono_n0, env.iono_decay, env.iono_r0)
    if not (isinstance(env.iono_mix, float) and env.iono_mix == 1.0):
        ne_i = env.iono_mix * ne_i + (1.0 - env.iono_mix) * (
            ionosphere.ne_iono_cm3(r, env.iono_n0_b, env.iono_decay_b,
                                   env.iono_r0)
        )
    L = dipole.l_shell(r, lat)
    if env.ps_model == "gcpm":
        if mlt_on(env) and phi is not None:
            lppo_e, trough_e = mlt_gcpm_params(phi, env)
        else:
            lppo_e, trough_e = env.lppo, env.ps_trough
        ne_p = plasmasphere.ne_gcpm_cm3(
            L, lat, lppo_e, trough_e, env.gcpm_ne0, env.gcpm_lscale,
            env.gcpm_bpow, env.gcpm_knee,
        )
    else:
        if mlt_on(env) and phi is not None:
            lppi_e, lppo_e, ne_lppi_e, trough_e = mlt_ps_params(phi, env)
        else:
            lppi_e, lppo_e = env.lppi, env.lppo
            ne_lppi_e, trough_e = env.ne_lppi, env.ps_trough
        ne_p = plasmasphere.ne_plasma_cm3(
            L, lppi_e, lppo_e, ne_lppi_e, env.ps_season, trough_e,
            env.ps_smooth, env.ps_refill, env.ps_refill_q,
            env.ps_refill_lref,
        )
    if not (isinstance(env.duct_amp, float) and env.duct_amp == 0.0):
        ne_p = ne_p * plasmasphere.duct_factor(
            L, env.duct_amp, env.duct_l0, env.duct_w
        )
    de = plasmasphere.diffusive_equilibrium_factor(r)
    ne_p = ne_p * (env.de_weight * de + (1.0 - env.de_weight))
    return (ne_i + env.ps_weight * ne_p) * 1.0e6


def b_mag(r, lat, env: EnvParams):
    """Dipole field magnitude at (r [RE], lat [rad]) in Tesla.

    2D (meridional) entry point: a tilted field has no meridional
    symmetry, so it is refused here -- use the 3D frame (b_vec)."""
    if env.b_model != "dipole":
        raise ValueError(
            "the 2D frames assume the centered axial dipole; "
            f"b_model={env.b_model!r} is 3D-only"
        )
    return dipole.b_mag_lat(r, lat, env.b0)


def b_vec(r, theta, phi, env: EnvParams):
    """Vector field (B_r, B_theta, B_phi) at geographic (r, theta, phi),
    dispatching on the static b_model selector."""
    if env.b_model == "tilted":
        return dipole.b_vec_tilted(
            r, theta, phi, env.b0, env.b_tilt, env.b_tilt_phi
        )
    if env.b_model == "igrf":
        return dipole.b_vec_igrf(r, theta, phi, env.igrf_coeffs)
    return dipole.b_vec_colat(r, theta, phi, env.b0)


def mlat_3d(r, theta, phi, env: EnvParams):
    """Magnetic latitude at geographic (r, theta, phi) -- organizes the
    density models in the 3D frame (lat = pi/2 - theta for the centered
    dipole; the tilted-frame latitude otherwise -- for "igrf" the tilt of
    its degree-1 part, set by make_env)."""
    if env.b_model in ("tilted", "igrf"):
        s = dipole.mlat_sin_tilted(theta, phi, env.b_tilt, env.b_tilt_phi)
        return jnp.arcsin(jnp.clip(s, -1.0, 1.0))
    return jnp.pi / 2.0 - theta


def mlon_3d(r, theta, phi, env: EnvParams):
    """Magnetic longitude at geographic (r, theta, phi) -- organizes the
    MLT axis of the density models in the 3D frame, the longitude
    counterpart of mlat_3d. Identity (phi) for the centered dipole; the
    tilted-frame azimuth (dipole.mlon_tilted, whose tilt -> 0 limit is
    also phi exactly) for tilted/IGRF. The plasmasphere rides the FIELD,
    so its local-time structure (dusk plume, day-night trough) is a
    function of magnetic, not geographic, longitude."""
    if env.b_model in ("tilted", "igrf"):
        return dipole.mlon_tilted(theta, phi, env.b_tilt, env.b_tilt_phi)
    return phi
