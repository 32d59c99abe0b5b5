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
    gcpm_bpow, smoothly joined to the CA1992 trough at Lppo."""
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
    )


# fields that gate code paths at trace time -- keep python floats (or
# strings) when casting an EnvParams to device values
STATIC_FIELDS = ("ps_weight", "de_weight", "ps_smooth", "iono_mix",
                 "ps_model", "b_model", "duct_amp", "igrf_coeffs",
                 "eta_he", "eta_o", "ps_refill", "ps_refill_q",
                 "ps_refill_lref")


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


def ne_total_m3(r, lat, env: EnvParams):
    """Total electron density in m^-3 at (r [RE], lat [rad]).

    ne = (ne_iono(r) + w_ps * DE?(ne_plasma(L))) * 1e6
    Reference composition: RayTrace_lat.jl:70-83; DE variant
    plasmasphere.jl:171."""
    ne_i = ionosphere.ne_iono_cm3(r, env.iono_n0, env.iono_decay, env.iono_r0)
    if not (isinstance(env.iono_mix, float) and env.iono_mix == 1.0):
        ne_i = env.iono_mix * ne_i + (1.0 - env.iono_mix) * (
            ionosphere.ne_iono_cm3(r, env.iono_n0_b, env.iono_decay_b,
                                   env.iono_r0)
        )
    L = dipole.l_shell(r, lat)
    if env.ps_model == "gcpm":
        ne_p = plasmasphere.ne_gcpm_cm3(
            L, lat, env.lppo, env.ps_trough, env.gcpm_ne0, env.gcpm_lscale,
            env.gcpm_bpow, env.gcpm_knee,
        )
    else:
        ne_p = plasmasphere.ne_plasma_cm3(
            L, env.lppi, env.lppo, env.ne_lppi, env.ps_season, env.ps_trough,
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
