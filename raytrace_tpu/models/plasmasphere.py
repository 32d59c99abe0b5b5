"""Carpenter & Anderson 1992 plasmasphere density model with plasmapause.

Three-branch piecewise model in L-shell (reference: plasmasphere.jl:73-94,
RayTrace_lat.jl:72-81):
  (i)   L <= Lppi:        log10 ne = (-0.3145 L + 3.9043) + a_season exp((2-L)/1.5)
  (ii)  Lppi < L <= Lppo: ne = ne(Lppi) * 10^((Lppi - L)/0.1)
  (iii) L > Lppo:         ne = (5800 + 300 mlt) L^-4.5 + (1 - exp((2-L)/10))
where a_season = 0.15 (cos(2 pi (d+9)/365) - 0.5 cos(4 pi (d+9)/365))
                 + 0.00127 Rbar - 0.0635.

The plasmapause outer limit Lppo is found by a host-side pre-solve that scans
L over r in [RE, 10 RE] at 1 km resolution and takes the crossing of branches
(ii) and (iii) (reference: plasmasphere.jl:48-71, RayTrace_lat.jl:21-41).
Lppi = 5.6 - 0.46 Kp_max (plasmasphere.jl:43).

On device the piecewise selection is branchless: all three branches are
computed and combined with jnp.where (TPU-friendly; no control flow in the
hot loop).

Note: RayTrace_3D.jl:109 places the /365 outside the cosine arguments of the
seasonal term -- a divergence from RayTrace_lat.jl:73 and plasmasphere.jl:85.
We implement the corrected (inside-the-cosine) form everywhere.

The diffusive-equilibrium correction (plasmasphere.jl:96-106, Balan et al
1996) is available and composed the way plasmasphere.jl:171 composes it:
ne_total = DE(r, ne_plasma(L)) + ne_iono(r).
"""

import math

import jax.numpy as jnp
import numpy as np

from ..constants import RE

# DE-model constants (reference: plasmasphere.jl:99-103)
DE_TEMP_K = 2500.0
DE_RBASE_M = 7.37e6
# S = 1.506 T (rb[m]/7370)^2 / 4^(i-1) with i=1 (single ion species)
DE_S = 1.506 * DE_TEMP_K * (DE_RBASE_M / 7370.0) ** 2


def season_coeff(day, rbar):
    """Seasonal/solar coefficient of CA1992 branch (i). Host-side scalar."""
    return (
        0.15
        * (
            math.cos(2.0 * math.pi * (day + 9.0) / 365.0)
            - 0.5 * math.cos(4.0 * math.pi * (day + 9.0) / 365.0)
        )
        + 0.00127 * rbar
        - 0.0635
    )


def lppi_from_kp(kp_max):
    """Plasmapause inner limit. Reference: plasmasphere.jl:43."""
    return 5.6 - 0.46 * kp_max


def _branch1_log10(L, a_season):
    return (-0.3145 * L + 3.9043) + a_season * np.exp((2.0 - L) / 1.5)


def initialize_plasmasphere(lppi, day, rbar, mlt):
    """Host-side pre-solve for (Lppo, ne_Lppi). Reference: plasmasphere.jl:48-71.

    Scans L = r/RE for r in [RE, 10 RE] at 1 km steps (equatorial, lat=0) and
    returns the L where branches (ii) and (iii) are closest, plus the branch
    (i) density evaluated at Lppi. Pure NumPy float64 -- runs once per run.
    """
    a = season_coeff(day, rbar)
    ne_lppi = 10.0 ** _branch1_log10(np.float64(lppi), a)
    r = np.arange(RE, 10.0 * RE + 1.0, 1000.0, dtype=np.float64)
    L = r / RE
    ne2 = ne_lppi * 10.0 ** (-(L - lppi) / 0.1)
    ne3 = (5800.0 + 300.0 * mlt) * L ** (-4.5) + (1.0 - np.exp((2.0 - L) / 10.0))
    lppo = L[int(np.argmin(np.abs(ne2 - ne3)))]
    return float(lppo), float(ne_lppi)


LN10 = 2.302585092994046


def refill_weight(L, w0, q, lref=4.0):
    """Per-L trough refill weight from the epoch weight w0 at L = lref.

    Refilling from the ionosphere is NOT uniform in L: the flux-tube
    volume grows ~ L^4 while the ionospheric source is fixed, so the
    refill timescale is hours at low L and days at high L (Denton et al.
    2012-class rates). Model: tau(L) = tau_ref (L/lref)^q. An epoch
    weight w0 = 1 - exp(-t/tau_ref) (what storm.refill_history produces
    at the reference shell) then maps to

        w(L) = 1 - (1 - w0)^((lref/L)^q)

    -- the same elapsed quiet time t applied to each shell's own
    timescale. q = 0 recovers the global (L-independent) weight; the
    function is exactly w0 at L = lref, monotonically decreasing in L for
    q > 0, -> 1 as L -> 0 and -> 0 as L -> inf (an infinite flux tube
    never refills). Written in exp/log form (Pallas-lowerable); the
    1 - w0 floor keeps w0 = 1 finite (w -> 1 at every finite L)."""
    if isinstance(q, float) and q == 0.0:
        return w0
    Lsafe = jnp.maximum(L, 1e-6)
    e = jnp.exp(q * (jnp.log(lref) - jnp.log(Lsafe)))  # (lref/L)^q
    ln_keep = jnp.log(jnp.maximum(1.0 - w0, 1e-30))
    return 1.0 - jnp.exp(e * ln_keep)


def ne_plasma_cm3(L, lppi, lppo, ne_lppi, a_season, trough_c, smooth=0.0,
                  refill=0.0, refill_q=0.0, refill_lref=4.0):
    """CA1992 plasmasphere density (cm^-3), branchless on device.

    trough_c = 5800 + 300 mlt. Reference: RayTrace_lat.jl:72-81.
    Powers are written as exp/log so the function lowers in Pallas/Mosaic
    (no pow primitive) -- identical values to within 1 ulp.

    smooth > 0 replaces the hard branch boundaries with sigmoid blends of
    width `smooth` (in L) -- a physically reasonable option (the real
    plasmapause is a finite gradient) that makes the medium C-infinity.
    Note: measured rejection rates on the knee stress config are unchanged
    by smoothing (~77% either way) -- that stiffness lives in the ray
    dynamics near reflection points (which is why the reference reaches
    for CVODE_BDF), not in the density model's C0 seams.
    Default 0.0 = reference-exact.

    refill in [0, 1]: density-level trough recovery (extension; the
    reference trough is the fully eroded state). The trough branch is
    blended in LOG space toward the saturated branch-1 profile extended
    beyond the plasmapause: 0 = eroded (reference-exact), 1 = fully
    refilled to saturation. Physically w = 1 - exp(-dt/tau_refill) with
    tau_refill ~ days (Denton et al. 2012-class rates);
    storm.plasmapause_history supplies the epoch weights.

    refill_q > 0 makes the weight L-DEPENDENT via refill_weight():
    `refill` is then the weight at L = refill_lref and each shell refills
    on its own timescale tau ~ L^refill_q (q ~ 4, the flux-tube-volume
    scaling: days at high L, hours low). refill_q = 0 (default) keeps
    the global per-epoch weight."""
    log_ne1 = (-0.3145 * L + 3.9043) + a_season * jnp.exp((2.0 - L) / 1.5)
    ne1 = jnp.exp(LN10 * log_ne1)
    ne2 = ne_lppi * jnp.exp(LN10 * (lppi - L) / 0.1)
    Lsafe = jnp.maximum(L, 1e-6)
    ne3 = trough_c * jnp.exp(-4.5 * jnp.log(Lsafe)) + (
        1.0 - jnp.exp((2.0 - L) / 10.0)
    )
    if not isinstance(smooth, (int, float)):
        raise TypeError(
            "ps_smooth must be a static python float (it selects a code "
            "path at trace time); got a traced value. Keep it out of any "
            "jnp-cast of EnvParams."
        )
    if not (isinstance(refill, float) and refill == 0.0):
        w = refill_weight(L, refill, refill_q, refill_lref)
        ne3 = jnp.exp((1.0 - w) * jnp.log(ne3) + w * (LN10 * log_ne1))
    hard = jnp.where(L <= lppi, ne1, jnp.where(L <= lppo, ne2, ne3))
    if smooth == 0.0:
        return hard
    # blend in LOG space: branch 2 grows like 10^((lppi-L)/0.1) toward
    # small L, so a linear-space sigmoid blend leaks huge branch-2 values
    # through its tail; in log space the leakage is additive in logs and
    # vanishes. All branches are positive.
    w1 = jax_sigmoid((lppi - L) / smooth)
    w2 = jax_sigmoid((lppo - L) / smooth)
    ln1 = LN10 * log_ne1
    # ln2 analytically, NOT log(ne2): XLA flushes subnormals to zero, so
    # at extreme L branch 2 underflows to 0.0 and log gives -inf, which
    # the w2 ~ 0 weight turns into 0 * inf = NaN (value AND autodiff)
    ln2 = jnp.log(ne_lppi) + LN10 * (lppi - L) / 0.1
    ln3 = jnp.log(ne3)
    return jnp.exp(w1 * ln1 + (1.0 - w1) * (w2 * ln2 + (1.0 - w2) * ln3))


def jax_sigmoid(x):
    # logistic in exp/log form (Pallas-lowerable)
    return 1.0 / (1.0 + jnp.exp(-x))


def ne_gcpm_cm3(L, lat, lppo, trough_c, ne0, lscale, bpow, knee=0.2):
    """Simplified-GCPM plasmasphere density (cm^-3) -- the analytic model
    the reference planned but never built (RayMain.jl:99-101: "the
    simplified GCPM looks like it could be approximated analytically as an
    exponential(?) decay multiplied by a dipole field equation"; see also
    plasmasphere.jl:17-19's GCPM TODO). Realized here as:

        ne(L, lat) = ne0 exp(-(L - 2)/lscale) * m(lat)^bpow,
        m(lat) = B(r, lat)/B_eq(L) = sqrt(1 + 3 sin^2 lat)/cos^6 lat

    -- an exponential decay in L times a power of the dipole mirror ratio
    (the "dipole field equation"; a function of latitude alone along a
    field line), smoothly joined to the CA1992 trough (branch iii) at the
    plasmapause Lppo by a log-space sigmoid of width `knee` in L. The
    defaults (ne0 = 1884.3, lscale = 1.3811 = 1/(0.3145 ln 10)) calibrate
    the equatorial profile to CA1992's saturated branch (i) without the
    seasonal term, so bpow = 0 reproduces CA1992-like equatorial physics
    with a C-infinity knee; bpow > 0 adds the field-aligned density
    enhancement toward the feet of the field line (the reference's
    "multiplied by" reading -- bpow is a free knob because the sketch
    never fixed it). Everything is exp/log form (Pallas-lowerable) and
    C-infinity -- no branch seams anywhere."""
    cl = jnp.cos(lat)
    q2 = 1.0 + 3.0 * jnp.sin(lat) ** 2
    ln_m = 0.5 * jnp.log(q2) - 6.0 * jnp.log(cl)
    ln_ps = jnp.log(ne0) - (L - 2.0) / lscale + bpow * ln_m
    Lsafe = jnp.maximum(L, 1e-6)
    ln_tr = jnp.log(
        trough_c * jnp.exp(-4.5 * jnp.log(Lsafe))
        + (1.0 - jnp.exp((2.0 - L) / 10.0))
    )
    w = jax_sigmoid((lppo - L) / knee)
    return jnp.exp(w * ln_ps + (1.0 - w) * ln_tr)


# calibrated defaults (see ne_gcpm_cm3 docstring)
GCPM_NE0 = 10.0 ** (3.9043 - 2.0 * 0.3145)   # 1884.3 cm^-3 at L = 2
GCPM_LSCALE = 1.0 / (0.3145 * LN10)          # 1.3811 L per e-fold
GCPM_KNEE = 0.2                              # plasmapause blend width, L


def duct_factor(L, amp, l0, width):
    """Field-aligned density duct: 1 + amp * exp(-(L - l0)^2 / (2 width^2)).

    The classic whistler duct (Smith 1961; Helliwell 1965): a Gaussian
    crest (amp > 0) or trough (amp < 0) of cold-plasma density across
    L-shell, extended along the field line (the factor depends on L only,
    so it rides the dipole field exactly). Enhancement ducts trap
    whistler-mode energy below fce/2; this is the guided-propagation
    study the reference's planned frequency ensembles point at
    (RayMain.jl:32-52). Multiplies the plasmasphere term of the medium.
    """
    x = (L - l0) / width
    return 1.0 + amp * jnp.exp(-0.5 * x * x)


def diffusive_equilibrium_factor(r):
    """Field-line density falloff factor sqrt(exp(-G/S)), r in RE.

    Reference: plasmasphere.jl:96-106 (G = rb (1 - rb/r), single species,
    alpha_i = 1)."""
    r_m = r * RE
    G = DE_RBASE_M * (1.0 - DE_RBASE_M / r_m)
    return jnp.sqrt(jnp.exp(-G / DE_S))
