"""Quasi-linear pitch-angle / momentum diffusion coefficients.

The radiation-belt application a whistler ray tracer exists to feed (the
reference's own lineage: Bortnik's thesis, cited at RayTrace_3D.jl:5, is a
ray-tracing study of wave-particle interactions): given the wave field the
traced/amplified rays establish, how fast are trapped electrons scattered in
pitch angle and momentum? This module computes the local quasi-linear
diffusion coefficients D_aa, D_ap, D_pp for electrons resonating with
FIELD-ALIGNED whistler-mode waves, and their bounce averages over the
framework's own dipole + plasmasphere medium.

Nothing here is quoted from a table. The full quasi-linear chain --
R-mode field pair from Faraday's law, the pitch-angle equation of motion
under the Lorentz force, the wave-frame kick-direction relation that turns
D_aa into D_ap/D_pp, and the golden-rule resonance Jacobian -- is derived
symbolically with hard assertions in tools/derive_diffusion.py. The result:

    D_aa(E, a) = sum_j (pi/2) (e/(gamma m))^2 W(w_j)
                 (1 - w_j cos a / (k_j v))^2 / |1 - vpar / vg_j|

    D_ap = -q_j p D_aa,j   and   D_pp = q_j^2 p^2 D_aa,j   per root, with
    q_j  = (w_j/(k_j v)) sin a / (1 - w_j cos a/(k_j v)),

summed over the resonant roots w_j of  w - k(w) vpar = wc/gamma  (the n = +1
electron cyclotron resonance; parallel circular waves carry no higher
harmonics), with k(w) = (w/c) mu_R(w) from THIS framework's cold parallel
R-mode index (ops/dispersion.stix_rlp) and vg from growth.py's closed-form
parallel group velocity. W(w) is the wave magnetic power spectral density
(T^2 per rad/s; int W dw = <Bw^2>), the standard truncated-Gaussian band.

mode='emic' switches the whole chain to L-mode ion-cyclotron waves seen by
electrons through the ANOMALOUS n = -1 resonance (w - k vpar = -wc/gamma;
derive_diffusion.py step 5 shows the amplitude/kick algebra is identical) --
the classic EMIC loss channel: only >= MeV electrons reach the root, the
threshold drops with plasma density (plumes), and the scattering is almost
purely pitch-angle (w/(kv) << 1). Validated by its own L-mode Boris Monte
Carlo (tests/test_diffusion.py).

The implementation is validated end-to-end by a test-particle Monte Carlo
(tests/test_diffusion.py, marked slow): electrons pushed by a Boris
integrator through an explicit random-phase superposition of the SAME wave
modes, <Delta a^2>/(2t) compared against D_aa -- the two paths share the
field conventions but no quasi-linear algebra.

Like growth.py and analysis.py this is host-side diagnostic code (numpy,
float64): diffusion coefficients are evaluated on saved medium profiles /
trajectories, not inside the traced hot loop.

Cross-links into the rest of the framework:
  - resonant roots cross-checked against analysis.cyclotron_resonance_energy_ev
    (tests/test_diffusion.py);
  - bounce averages use models.medium.b_mag / ne_total_m3 on the same
    EnvParams the tracer integrates;
  - examples/diffusion_map.py renders the (E, alpha_eq) bounce-averaged map
    and the loss-cone lifetime profile.
"""

import math
from dataclasses import dataclass

import numpy as np

from .constants import C_LIGHT, FCE_E, M_E, Q_E
from .constants import RE as _RE_M
from .growth import group_velocity_parallel
from .ops import dispersion

_TWO_PI = 2.0 * math.pi
_MC2_EV = M_E * C_LIGHT * C_LIGHT / Q_E      # electron rest energy, eV


@dataclass(frozen=True)
class WaveSpectrum:
    """Truncated-Gaussian wave magnetic power spectrum in frequency.

    The standard band model for hiss/chorus/whistler diffusion studies:
    |Bw|^2 distributed as exp(-((f - f_m)/df)^2) between hard cutoffs
    [f_lc, f_uc], normalized so the band integral of the spectral density
    equals bw_t^2 (bw_t = total RMS wave amplitude in Tesla).

    directions: 'both' (waves running parallel AND antiparallel to B0,
    power split evenly -- the symmetric default) or 'forward'/'backward'.
    """

    bw_t: float = 100.0e-12          # 100 pT
    f_m: float = 600.0               # Hz
    df: float = 300.0                # Hz
    f_lc: float = 100.0              # Hz
    f_uc: float = 2000.0             # Hz
    directions: str = "both"

    def _norm_w(self):
        """int exp(-((w - w_m)/dw)^2) dw over the band (rad/s)."""
        wm, dw = _TWO_PI * self.f_m, _TWO_PI * self.df
        lo = (_TWO_PI * self.f_lc - wm) / dw
        hi = (_TWO_PI * self.f_uc - wm) / dw
        return dw * (math.sqrt(math.pi) / 2.0) * (math.erf(hi) - math.erf(lo))

    def power_density(self, w):
        """W(w): T^2 per (rad/s); zero outside [w_lc, w_uc]."""
        w = np.asarray(w, np.float64)
        wm, dw = _TWO_PI * self.f_m, _TWO_PI * self.df
        inband = (w >= _TWO_PI * self.f_lc) & (w <= _TWO_PI * self.f_uc)
        g = np.exp(-(((w - wm) / dw) ** 2))
        return np.where(inband, self.bw_t**2 * g / self._norm_w(), 0.0)

    def direction_signs(self):
        if self.directions == "both":
            return ((1.0, 0.5), (-1.0, 0.5))
        if self.directions == "forward":
            return ((1.0, 1.0),)
        if self.directions == "backward":
            return ((-1.0, 1.0),)
        raise ValueError(f"unknown directions={self.directions!r}")


def spectrum_from_rays(f_hz, bw_t, df_floor_frac=0.05, band_pad=1.0,
                       directions="both"):
    """Moment-matched WaveSpectrum from per-ray frequencies and amplitudes.

    The bridge from the tracer to the diffusion tier: given the frequencies
    f_hz and (gain-weighted) wave amplitudes bw_t [T] of an ensemble of
    rays arriving at one region (e.g. the equator of one L-shell), build
    the equivalent truncated-Gaussian band:

      bw_total^2 = sum bw_i^2          (incoherent superposition -- random
                                        lightning source phases)
      f_m  = power-weighted mean f     (first spectral moment)
      df   = power-weighted std        (second moment; floored at
                                        df_floor_frac * f_m so a
                                        near-monochromatic set keeps a
                                        finite band)
      band = [min f - band_pad*df, max f + band_pad*df], floored at df/10.

    Rays with zero amplitude are ignored. Raises if no power at all."""
    f_hz = np.atleast_1d(np.asarray(f_hz, np.float64))
    bw_t = np.broadcast_to(np.asarray(bw_t, np.float64), f_hz.shape)
    p = bw_t * bw_t
    p_tot = p.sum()
    if not p_tot > 0.0:
        raise ValueError("spectrum_from_rays: no wave power in the ray set")
    f_m = float((p * f_hz).sum() / p_tot)
    var = float((p * (f_hz - f_m) ** 2).sum() / p_tot)
    df = max(math.sqrt(var), df_floor_frac * f_m)
    sel = p > 0.0
    f_lc = max(float(f_hz[sel].min()) - band_pad * df, 0.1 * df)
    f_uc = float(f_hz[sel].max()) + band_pad * df
    return WaveSpectrum(bw_t=float(math.sqrt(p_tot)), f_m=f_m, df=df,
                        f_lc=f_lc, f_uc=f_uc, directions=directions)


def _mu_r(f, bmag, ne_m3, eta_he=0.0, eta_o=0.0, mode="whistler"):
    """Cold parallel index mu(f) of the chosen mode + propagation mask.

    mode='whistler': the PHYSICAL R branch (stix_rlp's R), not the traced
    quartic's bug-compatible '+' root -- same policy as
    growth.gamma_whistler. mode='emic': the L branch (ion-cyclotron
    bands; electrons see it through the anomalous n = -1 resonance)."""
    idx = 0 if mode == "whistler" else 1
    m2 = np.asarray(
        dispersion.stix_rlp(np.asarray(ne_m3, np.float64),
                            np.asarray(bmag, np.float64),
                            np.asarray(f, np.float64), eta_he, eta_o)[idx],
        np.float64)
    ok = m2 > 0.0
    return np.sqrt(np.where(ok, m2, 1.0)), ok


def kinematics(e_kev):
    """Relativistic (gamma, v [m/s], p [kg m/s]) for kinetic energy E."""
    e_kev = np.asarray(e_kev, np.float64)
    gamma = 1.0 + e_kev * 1.0e3 / _MC2_EV
    beta = np.sqrt(1.0 - 1.0 / (gamma * gamma))
    v = beta * C_LIGHT
    return gamma, v, gamma * M_E * v


def resonant_roots(e_kev, alpha_rad, bmag, ne_m3, spec: WaveSpectrum,
                   eta_he=0.0, eta_o=0.0, n_grid=512, n_bisect=30,
                   max_roots=3, mode="whistler"):
    """Resonant frequencies of  g(w) = w - k(w) vpar -+ wc/gamma = 0.

    mode='whistler': the n = +1 electron cyclotron resonance on the R
    branch (g = w - k vpar - wc/gamma). mode='emic': electrons in L-mode
    ion-cyclotron waves resonate ANOMALOUSLY, n = -1
    (g = w - k vpar + wc/gamma; tools/derive_diffusion.py derives the
    L-mode pair's resonant phase as theta - phi, flipping the wc sign) --
    since w << wc_e, only >= MeV electrons reach the root: the classic
    EMIC relativistic-electron loss channel.
    k(w) = s (w/c) mu(w) with s the propagation direction sign; only the
    spectrum band [w_lc, w_uc] is searched (resonances outside carry zero
    weight). Inputs broadcast to a common shape S; returns a dict of
    arrays shaped (n_dir, max_roots) + S:
      w:      root angular frequency (NaN where absent)
      k:      signed parallel wavenumber at the root
      weight: direction power fraction
      valid:  boolean mask
    Roots are located by sign change on an n_grid lattice + bisection --
    vectorized over the whole batch (no Python loop over particles)."""
    e_kev, alpha_rad, bmag, ne_m3 = np.broadcast_arrays(
        np.asarray(e_kev, np.float64), np.asarray(alpha_rad, np.float64),
        np.asarray(bmag, np.float64), np.asarray(ne_m3, np.float64))
    shape = e_kev.shape
    gamma, v, _ = kinematics(e_kev)
    vpar = v * np.cos(alpha_rad)
    res_sign = 1.0 if mode == "whistler" else -1.0   # n = +1 vs n = -1
    wc_rel = res_sign * _TWO_PI * FCE_E * bmag / gamma   # +-wc/gamma

    wgrid = np.linspace(_TWO_PI * spec.f_lc, _TWO_PI * spec.f_uc, n_grid)

    def g_of(w, sign):
        # w broadcasts against the batch; evanescent points masked out by
        # propagating=False -> excluded from sign-change detection.
        mu, ok = _mu_r(w / _TWO_PI, bmag, ne_m3, eta_he, eta_o, mode)
        k = sign * (w / C_LIGHT) * mu
        return w - k * vpar - wc_rel, ok

    dirs = spec.direction_signs()
    w_out = np.full((len(dirs), max_roots) + shape, np.nan)
    k_out = np.zeros((len(dirs), max_roots) + shape)
    wt_out = np.zeros((len(dirs), max_roots) + shape)
    ok_out = np.zeros((len(dirs), max_roots) + shape, bool)

    for di, (sign, wt) in enumerate(dirs):
        wg = wgrid.reshape((n_grid,) + (1,) * len(shape))
        gg, pk = g_of(wg, sign)                       # (n_grid,) + S
        # sign changes on segments where BOTH endpoints propagate
        seg = (gg[:-1] * gg[1:] < 0.0) & pk[:-1] & pk[1:]
        rank = np.cumsum(seg, axis=0) - 1
        for j in range(max_roots):
            sel = seg & (rank == j)
            has = sel.any(axis=0)
            if not has.any():
                break                     # no batch row has a j-th root
            idx = np.argmax(sel, axis=0)
            lo = wgrid[idx]
            hi = wgrid[np.minimum(idx + 1, n_grid - 1)]
            glo, _ = g_of(lo, sign)
            for _ in range(n_bisect):
                mid = 0.5 * (lo + hi)
                gmid, _ = g_of(mid, sign)
                left = (glo * gmid) <= 0.0
                hi = np.where(left, mid, hi)
                lo = np.where(left, lo, mid)
                glo = np.where(left, glo, gmid)
            wj = 0.5 * (lo + hi)
            mu_j, ok_j = _mu_r(wj / _TWO_PI, bmag, ne_m3, eta_he, eta_o,
                               mode)
            valid = has & ok_j
            w_out[di, j] = np.where(valid, wj, np.nan)
            k_out[di, j] = np.where(valid, sign * (wj / C_LIGHT) * mu_j, 0.0)
            wt_out[di, j] = np.where(valid, wt, 0.0)
            ok_out[di, j] = valid
    return {"w": w_out, "k": k_out, "weight": wt_out, "valid": ok_out}


def local_coefficients(e_kev, alpha_rad, bmag, ne_m3, spec: WaveSpectrum,
                       eta_he=0.0, eta_o=0.0, jac_floor=1.0e-3,
                       mode="whistler", **root_kw):
    """Local quasi-linear D_aa [rad^2/s], D_ap [rad kg m/s /s], D_pp
    [(kg m/s)^2 /s] at one point of the medium. Arrays broadcast.

    mode='whistler' (R-mode, n = +1) or 'emic' (L-mode ion-cyclotron
    waves scattering relativistic electrons through the anomalous n = -1
    resonance -- the amplitude and kick-direction algebra is IDENTICAL,
    tools/derive_diffusion.py derives both polarizations; only the
    resonance sign and the dispersion branch change).

    jac_floor: |1 - vpar/vg| is clamped below this value (the v_par = v_g
    tangent resonance, where quasi-linear theory itself breaks down --
    finite spectral width smears the divergence in reality)."""
    e_kev, alpha_rad, bmag, ne_m3 = np.broadcast_arrays(
        np.asarray(e_kev, np.float64), np.asarray(alpha_rad, np.float64),
        np.asarray(bmag, np.float64), np.asarray(ne_m3, np.float64))
    gamma, v, p = kinematics(e_kev)
    vpar = v * np.cos(alpha_rad)
    sina = np.sin(alpha_rad)
    roots = resonant_roots(e_kev, alpha_rad, bmag, ne_m3, spec,
                           eta_he, eta_o, mode=mode, **root_kw)
    wj, kj, wt, ok = (roots[x] for x in ("w", "k", "weight", "valid"))
    wj_safe = np.where(ok, wj, 1.0)
    kj_safe = np.where(ok, kj, 1.0)

    vg = group_velocity_parallel(wj_safe / _TWO_PI, bmag, ne_m3,
                                 mode, eta_he, eta_o)
    vg_signed = np.sign(kj_safe) * vg
    jac = np.abs(1.0 - vpar / np.where(vg_signed == 0.0, np.inf, vg_signed))
    jac = np.maximum(jac, jac_floor)

    phase = wj_safe / (kj_safe * v)                  # w/(k v), signed
    amp = 1.0 - phase * np.cos(alpha_rad)
    pref = (math.pi / 2.0) * (Q_E / (gamma * M_E)) ** 2
    daa_j = np.where(
        ok, pref * wt * spec.power_density(wj_safe) * amp * amp / jac, 0.0)
    qj = np.where(ok, phase * sina / np.where(amp == 0.0, np.inf, amp), 0.0)

    daa = daa_j.sum(axis=(0, 1))
    dap = (-qj * daa_j).sum(axis=(0, 1)) * p
    dpp = (qj * qj * daa_j).sum(axis=(0, 1)) * p * p
    return {"daa": daa, "dap": dap, "dpp": dpp,
            "n_roots": ok.sum(axis=(0, 1))}


def daa_local(e_kev, alpha_rad, bmag, ne_m3, spec: WaveSpectrum, **kw):
    """Local pitch-angle diffusion coefficient D_aa [rad^2/s]."""
    return local_coefficients(e_kev, alpha_rad, bmag, ne_m3, spec, **kw)["daa"]


# ---------------------------------------------------------------------------
# bounce averaging over the framework's dipole + plasmasphere medium
# ---------------------------------------------------------------------------

def mirror_latitude(alpha_eq_rad, n_bisect=60):
    """Dipole mirror latitude: sin^2 a_eq sqrt(1+3 sin^2 l) = cos^6 l.

    First adiabatic invariant along the centered dipole (models/dipole.py
    field shape B/B_eq = sqrt(1+3 sin^2 l)/cos^6 l). Vectorized bisection."""
    s2 = np.sin(np.asarray(alpha_eq_rad, np.float64)) ** 2
    lo = np.zeros_like(s2)
    hi = np.full_like(s2, 0.5 * math.pi - 1.0e-6)

    def h(lam):
        return s2 * np.sqrt(1.0 + 3.0 * np.sin(lam) ** 2) - np.cos(lam) ** 6

    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        hm = h(mid)
        hi = np.where(hm >= 0.0, mid, hi)
        lo = np.where(hm >= 0.0, lo, mid)
    return 0.5 * (lo + hi)


def bounce_averaged(e_kev, alpha_eq_rad, l_shell, env, spec: WaveSpectrum,
                    lat_cut_deg=None, n_lat=96, **kw):
    """Bounce-averaged <D_aa_eq>, <D_ap>, <D_pp> at equatorial pitch angle
    alpha_eq on the dipole field line L, with B and ne from the
    framework's own medium (models.medium.b_mag / ne_total_m3 on the same
    EnvParams the tracer integrates).

        <D> = (1/S) int_0^lam_m  D(lam) J(lam) dlam / (v |cos a(lam)|),
        S   =       int_0^lam_m         J(lam) dlam / (v |cos a(lam)|),

    J = L cos(lam) sqrt(1+3 sin^2 lam) (the dipole arc-length element) and
    D_aa mapped to the EQUATORIAL pitch angle via (da_eq/da)^2 =
    (tan a_eq / tan a)^2 (first-invariant chain rule). The mirror-point
    1/cos a singularity is integrable (cos a ~ sqrt(lam_m - lam)); the
    substitution lam = lam_m sin(x) makes the midpoint rule clean.

    lat_cut_deg: confine the wave power to |lam| <= cut (the usual
    equatorially-confined chorus/hiss model); None = whole line.
    Returns dict daa [rad^2/s], dap, dpp, tau_b [s] (full bounce period).
    Scalar or broadcastable arrays over (e_kev, alpha_eq)."""
    from .models import medium

    e_kev, alpha_eq = np.broadcast_arrays(
        np.asarray(e_kev, np.float64), np.asarray(alpha_eq_rad, np.float64))
    shape = e_kev.shape
    gamma, v, p = kinematics(e_kev)
    lam_m = mirror_latitude(alpha_eq)

    # lam = lam_m sin(x): dlam = lam_m cos(x) dx kills the mirror-point
    # inverse-sqrt; midpoint nodes in x
    x = (np.arange(n_lat) + 0.5) * (0.5 * math.pi / n_lat)
    lam = lam_m[..., None] * np.sin(x)               # S + (n_lat,)
    dlam = lam_m[..., None] * np.cos(x) * (0.5 * math.pi / n_lat)

    slat, clat = np.sin(lam), np.cos(lam)
    b_ratio = np.sqrt(1.0 + 3.0 * slat * slat) / clat**6
    s2a = np.clip(np.sin(alpha_eq[..., None]) ** 2 * b_ratio, 0.0, 1.0)
    sina = np.sqrt(s2a)
    cosa = np.sqrt(np.clip(1.0 - s2a, 0.0, None))

    r = np.asarray(l_shell, np.float64) * clat * clat
    bm = np.asarray(medium.b_mag(r, np.abs(lam), env), np.float64)
    ne = np.asarray(medium.ne_total_m3(r, np.abs(lam), env), np.float64)

    jarc = np.asarray(l_shell, np.float64) * clat \
        * np.sqrt(1.0 + 3.0 * slat * slat) * _RE_M

    alpha_loc = np.arcsin(np.clip(sina, 0.0, 1.0))
    coeff = local_coefficients(
        np.broadcast_to(e_kev[..., None], lam.shape), alpha_loc, bm, ne,
        spec, eta_he=float(getattr(env, "eta_he", 0.0)),
        eta_o=float(getattr(env, "eta_o", 0.0)), **kw)

    if lat_cut_deg is not None:
        inwave = (np.degrees(np.abs(lam)) <= float(lat_cut_deg))
    else:
        inwave = np.ones_like(lam, bool)

    cosa_safe = np.maximum(cosa, 1.0e-12)
    wline = jarc * dlam / cosa_safe                   # ds / |cos a|
    s_norm = wline.sum(axis=-1)

    tana_eq = np.tan(np.clip(alpha_eq, 1.0e-9, math.pi / 2 - 1.0e-9))
    tana = sina / cosa_safe
    chain = (tana_eq[..., None] / np.maximum(tana, 1.0e-12)) ** 2

    out = {}
    for key, mapfac in (("daa", chain), ("dap", np.sqrt(chain)),
                        ("dpp", np.ones_like(chain))):
        d = np.where(inwave, coeff[key], 0.0)
        out[key] = (d * mapfac * wline).sum(axis=-1) / s_norm
    # full bounce = 4 quarter-bounces; v constant along the line
    out["tau_b"] = 4.0 * s_norm / v
    out["mirror_lat_rad"] = lam_m
    return out if shape else {k: np.asarray(v2).item() if np.ndim(v2) == 0
                              else v2 for k, v2 in out.items()}


def loss_cone_lifetime_s(e_kev, l_shell, env, spec: WaveSpectrum,
                         r_loss=1.0, **kw):
    """Weak-diffusion electron lifetime estimate tau ~ 1/<D_aa>(a_LC).

    a_LC: dipole loss cone for mirror radius r_loss (in RE):
    sin^2 a_LC = (r_loss/L)^3 / sqrt(4 - 3 r_loss/L). The classic
    order-of-magnitude precipitation timescale (the quantity KP's
    self-limiting argument balances against the bounce loss rate)."""
    l_shell = np.asarray(l_shell, np.float64)
    rl = r_loss / l_shell
    s2 = rl**3 / np.sqrt(4.0 - 3.0 * rl)
    a_lc = np.arcsin(np.sqrt(np.clip(s2, 0.0, 1.0)))
    ba = bounce_averaged(e_kev, a_lc, l_shell, env, spec, **kw)
    daa = np.asarray(ba["daa"], np.float64)
    # inf = no resonant interaction anywhere on the bounce (band misses
    # the resonance): the wave model sets no lifetime at this energy.
    with np.errstate(divide="ignore"):
        return np.where(daa > 0.0, 1.0 / np.where(daa > 0.0, daa, 1.0),
                        np.inf)


# ---------------------------------------------------------------------------
# jittable (TPU) mirror of the local-coefficient chain
# ---------------------------------------------------------------------------
# The numpy implementation above is the readable float64 oracle; the
# functions below are the SAME algorithm written for jax.numpy so (E, alpha)
# maps compile onto the chip (vmapped/batched natively, fori_loop bisection).
# Parity is pinned in tests/test_diffusion.py::test_jax_local_matches_numpy.
# dispersion.stix_rlp and growth._dstix_dw are pure arithmetic and are
# shared verbatim by both paths.

def _mu_r_jnp(f, bmag, ne_m3, eta_he=0.0, eta_o=0.0, mode="whistler"):
    import jax.numpy as jnp

    idx = 0 if mode == "whistler" else 1
    m2 = dispersion.stix_rlp(ne_m3, bmag, f, eta_he, eta_o)[idx]
    ok = m2 > 0.0
    return jnp.sqrt(jnp.where(ok, m2, 1.0)), ok


def _vg_parallel_jnp(f, bmag, ne_m3, eta_he=0.0, eta_o=0.0,
                     mode="whistler"):
    import jax.numpy as jnp

    from .growth import _dstix_dw

    w = _TWO_PI * f
    idx = 0 if mode == "whistler" else 1
    mu2 = dispersion.stix_rlp(ne_m3, bmag, f, eta_he, eta_o)[idx]
    ok = mu2 > 0.0
    mu = jnp.sqrt(jnp.where(ok, mu2, 1.0))
    dmudw = _dstix_dw(w, ne_m3, bmag, mode, eta_he, eta_o) / (2.0 * mu)
    return jnp.where(ok, C_LIGHT / (mu + w * dmudw), 0.0)


def _power_density_jnp(spec: WaveSpectrum, w):
    import jax.numpy as jnp

    wm, dw = _TWO_PI * spec.f_m, _TWO_PI * spec.df
    inband = (w >= _TWO_PI * spec.f_lc) & (w <= _TWO_PI * spec.f_uc)
    g = jnp.exp(-(((w - wm) / dw) ** 2))
    return jnp.where(inband, spec.bw_t**2 * g / spec._norm_w(), 0.0)


def local_coefficients_jax(e_kev, alpha_rad, bmag, ne_m3,
                           spec: WaveSpectrum, eta_he=0.0, eta_o=0.0,
                           jac_floor=1.0e-3, n_grid=512, n_bisect=30,
                           max_roots=3, momentum_units="si",
                           mode="whistler"):
    """Jittable local D_aa/D_ap/D_pp -- same algorithm as
    local_coefficients, written in jax.numpy. All array args broadcast to
    a common batch shape S; spec / eta / grid sizes are static. Wrap in
    jax.jit at the call site (e.g. jit with static spec via closure).
    Returns dict daa, dap, dpp, n_roots shaped S.

    momentum_units: 'si' (kg m/s -- matches the numpy oracle exactly) or
    'mc' (m_e c units: dap [rad/s], dpp [1/s] per (m_e c)). On float32
    chips 'mc' is MANDATORY for the momentum channels: p_SI ~ 1e-22
    underflows f32 in dpp ~ D p^2 (~1e-45 < the f32 min normal 1.2e-38),
    silently flushing D_pp to zero. D_aa is unit-free and unaffected."""
    import jax
    import jax.numpy as jnp

    if momentum_units not in ("si", "mc"):
        raise ValueError(f"unknown momentum_units={momentum_units!r}")
    p_unit = (M_E * C_LIGHT) if momentum_units == "si" else 1.0
    res_sign = 1.0 if mode == "whistler" else -1.0   # n = +1 vs n = -1

    e_kev, alpha_rad, bmag, ne_m3 = jnp.broadcast_arrays(
        jnp.asarray(e_kev), jnp.asarray(alpha_rad), jnp.asarray(bmag),
        jnp.asarray(ne_m3))
    shape = e_kev.shape
    gamma = 1.0 + e_kev * 1.0e3 / _MC2_EV
    v = jnp.sqrt(1.0 - 1.0 / (gamma * gamma)) * C_LIGHT
    p = gamma * (v / C_LIGHT) * p_unit
    vpar = v * jnp.cos(alpha_rad)
    sina = jnp.sin(alpha_rad)
    wc_rel = res_sign * _TWO_PI * FCE_E * bmag / gamma

    wgrid = jnp.linspace(_TWO_PI * spec.f_lc, _TWO_PI * spec.f_uc, n_grid)

    def g_of(w, sign):
        mu, ok = _mu_r_jnp(w / _TWO_PI, bmag, ne_m3, eta_he, eta_o, mode)
        k = sign * (w / C_LIGHT) * mu
        return w - k * vpar - wc_rel, ok

    daa = jnp.zeros(shape)
    dap_sum = jnp.zeros(shape)
    dpp_sum = jnp.zeros(shape)
    n_roots = jnp.zeros(shape, jnp.int32)
    pref = (math.pi / 2.0) * (Q_E / (gamma * M_E)) ** 2

    for sign, wt in spec.direction_signs():          # static (<= 2)
        wg = wgrid.reshape((n_grid,) + (1,) * len(shape))
        gg, pk = g_of(wg, sign)
        seg = (gg[:-1] * gg[1:] < 0.0) & pk[:-1] & pk[1:]
        rank = jnp.cumsum(seg, axis=0) - 1
        for j in range(max_roots):                   # static
            sel = seg & (rank == j)
            has = sel.any(axis=0)
            idx = jnp.argmax(sel, axis=0)
            lo = wgrid[idx]
            hi = wgrid[jnp.minimum(idx + 1, n_grid - 1)]
            glo, _ = g_of(lo, sign)

            def bisect(_, carry):
                lo, hi, glo = carry
                mid = 0.5 * (lo + hi)
                gmid, _ = g_of(mid, sign)
                left = (glo * gmid) <= 0.0
                return (jnp.where(left, lo, mid),
                        jnp.where(left, mid, hi),
                        jnp.where(left, glo, gmid))

            lo, hi, glo = jax.lax.fori_loop(0, n_bisect, bisect,
                                            (lo, hi, glo))
            wj = 0.5 * (lo + hi)
            mu_j, ok_j = _mu_r_jnp(wj / _TWO_PI, bmag, ne_m3, eta_he,
                                   eta_o, mode)
            valid = has & ok_j
            wj_s = jnp.where(valid, wj, 1.0)
            kj_s = jnp.where(valid, sign * (wj_s / C_LIGHT) * mu_j, 1.0)
            vg = _vg_parallel_jnp(wj_s / _TWO_PI, bmag, ne_m3, eta_he,
                                  eta_o, mode)
            vg_signed = jnp.sign(kj_s) * vg
            jac = jnp.abs(1.0 - vpar / jnp.where(vg_signed == 0.0, jnp.inf,
                                                 vg_signed))
            jac = jnp.maximum(jac, jac_floor)
            phase = wj_s / (kj_s * v)
            amp = 1.0 - phase * jnp.cos(alpha_rad)
            daa_j = jnp.where(
                valid,
                pref * wt * _power_density_jnp(spec, wj_s) * amp * amp / jac,
                0.0)
            qj = jnp.where(valid,
                           phase * sina / jnp.where(amp == 0.0, jnp.inf,
                                                    amp), 0.0)
            daa = daa + daa_j
            dap_sum = dap_sum + (-qj * daa_j)
            dpp_sum = dpp_sum + qj * qj * daa_j
            n_roots = n_roots + valid.astype(jnp.int32)
    return {"daa": daa, "dap": dap_sum * p, "dpp": dpp_sum * p * p,
            "n_roots": n_roots}


def mirror_latitude_jnp(alpha_eq_rad, n_bisect=60):
    """Jittable mirror of mirror_latitude (same bisection, fori_loop)."""
    import jax
    import jax.numpy as jnp

    s2 = jnp.sin(jnp.asarray(alpha_eq_rad)) ** 2
    lo = jnp.zeros_like(s2)
    hi = jnp.full_like(s2, 0.5 * math.pi - 1.0e-6)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        up = (s2 * jnp.sqrt(1.0 + 3.0 * jnp.sin(mid) ** 2)
              - jnp.cos(mid) ** 6) >= 0.0
        return jnp.where(up, lo, mid), jnp.where(up, mid, hi)

    lo, hi = jax.lax.fori_loop(0, n_bisect, body, (lo, hi))
    return 0.5 * (lo + hi)


def bounce_averaged_jax(e_kev, alpha_eq_rad, l_shell, env, spec: WaveSpectrum,
                        lat_cut_deg=None, n_lat=96, **kw):
    """Jittable bounce average -- the same quadrature as bounce_averaged
    (lam = lam_m sin x midpoint rule, first-invariant chain map), with the
    medium from the SAME jnp functions the tracer integrates
    (models.medium.b_mag / ne_total_m3) and the local coefficients from
    local_coefficients_jax. This is the chip path for (E, alpha_eq)
    diffusion maps: wrap in jax.jit with spec / n_lat / root grid static
    (e.g. functools.partial + closure), batch shapes broadcast.
    Parity vs the numpy oracle is pinned in tests/test_diffusion.py.

    kw passes through to local_coefficients_jax; on float32 chips pass
    momentum_units='mc' (SI momentum underflows f32 in dap/dpp -- see
    local_coefficients_jax)."""
    import jax.numpy as jnp

    from .models import medium

    e_kev, alpha_eq = jnp.broadcast_arrays(jnp.asarray(e_kev),
                                           jnp.asarray(alpha_eq_rad))
    gamma = 1.0 + e_kev * 1.0e3 / _MC2_EV
    v = jnp.sqrt(1.0 - 1.0 / (gamma * gamma)) * C_LIGHT
    lam_m = mirror_latitude_jnp(alpha_eq)

    x = (jnp.arange(n_lat) + 0.5) * (0.5 * math.pi / n_lat)
    lam = lam_m[..., None] * jnp.sin(x)               # S + (n_lat,)
    dlam = lam_m[..., None] * jnp.cos(x) * (0.5 * math.pi / n_lat)

    slat, clat = jnp.sin(lam), jnp.cos(lam)
    b_ratio = jnp.sqrt(1.0 + 3.0 * slat * slat) / clat**6
    s2a = jnp.clip(jnp.sin(alpha_eq[..., None]) ** 2 * b_ratio, 0.0, 1.0)
    sina = jnp.sqrt(s2a)
    cosa = jnp.sqrt(jnp.clip(1.0 - s2a, 0.0, None))

    r = jnp.asarray(l_shell) * clat * clat
    bm = medium.b_mag(r, jnp.abs(lam), env)
    ne = medium.ne_total_m3(r, jnp.abs(lam), env)

    jarc = jnp.asarray(l_shell) * clat \
        * jnp.sqrt(1.0 + 3.0 * slat * slat) * _RE_M

    alpha_loc = jnp.arcsin(jnp.clip(sina, 0.0, 1.0))
    coeff = local_coefficients_jax(
        jnp.broadcast_to(e_kev[..., None], lam.shape), alpha_loc, bm, ne,
        spec, eta_he=float(getattr(env, "eta_he", 0.0)),
        eta_o=float(getattr(env, "eta_o", 0.0)), **kw)

    if lat_cut_deg is not None:
        inwave = jnp.degrees(jnp.abs(lam)) <= float(lat_cut_deg)
    else:
        inwave = jnp.ones(lam.shape, bool)

    cosa_safe = jnp.maximum(cosa, 1.0e-12)
    wline = jarc * dlam / cosa_safe                   # ds / |cos a|
    s_norm = wline.sum(axis=-1)

    tana_eq = jnp.tan(jnp.clip(alpha_eq, 1.0e-9, math.pi / 2 - 1.0e-9))
    tana = sina / cosa_safe
    chain = (tana_eq[..., None] / jnp.maximum(tana, 1.0e-12)) ** 2

    out = {}
    for key, mapfac in (("daa", chain), ("dap", jnp.sqrt(chain)),
                        ("dpp", jnp.ones_like(chain))):
        d = jnp.where(inwave, coeff[key], 0.0)
        out[key] = (d * mapfac * wline).sum(axis=-1) / s_norm
    out["tau_b"] = 4.0 * s_norm / v
    out["mirror_lat_rad"] = lam_m
    return out
