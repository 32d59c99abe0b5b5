"""Hand-fused analytic gradient chain for the 2D latitude-frame dispersion.

Computes mu AND all four partials (r, lat, chi==psi, f) in a single forward
sweep: every derivative is a rational expression in quantities the forward
pass already computed, so the gradient costs ZERO extra transcendentals
(vs ~1.5x a forward pass for reverse-mode autodiff). Measured ~1.8x faster
RHS on TPU; exact (1e-12-level) match to jax.value_and_grad is enforced by
tests/test_fused.py.

Chain structure (all elementwise; see ops/dispersion.py for the physics):
  geometry: q^2 = 1 + 3 sin^2(lat) appears three ways --
    |B| = b0 q / r^3,  (sin,cos) dip = (2 sl, cl)/q,  and
    d(dip)/dlat = 2/q^2  (the tidy identity that makes this cheap)
  env: d(ne)/dr, d(ne)/dlat through the ionosphere + CA1992 branches
    (branchless: value and dvalue/dL selected together)
  Stix: partials of R, L, P w.r.t. (ne, |B|, f) in ratio form
  quartic: partials of mu^2 w.r.t. (R, L, P, psi). mu^2 is 1-homogeneous
    in (R, L, P), so d(mu^2)/dR is 0-homogeneous -- evaluating it on the
    s-normalized parameters gives the true partial directly, and only the
    psi-partial needs the s rescale. The stable product root 2C/(B -+ F)
    gets its own derivative, selected consistently with the value branch.

Reference parity: the forward value equals ops.dispersion.mu_2d_lat
(RayTrace_lat.jl:44-194); the partials are the exact derivatives of that
abs-guarded mu (what the reference's central differences approximate,
RayMain.jl:268-316).
"""

import jax
import jax.numpy as jnp

from ..constants import FCE_E, FCE_P, FPE2_E, FPE2_P, RE
from ..models import medium
from ..models.plasmasphere import DE_RBASE_M, DE_S, LN10


def _ne_and_grads(r, lat, env: medium.EnvParams, mlt=None):
    """(ne_m3, d ne/dr, d ne/dlat[, d ne/dphi]) with compile-time gating
    of the plasmasphere / diffusive-equilibrium terms when their weights
    are Python-float zero (e.g. the RayMain medium).

    mlt: None (axisymmetric; 3-tuple return) or the
    medium.mlt_ps_params(phi, env, with_grads=True) pair -- the MLT-
    resolved CA1992 parameters and their phi-derivatives; the return
    then grows a 4th element d ne/dphi (branch-1 is MLT-independent,
    branch-2 moves with the plasmapause shape + its continuity density,
    branch-3 with the day-night trough level)."""
    ni = env.iono_n0 * jnp.exp(-env.iono_decay * (r - env.iono_r0))
    ni_r = -env.iono_decay * ni
    if not (isinstance(env.iono_mix, float) and env.iono_mix == 1.0):
        # day/night mixture (see models/medium.py): second exponential
        # term, derivative is the mix of the two terms' derivatives
        nb = env.iono_n0_b * jnp.exp(-env.iono_decay_b * (r - env.iono_r0))
        ni = env.iono_mix * ni + (1.0 - env.iono_mix) * nb
        ni_r = (
            env.iono_mix * ni_r
            + (1.0 - env.iono_mix) * (-env.iono_decay_b * nb)
        )

    ps_on = not (isinstance(env.ps_weight, float) and env.ps_weight == 0.0)
    if not ps_on:
        z = jnp.zeros_like(ni)
        if mlt is not None:
            return 1.0e6 * ni, 1.0e6 * ni_r, z, z
        return 1.0e6 * ni, 1.0e6 * ni_r, z

    # one reciprocal serves the whole L chain (divisions are ~10x a mul
    # on the VPU; the RHS roofline is op-count-bound, BASELINE.md)
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    inv_cl = 1.0 / cl
    inv_cl2 = inv_cl * inv_cl
    L = r * inv_cl2
    L_r = inv_cl2
    L_lat = 2.0 * L * sl * inv_cl

    if env.ps_model == "gcpm":
        # simplified-GCPM (plasmasphere.ne_gcpm_cm3): log-space value and
        # d/dL + direct d/dlat (the mirror-ratio factor depends on lat at
        # fixed L) together. mlt: the medium.mlt_gcpm_params(phi, env,
        # with_grads=True) pair -- the knee center and trough level move
        # with local time, driving the d ne/dphi channel
        if mlt is not None:
            (lppo_e, trough_e), (dlppo, dtrough) = mlt
        else:
            lppo_e, trough_e = env.lppo, env.ps_trough
        q2g = 1.0 + 3.0 * sl * sl
        ln_m = 0.5 * jnp.log(q2g) - 6.0 * jnp.log(cl)
        dln_m = 3.0 * sl * cl / q2g + 6.0 * sl / cl
        ln_ps = (
            jnp.log(env.gcpm_ne0) - (L - 2.0) / env.gcpm_lscale
            + env.gcpm_bpow * ln_m
        )
        Lsg = jnp.maximum(L, 1.0e-6)
        f45g = jnp.exp(-4.5 * jnp.log(Lsg))
        p3g = trough_e * f45g
        e3g = jnp.exp((2.0 - L) / 10.0)
        ne3g = p3g + (1.0 - e3g)
        ln_tr = jnp.log(ne3g)
        dln_tr = (-4.5 * p3g / Lsg + e3g / 10.0) / ne3g
        inv_k = 1.0 / env.gcpm_knee
        wk = 1.0 / (1.0 + jnp.exp(-(lppo_e - L) * inv_k))
        dwk = -wk * (1.0 - wk) * inv_k
        ne_p = jnp.exp(wk * ln_ps + (1.0 - wk) * ln_tr)
        dne_p = ne_p * (
            dwk * (ln_ps - ln_tr) - wk / env.gcpm_lscale
            + (1.0 - wk) * dln_tr
        )
        ne_p_lat_direct = ne_p * wk * env.gcpm_bpow * dln_m
        ne_p_phi = None
        if mlt is not None:
            # knee motion (wk through lppo) + trough-level motion
            dwk_phi = wk * (1.0 - wk) * inv_k * dlppo
            dln_tr_phi = dtrough * f45g / ne3g
            ne_p_phi = ne_p * (
                dwk_phi * (ln_ps - ln_tr) + (1.0 - wk) * dln_tr_phi
            )
        return _compose_ne(r, env, ni, ni_r, ne_p, dne_p, L_r, L_lat, L,
                           ne_p_lat_direct, ne_p_phi=ne_p_phi)

    # MLT-resolved parameters (medium.mlt_ps_params): effective values
    # replace the frozen env fields; their phi-derivatives drive the
    # dne/dphi chain computed alongside the d/dL one below
    if mlt is not None:
        (lppi_e, lppo_e, ne_lppi_e, trough_e), (
            dlppi, dlppo, dg1i, dtrough) = mlt
    else:
        lppi_e, lppo_e = env.lppi, env.lppo
        ne_lppi_e, trough_e = env.ne_lppi, env.ps_trough

    # CA1992 branches: value and d/dL together (RayTrace_lat.jl:72-81)
    e1 = jnp.exp((2.0 - L) / 1.5)
    g1 = (-0.3145 * L + 3.9043) + env.ps_season * e1
    ne1 = jnp.exp(LN10 * g1)
    dne1 = LN10 * ne1 * (-0.3145 - env.ps_season * e1 / 1.5)
    ne2 = ne_lppi_e * jnp.exp(LN10 * (lppi_e - L) / 0.1)
    dne2 = -(LN10 / 0.1) * ne2
    Ls = jnp.maximum(L, 1.0e-6)
    # L^-4.5 as (1/L)^4 * rsqrt(L): one div + one rsqrt + 3 muls instead
    # of exp(-4.5 log L) -- same value to rounding, ~2x cheaper on VPU
    inv_Ls = 1.0 / Ls
    inv_Ls2 = inv_Ls * inv_Ls
    f45 = (inv_Ls2 * inv_Ls2) * jax.lax.rsqrt(Ls)
    p3 = trough_e * f45
    e3 = jnp.exp((2.0 - L) * 0.1)
    ne3 = p3 + (1.0 - e3)
    dne3 = -4.5 * p3 * inv_Ls + e3 * 0.1
    if mlt is not None:
        # d/dphi of the branches: ln ne2 = LN10 (g1(lppi_e)
        # + (lppi_e - L)/0.1) so its phi-slope is parameter motion only;
        # branch 3 scales its power-law term with the trough level
        dln2_phi = LN10 * (dg1i + dlppi / 0.1)
        dne2_phi = ne2 * dln2_phi
        dne3_phi = dtrough * f45
    refill_on = not (
        isinstance(env.ps_refill, float) and env.ps_refill == 0.0
    )
    if refill_on:
        # density-level trough recovery (plasmasphere.ne_plasma_cm3):
        # log-space blend of the trough toward the saturated branch-1
        # profile; value and d/dL together. ps_refill_q > 0 makes the
        # weight per-L (plasmasphere.refill_weight: each shell refills on
        # its own tau ~ L^q clock), adding the dw/dL chain term.
        w_r = env.ps_refill
        ln3 = jnp.log(ne3)
        ln1 = LN10 * g1
        qr = env.ps_refill_q
        if isinstance(qr, float) and qr == 0.0:
            dw = 0.0
        else:
            e_r = jnp.exp(
                qr * (jnp.log(env.ps_refill_lref) - jnp.log(Ls))
            )
            ln_keep = jnp.log(jnp.maximum(1.0 - w_r, 1.0e-30))
            keep = jnp.exp(e_r * ln_keep)
            w_r = 1.0 - keep
            dw = keep * ln_keep * qr * e_r / Ls
        ln3_eff = (1.0 - w_r) * ln3 + w_r * ln1
        dln3_eff = (
            (1.0 - w_r) * (dne3 / ne3) + w_r * (dne1 / ne1)
            + dw * (ln1 - ln3)
        )
        if mlt is not None:
            # refill blends toward branch 1, which is MLT-independent;
            # w_r depends on L only
            dne3_phi = jnp.exp(ln3_eff) * (1.0 - w_r) * (dne3_phi / ne3)
        ne3 = jnp.exp(ln3_eff)
        dne3 = ne3 * dln3_eff
    smooth_on = not (
        isinstance(env.ps_smooth, float) and env.ps_smooth == 0.0
    )
    ne_p_phi = None
    if smooth_on:
        # log-space sigmoid blends (see models/plasmasphere.py):
        # value and d/dL together
        inv_w = 1.0 / env.ps_smooth
        s1 = 1.0 / (1.0 + jnp.exp(-(lppi_e - L) * inv_w))
        s2 = 1.0 / (1.0 + jnp.exp(-(lppo_e - L) * inv_w))
        ds1 = -s1 * (1.0 - s1) * inv_w     # d s1/dL
        ds2 = -s2 * (1.0 - s2) * inv_w
        ln1 = LN10 * g1
        dln1 = dne1 / ne1
        # analytic, not log(ne2): ne2 underflows to 0 at extreme L under
        # XLA's flush-to-zero and log(0) = -inf would NaN the chain via
        # the ~0 sigmoid weights (see plasmasphere.ne_plasma_cm3)
        ln2 = jnp.log(ne_lppi_e) + LN10 * (lppi_e - L) / 0.1
        dln2 = -(LN10 / 0.1)
        ln3 = jnp.log(ne3)
        dln3 = dne3 / ne3
        inner = s2 * ln2 + (1.0 - s2) * ln3
        dinner = ds2 * (ln2 - ln3) + s2 * dln2 + (1.0 - s2) * dln3
        lns = s1 * ln1 + (1.0 - s1) * inner
        ne_p = jnp.exp(lns)
        dne_p = ne_p * (
            ds1 * (ln1 - inner) + s1 * dln1 + (1.0 - s1) * dinner
        )
        if mlt is not None:
            # the sigmoid weights move with the boundaries: d s/dphi =
            # -ds/dL * dboundary/dphi (opposite sign to the L-slope)
            ds1_phi = -ds1 * dlppi
            ds2_phi = -ds2 * dlppo
            dln3_phi = dne3_phi / ne3
            dinner_phi = (
                ds2_phi * (ln2 - ln3) + s2 * dln2_phi
                + (1.0 - s2) * dln3_phi
            )
            ne_p_phi = ne_p * (
                ds1_phi * (ln1 - inner) + (1.0 - s1) * dinner_phi
            )
    else:
        in1 = L <= lppi_e
        in2 = L <= lppo_e
        ne_p = jnp.where(in1, ne1, jnp.where(in2, ne2, ne3))
        dne_p = jnp.where(in1, dne1, jnp.where(in2, dne2, dne3))
        if mlt is not None:
            zero = jnp.zeros_like(ne_p)
            ne_p_phi = jnp.where(
                in1, zero, jnp.where(in2, dne2_phi, dne3_phi)
            )

    return _compose_ne(r, env, ni, ni_r, ne_p, dne_p, L_r, L_lat, L,
                       ne_p_phi=ne_p_phi)


def _compose_ne(r, env, ni, ni_r, ne_p, dne_p, L_r, L_lat, L,
                ne_p_lat_direct=0.0, ne_p_phi=None):
    """Common tail of _ne_and_grads: apply the duct and DE factors and
    assemble the total density and its (r, lat) partials. ne_p_lat_direct
    carries any plasmasphere lat-dependence at fixed L (the GCPM
    mirror-ratio term); ne_p_phi (MLT-resolved medium) rides the same
    multiplicative factors (both are L/r-only) and appends a 4th output
    d ne/dphi."""
    duct_on = not (
        isinstance(env.duct_amp, float) and env.duct_amp == 0.0
    )
    if duct_on:
        # Gaussian duct (plasmasphere.duct_factor): value and d/dL
        # together; the factor multiplies the whole plasmasphere term,
        # including its fixed-L lat-dependence
        x = (L - env.duct_l0) / env.duct_w
        e = jnp.exp(-0.5 * x * x)
        g = 1.0 + env.duct_amp * e
        dg = -(env.duct_amp / env.duct_w) * x * e
        dne_p = dne_p * g + ne_p * dg
        ne_p = ne_p * g
        ne_p_lat_direct = ne_p_lat_direct * g
        if ne_p_phi is not None:
            ne_p_phi = ne_p_phi * g
    de_on = not (isinstance(env.de_weight, float) and env.de_weight == 0.0)
    if de_on:
        # diffusive equilibrium factor and its r-derivative
        G = DE_RBASE_M * (1.0 - DE_RBASE_M / (r * RE))
        de = jnp.sqrt(jnp.exp(-G / DE_S))
        de_r = -de * DE_RBASE_M * DE_RBASE_M / (2.0 * DE_S * r * r * RE)
        de = env.de_weight * de + (1.0 - env.de_weight)
        de_r = env.de_weight * de_r
    else:
        de = 1.0
        de_r = 0.0

    w = env.ps_weight
    ne = 1.0e6 * (ni + w * ne_p * de)
    ne_r = 1.0e6 * (ni_r + w * (dne_p * L_r * de + ne_p * de_r))
    ne_lat = 1.0e6 * w * de * (dne_p * L_lat + ne_p_lat_direct)
    if ne_p_phi is not None:
        return ne, ne_r, ne_lat, 1.0e6 * w * de * ne_p_phi
    return ne, ne_r, ne_lat


def _stix_quartic_grads(ne, bm, f, sinpsi, cospsi, root,
                        eta_he=0.0, eta_o=0.0, wrt_cos=False):
    """Shared core: mu plus d(mu)/d{ne, bm, f, geometry} at fixed geometry.

    Returns (mu, dmu_dn, dmu_db, dmu_df, dmu_dgeom). The 2D and 3D entry
    points supply their own geometry chain rules on top. eta_he/eta_o:
    He+/O+ fractions (dispersion.ion_species); the protons-only default
    compiles to the exact two-species reference algebra.

    wrt_cos selects the geometry variable of dmu_dgeom:
      False (2D path): dmu/dpsi -- every psi-partial carries the common
        factor sin(psi)cos(psi), fine when psi comes from angle addition;
      True (3D path): dmu/dcos(psi) -- the quartic is smooth in
        cos(psi), so this form has NO sin(psi) factor to divide back
        out. The 3D chain rule composes dmu/dcos with dcos/d(state),
        which cancels the 1/sin(psi) of the psi-parameterization
        ALGEBRAICALLY: at field-aligned propagation (psi -> 0 or pi,
        the natural whistler state) the psi-form is a removable 0/0
        that float32 cannot evaluate (1 - cos^2 hits the rounding
        floor; measured: 65% of a 3D fan falsely wedge-retired,
        benchmarks/perf_r03j.py), while the cos-form is regular."""
    from .dispersion import ion_species

    # --- Stix ratio form + partials w.r.t. (ne, bm, f) ---
    inv_f = 1.0 / f
    ncm = ne * 1.0e-6
    xe = FPE2_E * ncm * inv_f * inv_f
    ye = FCE_E * bm * inv_f
    # one reciprocal per species: 1/(1 -+ y) = (1 +- y)/(1 - y^2)
    inv_de = 1.0 / (1.0 - ye * ye)
    ae = (1.0 + ye) * inv_de
    be = (1.0 - ye) * inv_de
    # species sums: Sa = sum x_i a_i, Say = sum x_i a_i^2 y_i (ditto b);
    # per-ion a_i = 1/(1 + y_i), b_i = 1/(1 - y_i)
    Sa = jnp.zeros_like(xe)
    Sb = jnp.zeros_like(xe)
    Say = jnp.zeros_like(xe)
    Sby = jnp.zeros_like(xe)
    Sx = jnp.zeros_like(xe)
    for fpe2_i, fce_i in ion_species(eta_he, eta_o):
        xi = fpe2_i * ncm * inv_f * inv_f
        yi = fce_i * bm * inv_f
        inv_di = 1.0 / (1.0 - yi * yi)
        ai = (1.0 - yi) * inv_di
        bi = (1.0 + yi) * inv_di
        Sa = Sa + xi * ai
        Sb = Sb + xi * bi
        Say = Say + xi * ai * ai * yi
        Sby = Sby + xi * bi * bi * yi
        Sx = Sx + xi
    R = 1.0 - xe * ae - Sa
    L = 1.0 - xe * be - Sb
    P = 1.0 - xe - Sx
    inv_ne = 1.0 / ne
    # d{R,L,P}/d(ne): X terms scale with ne
    R_n = -(xe * ae + Sa) * inv_ne
    L_n = -(xe * be + Sb) * inv_ne
    P_n = -(xe + Sx) * inv_ne
    # d{R,L}/d(bm): Y terms scale with bm
    inv_bm = 1.0 / bm
    R_b = (-xe * ae * ae * ye + Say) * inv_bm
    L_b = (xe * be * be * ye - Sby) * inv_bm
    # d{R,L,P}/df: X ~ f^-2, Y ~ f^-1
    R_f = (2.0 * (xe * ae + Sa) + (xe * ae * ae * ye - Say)) * inv_f
    L_f = (2.0 * (xe * be + Sb) + (-xe * be * be * ye + Sby)) * inv_f
    P_f = 2.0 * (xe + Sx) * inv_f

    # --- normalize (mu^2 is 1-homogeneous in (R,L,P); the (R,L,P)
    # partials of mu^2 are 0-homogeneous so they come out scale-free) ---
    s = jnp.maximum(jnp.maximum(jnp.abs(R), jnp.abs(L)), jnp.abs(P))
    inv_s = 1.0 / s
    Rn, Ln, Pn = R * inv_s, L * inv_s, P * inv_s

    sin2 = sinpsi * sinpsi
    cos2 = cospsi * cospsi
    sin4 = sin2 * sin2
    Sn = 0.5 * (Rn + Ln)
    A = Sn * sin2 + Pn * cos2
    RL = Rn * Ln
    PS = Pn * Sn
    B = RL * sin2 + PS * (1.0 + cos2)
    C = Pn * RL
    G = RL - PS
    H = Pn * (Rn - Ln)
    F2 = G * G * sin4 + H * H * cos2
    F = jnp.sqrt(F2)
    inv_F = 1.0 / F

    halfP = 0.5 * Pn
    # geometry factor: d(sin^2)/dpsi = 2 sc, d(cos^2)/dpsi = -2 sc;
    # in the cos-form d(sin^2)/dc = -2c, d(cos^2)/dc = 2c -- i.e. the
    # psi-form's (sinpsi * cospsi) factor becomes (-cospsi), nothing else
    # in the A/B/F partials changes
    geo = -cospsi if wrt_cos else sinpsi * cospsi
    # partials of A, B, C, F w.r.t. normalized (R, L, P) and geometry
    A_R = 0.5 * sin2
    A_L = 0.5 * sin2
    A_P = cos2
    A_psi = (Sn - Pn) * 2.0 * geo
    onepcos2 = 1.0 + cos2
    B_R = Ln * sin2 + halfP * onepcos2
    B_L = Rn * sin2 + halfP * onepcos2
    B_P = Sn * onepcos2
    B_psi = 2.0 * G * geo
    C_R = Pn * Ln
    C_L = Pn * Rn
    C_P = RL
    F_R = (G * (Ln - halfP) * sin4 + H * Pn * cos2) * inv_F
    F_L = (G * (Rn - halfP) * sin4 - H * Pn * cos2) * inv_F
    F_P = (-G * Sn * sin4 + H * (Rn - Ln) * cos2) * inv_F
    F_psi = geo * (2.0 * G * G * sin2 - H * H) * inv_F

    # mu^2 (normalized) and its partials, stable-branch consistent
    inv_2A = 0.5 / A
    inv_A = inv_2A + inv_2A   # reuse: saves one div per mu2n_q call
    num_dir = B + root * F
    mu2n_dir = num_dir * inv_2A
    den_pro = B - root * F
    inv_den = 1.0 / den_pro
    mu2n_pro = 2.0 * C * inv_den
    use_dir = root * B >= 0.0
    mu2n = jnp.where(use_dir, mu2n_dir, mu2n_pro)

    def mu2n_q(B_q, F_q, A_q, C_q):
        d_dir = (B_q + root * F_q) * inv_2A - mu2n_dir * A_q * inv_A
        d_pro = (2.0 * C_q - mu2n_pro * (B_q - root * F_q)) * inv_den
        return jnp.where(use_dir, d_dir, d_pro)

    m_R = mu2n_q(B_R, F_R, A_R, C_R)
    m_L = mu2n_q(B_L, F_L, A_L, C_L)
    m_P = mu2n_q(B_P, F_P, A_P, C_P)
    m_psi = mu2n_q(B_psi, F_psi, A_psi, jnp.zeros_like(C_R))

    mu2 = s * mu2n
    mu = jnp.sqrt(jnp.abs(mu2))
    # d(sqrt|mu^2|)/dq = sign(mu^2) d(mu^2)/dq / (2 mu); with
    # d(mu^2)/d{R,L,P} == m_{R,L,P} (0-homogeneous) and
    # d(mu^2)/dpsi == s * m_psi
    gscale = jnp.sign(mu2n) / (2.0 * mu)

    dmu_dn = gscale * (m_R * R_n + m_L * L_n + m_P * P_n)
    dmu_db = gscale * (m_R * R_b + m_L * L_b)
    dmu_df = gscale * (m_R * R_f + m_L * L_f + m_P * P_f)
    dmu_dpsi = gscale * s * m_psi
    return mu, dmu_dn, dmu_db, dmu_df, dmu_dpsi


def mu_and_grads_2d_lat(r, lat, chi, f, env: medium.EnvParams, root=1.0,
                        ne_fn=None):
    """(mu, dmu/dr, dmu/dlat, dmu/dpsi, dmu/df) -- one fused sweep.

    dmu/dpsi == dmu/dchi (psi = pi/2 + dip + chi). Value identical to
    dispersion.mu_2d_lat; partials identical to jax.grad of it.

    ne_fn: optional (r, lat, env) -> (ne, dne/dr, dne/dlat) replacing the
    closed-form _ne_and_grads -- the tabulated-medium hook
    (ops/tabulated.py)."""
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    q2 = 1.0 + 3.0 * sl * sl
    q = jnp.sqrt(q2)
    inv_r = 1.0 / r
    inv_r3 = inv_r * inv_r * inv_r

    # wave-normal trig without inverse trig (dispersion.psi_trig_lat);
    # inv_q2 = inv_q^2 replaces the two /q2 divisions below
    inv_q = 1.0 / q
    inv_q2 = inv_q * inv_q

    # dipole field and its gradients (b_mag_lat; RayTrace_lat.jl:66)
    bm = env.b0 * q * inv_r3
    bm_r = -3.0 * bm * inv_r
    bm_lat = 3.0 * sl * cl * bm * inv_q2

    sindip = 2.0 * sl * inv_q
    cosdip = cl * inv_q
    sc, cc = jnp.sin(chi), jnp.cos(chi)
    sinpsi = cosdip * cc - sindip * sc
    cospsi = -(sindip * cc + cosdip * sc)
    dpsi_dlat = 2.0 * inv_q2  # d(atan(2 tan lat))/dlat, exact identity

    ne, ne_r, ne_lat = (ne_fn or _ne_and_grads)(r, lat, env)
    mu, dmu_dn, dmu_db, dmu_df, dmu_dpsi = _stix_quartic_grads(
        ne, bm, f, sinpsi, cospsi, root, env.eta_he, env.eta_o
    )
    dmudr = dmu_dn * ne_r + dmu_db * bm_r
    dmudlat = dmu_dn * ne_lat + dmu_db * bm_lat + dmu_dpsi * dpsi_dlat
    return mu, dmudr, dmudlat, dmu_dpsi, dmu_df


def mu_and_grads_3d_general(r, theta, phi, rho_r, rho_t, rho_p, f,
                            env: medium.EnvParams, root=1.0):
    """mu and all 7 partials for non-axisymmetric fields (tilted/IGRF).

    Hybrid fusion: the EXPENSIVE part of the gradient -- the density
    chain and the Stix quartic, where reverse-mode autodiff pays ~1.5x a
    forward pass -- reuses the same hand-fused core as the dipole chain
    (_ne_and_grads + _stix_quartic_grads); only the CHEAP geometry
    (b_vec rotation / IGRF harmonics, magnetic latitude/longitude) goes
    through forward-mode autodiff, as one jacfwd of a 5-vector
    [B_r, B_theta, B_phi, mlat, mlon] w.r.t. (r, theta, phi). Building
    the geometry from medium.b_vec / mlat_3d / mlon_3d keeps the forward
    value definitionally identical to dispersion.mu_3d.

    Geometry chain on top of the jacobian J (rows: B components, mlat,
    mlon; columns: r, theta, phi):
      |B|_x   = (B . B_x)/|B|
      Bhat_x  = (B_x - Bhat |B|_x)/|B|
      cos psi = Bhat . rhohat;  d cos/dx = Bhat_x . rhohat
      sin psi = |Bhat x rhohat| (full 3-component cross: a tilted field
                has Bhat_phi != 0 in geographic coordinates)
      d cos/d rho_k = (Bhat_k - cos psi rhohat_k)/|rho|
      ne(r, mlat[, mlon]):  d ne/dx = ne_r dx==r + ne_lat dmlat/dx
                                      + ne_mlon dmlon/dx
    Values/partials match jax.value_and_grad of dispersion.mu_3d
    (tests/test_fused.py::test_fused_general_matches_autodiff_*); the
    tilt -> 0 limit reduces to mu_and_grads_3d (same core, the tangent
    columns collapse to the axisymmetric chain).

    Measured on chip at production scale (10,240-ray ensembles vs the
    fused-dipole plume control, benchmarks/perf_r05_tilted_fused.json):
    tilted +10.5%/step, IGRF +4.4%/step -- roughly HALF the autodiff
    fallback this replaces (tilted +22.5%, IGRF +28.3%,
    perf_r05_tilted.json). Implementation note that cost 1.7-1.9x to
    learn: a first form materialized the geometry jacobian as per-lane
    (5,3) arrays and contracted with small matmuls; under the
    production vmap those lower to layout ops (transposes over
    8x128-tiled batches) and measured SLOWER than full autodiff. The
    shipped form keeps every intermediate scalar per lane."""

    def geom(r_, th_, ph_):
        br_, bt_, bp_ = medium.b_vec(r_, th_, ph_, env)
        return (br_, bt_, bp_,
                medium.mlat_3d(r_, th_, ph_, env),
                medium.mlon_3d(r_, th_, ph_, env))

    # one primal + three scalar tangent passes sharing it (linearize);
    # everything downstream stays SCALAR per lane -- no per-lane (5,3)
    # jacobian arrays or small matmuls, which lower to layout ops
    # (transposes over 8x128-tiled batches) under the production vmap
    # and were measured to cost more than they save
    (br, bt, bp, mlat, mlon), lin = jax.linearize(geom, r, theta, phi)
    one, zero = jnp.ones_like(r), jnp.zeros_like(r)
    br_r, bt_r, bp_r, mlat_r, mlon_r = lin(one, zero, zero)
    br_t, bt_t, bp_t, mlat_t, mlon_t = lin(zero, one, zero)
    br_p, bt_p, bp_p, mlat_p, mlon_p = lin(zero, zero, one)

    bm = jnp.sqrt(br * br + bt * bt + bp * bp)
    inv_bm = 1.0 / bm
    bm_r = (br * br_r + bt * bt_r + bp * bp_r) * inv_bm
    bm_t = (br * br_t + bt * bt_t + bp * bp_t) * inv_bm
    bm_p = (br * br_p + bt * bt_p + bp * bp_p) * inv_bm
    hr, ht, hp = br * inv_bm, bt * inv_bm, bp * inv_bm

    inv_rmag = jax.lax.rsqrt(rho_r * rho_r + rho_t * rho_t + rho_p * rho_p)
    rr_, rt_, rp_ = rho_r * inv_rmag, rho_t * inv_rmag, rho_p * inv_rmag
    cospsi = jnp.clip(hr * rr_ + ht * rt_ + hp * rp_, -1.0, 1.0)
    # full 3-component cross (a tilted field has Bhat_phi != 0)
    c1 = ht * rp_ - hp * rt_
    c2 = hp * rr_ - hr * rp_
    c3 = hr * rt_ - ht * rr_
    sinpsi = jnp.sqrt(c1 * c1 + c2 * c2 + c3 * c3)
    # d cos/dx = (Bhat_x . rhohat); Bhat_x = (B_x - Bhat |B|_x)/|B|, and
    # the Bhat |B|_x part contracts to cospsi |B|_x/|B|
    dcos_dr = ((br_r * rr_ + bt_r * rt_ + bp_r * rp_)
               - cospsi * bm_r) * inv_bm
    dcos_dt = ((br_t * rr_ + bt_t * rt_ + bp_t * rp_)
               - cospsi * bm_t) * inv_bm
    dcos_dp = ((br_p * rr_ + bt_p * rt_ + bp_p * rp_)
               - cospsi * bm_p) * inv_bm
    dcos_drho_r = (hr - cospsi * rr_) * inv_rmag
    dcos_drho_t = (ht - cospsi * rt_) * inv_rmag
    dcos_drho_p = (hp - cospsi * rp_) * inv_rmag

    if medium.mlt_on(env):
        mlt = (
            medium.mlt_gcpm_params(mlon, env, with_grads=True)
            if env.ps_model == "gcpm"
            else medium.mlt_ps_params(mlon, env, with_grads=True)
        )
        ne, ne_r, ne_lat, ne_mlon = _ne_and_grads(r, mlat, env, mlt=mlt)
        dne_dr = ne_r + ne_lat * mlat_r + ne_mlon * mlon_r
        dne_dt = ne_lat * mlat_t + ne_mlon * mlon_t
        dne_dp = ne_lat * mlat_p + ne_mlon * mlon_p
    else:
        ne, ne_r, ne_lat = _ne_and_grads(r, mlat, env)
        dne_dr = ne_r + ne_lat * mlat_r
        dne_dt = ne_lat * mlat_t
        dne_dp = ne_lat * mlat_p

    mu, dmu_dn, dmu_db, dmu_df, dmu_dc = _stix_quartic_grads(
        ne, bm, f, sinpsi, cospsi, root, env.eta_he, env.eta_o,
        wrt_cos=True,
    )
    return mu, (
        dmu_dn * dne_dr + dmu_db * bm_r + dmu_dc * dcos_dr,
        dmu_dn * dne_dt + dmu_db * bm_t + dmu_dc * dcos_dt,
        dmu_dn * dne_dp + dmu_db * bm_p + dmu_dc * dcos_dp,
        dmu_dc * dcos_drho_r, dmu_dc * dcos_drho_t,
        dmu_dc * dcos_drho_p, dmu_df,
    )


def mu_and_grads_3d(r, theta, phi, rho_r, rho_t, rho_p, f,
                    env: medium.EnvParams, root=1.0):
    """mu and all 7 partials for the 3D state -- fused sweep.

    Geometry chain (dipole, meridional symmetry):
      - cos psi = (B.rho)/(|B||rho|); the B *direction* is independent of
        r (every component ~ 1/r^3), so d(psi)/dr == 0 and the entire
        r-dependence flows through |B| and ne;
      - unit-field derivatives d(Bhat_r)/dlat = -2 cos(lat)/q^3,
        d(Bhat_theta)/dlat = 4 sin(lat)/q^3 with q^2 = 1 + 3 sin^2 lat;
      - d(cos psi)/d(rho_k) = (Bhat_k - cos psi rhohat_k)/|rho|;
      - axisymmetric field: psi and |B| carry no phi-dependence; with
        an MLT-resolved plasmasphere (env.ps_mlt) d mu/dphi flows
        entirely through the density (dmu_dn * dne/dphi), with dne/dphi
        from the same fused CA1992 chain (_ne_and_grads mlt= path);
        the axisymmetric medium keeps d/dphi == 0 exactly.
    Values/partials match jax.value_and_grad of dispersion.mu_3d to
    ~1e-11 (tests/test_fused.py, tests/test_mlt3d.py)."""
    lat = jnp.pi / 2.0 - theta
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    q2 = 1.0 + 3.0 * sl * sl
    q = jnp.sqrt(q2)
    inv_r = 1.0 / r
    inv_r3 = inv_r * inv_r * inv_r

    inv_q = 1.0 / q
    inv_q2 = inv_q * inv_q
    inv_q3 = inv_q2 * inv_q

    bm = env.b0 * q * inv_r3
    bm_r = -3.0 * bm * inv_r
    bm_lat = 3.0 * sl * cl * bm * inv_q2

    bhat_r = -2.0 * sl * inv_q         # b_vec_colat components / |B|
    bhat_t = -cl * inv_q
    dbhat_r_dlat = -2.0 * cl * inv_q3
    dbhat_t_dlat = 4.0 * sl * inv_q3

    inv_rmag = jax.lax.rsqrt(rho_r * rho_r + rho_t * rho_t + rho_p * rho_p)
    rhat_r, rhat_t, rhat_p = (
        rho_r * inv_rmag, rho_t * inv_rmag, rho_p * inv_rmag,
    )
    cospsi = jnp.clip(bhat_r * rhat_r + bhat_t * rhat_t, -1.0, 1.0)
    # sin psi from the CROSS product |Bhat x rhohat| (Bhat is unit, so
    # |cross|^2 = rhat_p^2 + (Bhat_r rhat_t - Bhat_t rhat_r)^2): absolute
    # error ~eps even at field-aligned propagation, where the dot-product
    # form sqrt(1 - cos^2) loses half the mantissa to cancellation
    cr_m = bhat_r * rhat_t - bhat_t * rhat_r
    sinpsi = jnp.sqrt(rhat_p * rhat_p + cr_m * cr_m)
    # geometry chain through c = cos(psi), NOT psi: the quartic is smooth
    # in c, so no 1/sin(psi) appears anywhere and the field-aligned state
    # (psi -> 0 or pi, where dmu/dpsi -> 0 but 1/sin -> inf) is regular
    # by construction instead of a 0/0 float32 cannot resolve
    dcos_dlat = rhat_r * dbhat_r_dlat + rhat_t * dbhat_t_dlat
    dcos_dtheta = -dcos_dlat                   # dlat/dtheta = -1
    dcos_drho_r = (bhat_r - cospsi * rhat_r) * inv_rmag
    dcos_drho_t = (bhat_t - cospsi * rhat_t) * inv_rmag
    dcos_drho_p = (0.0 - cospsi * rhat_p) * inv_rmag

    if medium.mlt_on(env):
        mlt = (
            medium.mlt_gcpm_params(phi, env, with_grads=True)
            if env.ps_model == "gcpm"
            else medium.mlt_ps_params(phi, env, with_grads=True)
        )
        ne, ne_r, ne_lat, ne_phi = _ne_and_grads(r, lat, env, mlt=mlt)
    else:
        ne, ne_r, ne_lat = _ne_and_grads(r, lat, env)
        ne_phi = None
    mu, dmu_dn, dmu_db, dmu_df, dmu_dc = _stix_quartic_grads(
        ne, bm, f, sinpsi, cospsi, root, env.eta_he, env.eta_o,
        wrt_cos=True,
    )
    dmudr = dmu_dn * ne_r + dmu_db * bm_r
    dmudtheta = -(dmu_dn * ne_lat + dmu_db * bm_lat) + dmu_dc * dcos_dtheta
    dmudphi = (
        jnp.zeros_like(dmudr) if ne_phi is None else dmu_dn * ne_phi
    )
    return mu, (
        dmudr, dmudtheta, dmudphi,
        dmu_dc * dcos_drho_r, dmu_dc * dcos_drho_t,
        dmu_dc * dcos_drho_p, dmu_df,
    )
