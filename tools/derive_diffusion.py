"""Derive the quasi-linear diffusion coefficients behind raytrace_tpu.diffusion.

Like tools/derive_growth.py (the hot susceptibility) and tools/derive_ros3.py
(the stiff-stepper coefficients), the policy in this zero-egress environment
is to DERIVE the result mechanically from first principles and pin every step
with a hard assertion, instead of quoting a literature formula from memory.

Physical setup (the radiation-belt application a whistler ray tracer feeds --
the reference's own lineage: Bortnik's thesis, cited at RayTrace_3D.jl:5, is
a ray-tracing study of wave-particle interactions): an electron in a uniform
background field B0 = B0 z interacting with a spectrum of FIELD-ALIGNED
(k || B0) right-circularly polarized whistler waves with random phases.

Wave fields for one mode (phase ph = k z - w t; R-mode rotates in the
electron gyration sense, which is what makes cyclotron resonance possible):

    Bw = Bw (cos ph, -sin ph, 0)
    Ew = -(w/k) Bw (sin ph, cos ph, 0)     [from Faraday's law -- derived
                                            and asserted below, not assumed]

This script proves, symbolically (sympy):

  (1) Faraday consistency: curl E = -dB/dt fixes Ew = -(w/k) Bw exactly.
  (2) The pitch-angle equation of motion. Decomposing v = (vperp cos th,
      vperp sin th, vpar) and projecting the Lorentz force -e(Ew + v x B)
      (B = B0 z + Bw) gives EXACTLY

          d(alpha)/dt = -Ww (1 - (w/(k v)) cos(alpha)) sin(th + ph)
          d(v)/dt     =  Ww (w/k) sin(alpha) sin(th + ph)

      with Ww = e Bw / m the wave gyrofrequency amplitude and alpha the
      pitch angle (tan(alpha) = vperp/vpar). The resonance condition
      follows from stationarity of Phi = th + ph: dPhi/dt = wc + k vpar - w
      = 0, i.e. w - k vpar = wc -- the n = +1 electron cyclotron resonance
      in this repo's sign convention (wc = e B0 / m > 0, counter-streaming
      resonant electrons, same convention derive_growth.py pinned to the
      cold Stix R).
  (3) The kick-direction relation. Scattering by a wave moving at
      vph = w/k conserves particle energy in the wave frame:
      (vpar - vph) d(vpar) + vperp d(vperp) = 0. Solving this constraint
      with the pitch-angle/speed decomposition gives

          dv / (v dalpha) = -(w/(k v)) sin(alpha) / (1 - (w/(k v)) cos(alpha))

      and the script asserts this equals the RATIO of the two equations of
      motion in (2) -- two independent routes (frame kinematics vs direct
      Lorentz-force projection) to the same relation. This ratio is what
      turns D_aa into D_ap and D_pp:

          D_ap = -q p D_aa,   D_pp = q^2 p^2 D_aa,
          q = (w/(k v)) sin(alpha) / (1 - (w/(k v)) cos(alpha)).
  (4) The golden-rule Jacobian. For a continuum of random-phase modes,
      <(Delta alpha)^2>/(2t) -> sum of (pi/2) A^2 delta(dPhi/dt) over modes
      (the standard |int exp(i Phi)|^2 -> 2 pi t delta(Phi') limit); with
      the spectrum given in frequency and k = k(w) from the cold dispersion,
      delta(w - k(w) vpar - wc) contributes 1/|dg/dw| with

          dg/dw = 1 - vpar / vg,        vg = dw/dk,

      asserted by symbolic differentiation.

Together these give the local pitch-angle diffusion coefficient implemented
in raytrace_tpu/diffusion.py:

    D_aa = sum_roots (pi/2) (e/(gamma m))^2 W(w_j)
           (1 - w_j cos(alpha)/(k_j v))^2 / |1 - vpar/vg(w_j)|

with W(w) the wave magnetic power spectral density (T^2 per rad/s,
int W dw = <Bw^2>), roots w_j of the resonance condition on the repo's own
cold parallel R-mode index, and the relativistic substitutions m -> gamma m
(in both Ww and wc) which enter only through the two marked factors.

The IMPLEMENTATION is then validated end-to-end by a test-particle Monte
Carlo (tests/test_diffusion.py): electrons pushed through an explicit
random-phase wave field by a Boris integrator, <Delta alpha^2>/(2t) compared
against D_aa -- no quasi-linear algebra shared between the two paths.

  (5) The L-mode (EMIC) pair. Repeating (1)-(3) for the LEFT-circular
      field pair

          Bw = Bw (cos ph, +sin ph, 0)
          Ew = +(w/k) Bw (sin ph, -cos ph, 0)     [Faraday, asserted]

      gives the SAME closed forms with the resonant phase theta - ph
      instead of theta + ph:

          d(alpha)/dt = -Ww (1 - (w/(k v)) cos(alpha)) sin(th - ph)
          d(v)/dt     =  Ww (w/k) sin(alpha) sin(th - ph)

      so the amplitude factor and the kick-direction ratio q are
      UNCHANGED, and only the resonance flips sign: stationarity of
      th - ph gives wc - (k vpar - w) = 0, i.e. w - k vpar = -wc -- the
      anomalous n = -1 resonance. Since w << wc_e for ion-band waves,
      k vpar must reach ~wc/gamma: only relativistic (>= MeV) electrons
      resonate. This is the mode='emic' channel of diffusion.py (the
      classic EMIC relativistic-electron loss mechanism), with k(w) from
      the repo's cold parallel L index; validated end-to-end by the
      L-mode Boris Monte Carlo in tests/test_diffusion.py.

Run: python tools/derive_diffusion.py   (asserts all five; a few seconds)
"""

import sympy as sp


def main():
    w, k, B0, Bw, e, m = sp.symbols("w k B0 Bw e m", positive=True)
    v, vperp, vpar = sp.symbols("v vperp vpar", positive=True)
    alpha, th, ph, z, t = sp.symbols("alpha th ph z t", real=True)

    # ---- (1) Faraday: curl E = -dB/dt for the R-mode pair ----------------
    phase = k * z - w * t
    Bvec = sp.Matrix([Bw * sp.cos(phase), -Bw * sp.sin(phase), 0])
    Ea = sp.symbols("Ea", real=True)  # unknown E amplitude
    Evec = sp.Matrix([Ea * sp.sin(phase), Ea * sp.cos(phase), 0])
    curlE = sp.Matrix([
        -sp.diff(Evec[1], z),          # (curl E)_x = dEz/dy - dEy/dz
        sp.diff(Evec[0], z),           # (curl E)_y = dEx/dz - dEz/dx
        0,
    ])
    sol = sp.solve(sp.simplify(curlE + sp.diff(Bvec, t)), Ea, dict=True)
    assert len(sol) == 1 and sp.simplify(sol[0][Ea] + (w / k) * Bw) == 0, sol
    Evec = Evec.subs(Ea, -(w / k) * Bw)
    print("(1) Faraday fixes Ew = -(w/k) Bw        OK")

    # ---- (2) pitch-angle equation of motion ------------------------------
    vvec = sp.Matrix([vperp * sp.cos(th), vperp * sp.sin(th), vpar])
    Btot = Bvec + sp.Matrix([0, 0, B0])
    force = -e * (Evec + vvec.cross(Btot))          # electron charge -e
    acc = force / m
    Ww = e * Bw / m

    # dvpar/dt and dvperp/dt (project transverse acceleration on vperp-hat)
    dvpar = sp.simplify(acc[2])
    dvperp = sp.simplify(acc[0] * sp.cos(th) + acc[1] * sp.sin(th))
    # The background-field gyration lives in the th-evolution, not here:
    # projecting -e v x B0 z on vperp-hat gives 0 (asserted implicitly by
    # the closed forms below containing only wave terms).
    dvpar_expect = Ww * vperp * sp.sin(th + phase)
    dvperp_expect = -Ww * (vpar - w / k) * sp.sin(th + phase)
    assert sp.simplify(dvpar - dvpar_expect) == 0
    assert sp.simplify(dvperp - dvperp_expect) == 0

    # alpha = atan(vperp/vpar):  v dalpha/dt = cos(a) dvperp - sin(a) dvpar
    sub = {vperp: v * sp.sin(alpha), vpar: v * sp.cos(alpha)}
    dalpha = sp.simplify(
        (sp.cos(alpha) * dvperp - sp.sin(alpha) * dvpar).subs(sub) / v
    )
    dalpha_expect = -Ww * (1 - (w / (k * v)) * sp.cos(alpha)) \
        * sp.sin(th + phase)
    assert sp.simplify(sp.expand_trig(dalpha - dalpha_expect)) == 0
    # speed equation:  v dv/dt = vpar dvpar + vperp dvperp
    dv = sp.simplify(
        (vpar * dvpar + vperp * dvperp).subs(sub) / v
    )
    dv_expect = Ww * (w / k) * sp.sin(alpha) * sp.sin(th + phase)
    assert sp.simplify(sp.expand_trig(dv - dv_expect)) == 0
    print("(2) dalpha/dt = -Ww (1 - w cos a/(k v)) sin Phi,")
    print("    dv/dt     =  Ww (w/k) sin a sin Phi   OK")

    # ---- (3) kick-direction relation (wave-frame energy conservation) ----
    da, dvs = sp.symbols("da dvs", real=True)     # dalpha, dv
    dvpar_k = sp.cos(alpha) * dvs - v * sp.sin(alpha) * da
    dvperp_k = sp.sin(alpha) * dvs + v * sp.cos(alpha) * da
    vph = w / k
    constraint = (v * sp.cos(alpha) - vph) * dvpar_k \
        + v * sp.sin(alpha) * dvperp_k
    ratio = sp.solve(constraint, dvs)[0] / (v * da)
    q = (vph / v) * sp.sin(alpha) / (1 - (vph / v) * sp.cos(alpha))
    assert sp.simplify(ratio + q) == 0                      # dv/(v da) = -q
    # ...and the SAME ratio from the Lorentz-force route of (2):
    assert sp.simplify(dv / (v * dalpha) + q) == 0
    print("(3) dv/(v dalpha) = -q, q = (w/(kv)) sin a / (1 - w cos a/(kv))")
    print("    (frame kinematics == Lorentz projection)   OK")

    # ---- (4) golden-rule Jacobian ----------------------------------------
    wc = sp.symbols("wc", positive=True)
    kf = sp.Function("kfun")
    g = w - kf(w) * vpar - wc
    dg = sp.diff(g, w)
    vg = 1 / sp.diff(kf(w), w)                     # group velocity dw/dk
    assert sp.simplify(dg - (1 - vpar / vg)) == 0
    print("(4) |d/dw (w - k(w) vpar - wc)| = |1 - vpar/vg|   OK")

    # ---- (5) L-mode (EMIC) pair: same forms, resonant phase th - ph ------
    Eb = sp.symbols("Eb", real=True)
    Bvec_l = sp.Matrix([Bw * sp.cos(phase), Bw * sp.sin(phase), 0])
    Evec_l = sp.Matrix([Eb * sp.sin(phase), -Eb * sp.cos(phase), 0])
    curlE_l = sp.Matrix([-sp.diff(Evec_l[1], z), sp.diff(Evec_l[0], z), 0])
    sol_l = sp.solve(sp.simplify(curlE_l + sp.diff(Bvec_l, t)), Eb,
                     dict=True)
    assert len(sol_l) == 1 and \
        sp.simplify(sol_l[0][Eb] - (w / k) * Bw) == 0, sol_l
    Evec_l = Evec_l.subs(Eb, (w / k) * Bw)

    force_l = -e * (Evec_l + vvec.cross(Bvec_l + sp.Matrix([0, 0, B0])))
    acc_l = force_l / m
    dvpar_l = sp.simplify(acc_l[2])
    dvperp_l = sp.simplify(acc_l[0] * sp.cos(th) + acc_l[1] * sp.sin(th))
    dalpha_l = sp.simplify(
        (sp.cos(alpha) * dvperp_l - sp.sin(alpha) * dvpar_l).subs(sub) / v
    )
    dv_l = sp.simplify((vpar * dvpar_l + vperp * dvperp_l).subs(sub) / v)
    # identical amplitude factor and speed kick, resonant phase th - phase
    dalpha_l_expect = -Ww * (1 - (w / (k * v)) * sp.cos(alpha)) \
        * sp.sin(th - phase)
    dv_l_expect = Ww * (w / k) * sp.sin(alpha) * sp.sin(th - phase)
    assert sp.simplify(sp.expand_trig(dalpha_l - dalpha_l_expect)) == 0
    assert sp.simplify(sp.expand_trig(dv_l - dv_l_expect)) == 0
    # same kick-direction ratio -> same q; only the resonance flips:
    # stationary (th - ph) => wc - (k vpar - w) = 0 => w - k vpar = -wc
    assert sp.simplify(dv_l / (v * dalpha_l) + q) == 0
    print("(5) L-mode pair: same amplitude factor and q; resonant phase")
    print("    th - ph  =>  w - k vpar = -wc (anomalous n = -1)   OK")

    print("\nAll five steps assert: D_aa = sum (pi/2) (e/(gamma m))^2 "
          "W(w_j) (1 - w_j cos a/(k_j v))^2 / |1 - vpar/vg_j|,")
    print("D_ap = -q p D_aa, D_pp = q^2 p^2 D_aa  (R- and L-mode pairs).")


if __name__ == "__main__":
    main()
