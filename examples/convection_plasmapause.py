"""The plasmapause DERIVED: convection drift physics reproduces the
empirical Kp relation the reference hardcodes.

The reference pins its plasmapause at Lppi = 5.6 - 0.46 Kp_max
(plasmasphere.jl:43) -- an empirical fit (Carpenter & Anderson 1992).
raytrace_tpu.convection derives that boundary from first principles on
the framework's own dipole: cold plasma E x B drifts along
equipotentials of corotation + Volland-Stern convection, and the last
closed equipotential through the dusk stagnation point separates
corotating (filled) from convecting (drained) flux tubes. This example
renders the whole story:

  (a) equatorial drift-path map at the canonical Kp_max = 3
      (plasmasphere.jl:42): closed paths inside, sunward convection
      outside, the derived teardrop plasmapause with its dusk bulge,
      and the CA1992 Lppi circle it reproduces;
  (b) storm erosion: the derived boundary at Kp = 1 vs Kp = 5;
  (c) the headline cross-check -- derived MLT-mean LCE radius vs the
      empirical 5.6 - 0.46 Kp line over the active range (the module
      never quotes that relation; tests pin the agreement to 5% at
      Kp = 3, 12% over Kp in [2, 6]);
  (d) energy-dependent Alfven layers for equatorial electrons: the
      last closed drift shell vs energy -- keV ring-current electrons
      have open dayside orbits where MeV radiation-belt electrons are
      trapped (the gradient drift closes their shells).

Writes examples/output/convection_plasmapause.png. CPU, ~30 s.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

KP_CANON = 3.0


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import convection as cv
    from raytrace_tpu.models.plasmasphere import lppi_from_kp

    os.makedirs(OUT, exist_ok=True)
    fig, axes = plt.subplots(2, 2, figsize=(12.5, 11))

    def xy(l, mlt):
        # sun to the right: x = L cos(mlt from noon), y toward dusk
        return l * np.cos(mlt), l * np.sin(mlt)

    # (a) drift-path map at Kp = 3
    ax = axes[0, 0]
    day = 2.0 * math.pi / cv.OMEGA_EARTH
    for l0 in (1.5, 2.2, 3.0, 3.8):
        tr = cv.trace_drift_path(l0, 0.0, KP_CANON, 1.05 * day,
                                 n_steps=4000)
        x, y = xy(tr["l"][:tr["n_valid"]], tr["mlt_rad"][:tr["n_valid"]])
        ax.plot(x, y, color="tab:blue", lw=0.9, alpha=0.8)
    for l0 in (6.5, 8.0):
        for mlt0 in (math.pi, 0.75 * math.pi, -0.75 * math.pi):
            tr = cv.trace_drift_path(l0, mlt0, KP_CANON, 3.0 * day,
                                     n_steps=6000)
            x, y = xy(tr["l"][:tr["n_valid"]],
                      tr["mlt_rad"][:tr["n_valid"]])
            ax.plot(x, y, color="tab:red", lw=0.9, alpha=0.7)
    pp = cv.plasmapause(KP_CANON, n_mlt=256)
    mlt_c = np.concatenate([pp["mlt_rad"], pp["mlt_rad"][:1]])
    l_c = np.concatenate([pp["l_pp"], pp["l_pp"][:1]])
    ax.plot(*xy(l_c, mlt_c), "k-", lw=2.2,
            label=f"derived plasmapause (LCE), mean L={pp['l_mean']:.2f}")
    th = np.linspace(0, 2 * math.pi, 200)
    lppi = lppi_from_kp(KP_CANON)
    ax.plot(lppi * np.cos(th), lppi * np.sin(th), "--", color="tab:green",
            lw=1.8, label=f"empirical CA1992 Lppi = {lppi:.2f}")
    ax.fill(np.cos(th), np.sin(th), color="0.6")
    l_s, _ = cv.stagnation_point(KP_CANON)
    ax.plot(*xy(np.array([l_s]), np.array([0.5 * math.pi])), "k*", ms=12,
            label="dusk stagnation point")
    ax.set_xlim(-9, 9); ax.set_ylim(-9, 9); ax.set_aspect("equal")
    ax.set_xlabel("x [RE]  (sun at right)"); ax.set_ylabel("y [RE]  (dusk up)")
    ax.set_title(f"(a) cold-plasma drift paths, Kp = {KP_CANON:.0f}\n"
                 "blue: corotating (closed)   red: convecting (open)")
    ax.legend(fontsize=8, loc="lower left")

    # (b) erosion: boundary vs Kp
    ax = axes[0, 1]
    for kp, color in ((1.0, "tab:blue"), (3.0, "tab:orange"),
                      (5.0, "tab:red")):
        pp = cv.plasmapause(kp, n_mlt=256)
        mlt_c = np.concatenate([pp["mlt_rad"], pp["mlt_rad"][:1]])
        l_c = np.concatenate([pp["l_pp"], pp["l_pp"][:1]])
        ax.plot(*xy(l_c, mlt_c), color=color, lw=2,
                label=f"Kp = {kp:.0f}: mean L = {pp['l_mean']:.2f}")
    ax.fill(np.cos(th), np.sin(th), color="0.6")
    ax.set_xlim(-10, 10); ax.set_ylim(-10, 10); ax.set_aspect("equal")
    ax.set_xlabel("x [RE]"); ax.set_ylabel("y [RE]")
    ax.set_title("(b) storm erosion of the derived plasmapause")
    ax.legend(fontsize=9)

    # (c) the cross-check: derived mean radius vs the empirical line
    ax = axes[1, 0]
    kps = np.linspace(1.0, 6.5, 23)
    derived = [cv.plasmapause(float(k))["l_mean"] for k in kps]
    ax.plot(kps, derived, "o-", color="tab:blue", ms=4,
            label="derived: MLT-mean last closed equipotential")
    ax.plot(kps, lppi_from_kp(kps), "--", color="tab:green", lw=2,
            label="empirical: 5.6 - 0.46 Kp (CA1992, plasmasphere.jl:43)")
    ax.fill_between(kps, lppi_from_kp(kps) * 0.88,
                    lppi_from_kp(kps) * 1.12, color="tab:green",
                    alpha=0.12, label="±12% (test bound, Kp ≥ 2)")
    ax.set_xlabel("Kp"); ax.set_ylabel("plasmapause L")
    ax.set_title("(c) the empirical Kp relation emerges from drift physics")
    ax.grid(alpha=0.3); ax.legend(fontsize=9)

    # (d) Alfven layers vs energy
    ax = axes[1, 1]
    e_kev = np.logspace(-1, 2.3, 16)
    al = cv.alfven_layer(e_kev, KP_CANON)
    ax.plot(e_kev, al["l_stag"], "o-", color="tab:red", ms=4,
            label="dusk stagnation radius")
    ax.plot(e_kev, al["l_mean"], "s-", color="tab:blue", ms=4,
            label="MLT-mean layer radius")
    ax.plot(e_kev, al["l_dawn"], "^-", color="tab:purple", ms=4,
            label="dawn constriction")
    ax.axhline(cv.plasmapause(KP_CANON)["l_stag"], color="0.4", ls=":",
               label="zero-energy limit (plasmapause)")
    ax.axhline(10.0, color="0.7", ls="--", lw=1)
    ax.text(0.12, 10.2, "~magnetopause: layers above = trapped everywhere",
            fontsize=8, color="0.4")
    ax.set_xscale("log"); ax.set_yscale("log")
    ax.set_xlabel("equatorial electron energy [keV]")
    ax.set_ylabel("last closed drift shell L")
    ax.set_title("(d) energy-dependent Alfven layers (electrons, Kp = 3)")
    ax.grid(alpha=0.3, which="both"); ax.legend(fontsize=9)

    fig.tight_layout()
    path = os.path.join(OUT, "convection_plasmapause.png")
    fig.savefig(path, dpi=110)
    print("wrote", path)


if __name__ == "__main__":
    main()
