"""Drift-averaging: the third adiabatic timescale closes the MLT axis.

Trapped electrons gradient-curvature drift eastward around Earth in
minutes-hours (raytrace_tpu.drift, derived from guiding-center theory on
the framework's own dipole and validated against a full-Lorentz Boris
push in tests/test_drift.py), sampling every MLT sector's wave
population once per orbit -- far faster than the days-long diffusion
the Fokker-Planck tier evolves. So the tensor that belongs in the
solvers is the DRIFT-ORBIT AVERAGE of per-sector bounce-averaged
tensors, not any single sector's. The classic consequence rendered
here: chorus is a dawn-sector phenomenon, so assuming its amplitude
around the whole orbit overestimates scattering by ~1/occupancy.

Panels:
  (a) drift period T_d(E, L) for equatorially-mirroring electrons --
      the timescale map itself (minutes at MeV, hours at 100 keV);
  (b) the emergent pitch-angle factor Omega_d(alpha_eq)/Omega_d(90) at
      1 MeV, L = 5, against Hamlin's classic 0.7 + 0.3 sin(alpha) fit
      (derived by the bounce average here, not quoted);
  (c) per-sector bounce-averaged <D_aa> at 1 MeV, L = 5: a strong dawn
      chorus sector (300 pT over 0.3 of the orbit) vs the quiet
      remainder (30 pT), and their drift average;
  (d) precipitation lifetimes vs energy from the drift-averaged tensor
      against the "dawn everywhere" overestimate -- the occupancy
      factor the MLT axis is worth.

Writes examples/output/drift_averaged_scattering.png. CPU, ~1 min.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

L_SHELL = 5.0
W_DAWN = 0.3                      # dawn-chorus occupancy of the orbit
BW_DAWN_PT = 300.0
BW_QUIET_PT = 30.0


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import diffusion, drift, fokker_planck as fp1
    from raytrace_tpu.diffusion import WaveSpectrum
    from raytrace_tpu.models import make_env, medium

    os.makedirs(OUT, exist_ok=True)
    env = make_env(b0=3.12e-5)

    # chorus band scaled to the local equatorial gyrofrequency
    from raytrace_tpu.constants import FCE_E
    fce = FCE_E * float(medium.b_mag(L_SHELL, 0.0, env))
    def band(bw_pt):
        return WaveSpectrum(bw_t=bw_pt * 1e-12, f_m=0.34 * fce,
                            df=0.15 * fce, f_lc=0.1 * fce, f_uc=0.65 * fce)

    fig, axes = plt.subplots(1, 4, figsize=(19, 4.2))

    # (a) drift-period map
    ax = axes[0]
    e_grid = np.geomspace(30.0, 5000.0, 48)
    l_grid = np.linspace(2.0, 6.5, 40)
    td = np.array([
        drift.drift_rate(e_grid, math.radians(85.0), L)["t_drift_s"]
        for L in l_grid
    ]) / 60.0                                         # (L, E) minutes
    pc = ax.pcolormesh(e_grid, l_grid, np.log10(td), shading="auto",
                       cmap="viridis")
    cs = ax.contour(e_grid, l_grid, td, levels=[10, 30, 60, 180, 600],
                    colors="w", linewidths=0.7)
    ax.clabel(cs, fmt=lambda v: f"{v:.0f} min", fontsize=7)
    fig.colorbar(pc, ax=ax, label=r"log$_{10}$ T$_d$ [min]")
    ax.set_xscale("log")
    ax.set_xlabel("E [keV]")
    ax.set_ylabel("L")
    ax.set_title("drift period (eq. mirroring)")

    # (b) emergent pitch-angle factor vs Hamlin
    ax = axes[1]
    a_deg = np.linspace(5.0, 89.0, 60)
    om = drift.drift_rate(1000.0, np.radians(a_deg), L_SHELL)["omega_d"]
    om90 = float(drift.drift_rate(1000.0, math.radians(89.99), L_SHELL)
                 ["omega_d"])
    ax.plot(a_deg, om / om90, lw=1.6, label="bounce average (this work)")
    ax.plot(a_deg, 0.7 + 0.3 * np.sin(np.radians(a_deg)), "k--", lw=1.0,
            label=r"Hamlin 0.7 + 0.3 sin$\alpha$")
    ax.set_xlabel(r"$\alpha_{eq}$ [deg]")
    ax.set_ylabel(r"$\Omega_d(\alpha)/\Omega_d(90^\circ)$")
    ax.legend(fontsize=8)
    ax.set_title("the pitch-angle factor is derived,\nnot quoted")

    # (c) per-sector <D_aa> and the drift average at 1 MeV
    ax = axes[2]
    rl = 1.0 / L_SHELL
    a_lc = math.asin(math.sqrt(rl**3 / math.sqrt(4.0 - 3.0 * rl)))
    centers, _, _ = fp1.make_grid(a_lc, 96)
    ba_dawn = diffusion.bounce_averaged(1000.0, centers, L_SHELL, env,
                                        band(BW_DAWN_PT), lat_cut_deg=15.0)
    ba_quiet = diffusion.bounce_averaged(1000.0, centers, L_SHELL, env,
                                         band(BW_QUIET_PT), lat_cut_deg=15.0)
    avg = drift.drift_average([ba_dawn, ba_quiet],
                              weights=[W_DAWN, 1.0 - W_DAWN])
    for d, lab, st in ((ba_dawn, f"dawn sector ({BW_DAWN_PT:.0f} pT)", "-"),
                       (ba_quiet, f"quiet sectors ({BW_QUIET_PT:.0f} pT)",
                        "-"),
                       (avg, "drift average", "--")):
        ax.semilogy(np.degrees(centers), np.maximum(d["daa"], 1e-12),
                    st, lw=1.5, label=lab)
    ax.axvline(math.degrees(a_lc), color="k", ls=":", lw=0.8)
    ax.set_ylim(1e-9, None)
    ax.set_xlabel(r"$\alpha_{eq}$ [deg]")
    ax.set_ylabel(r"$\langle D_{\alpha\alpha}\rangle$ [1/s]")
    ax.legend(fontsize=8)
    ax.set_title(f"1 MeV, L = {L_SHELL:g}")

    # (d) lifetimes: drift-averaged vs dawn-everywhere
    ax = axes[3]
    e_line = np.geomspace(100.0, 4000.0, 10)
    tau_avg, tau_dawn = [], []
    for e in e_line:
        bd = diffusion.bounce_averaged(float(e), centers, L_SHELL, env,
                                       band(BW_DAWN_PT), lat_cut_deg=15.0)
        bq = diffusion.bounce_averaged(float(e), centers, L_SHELL, env,
                                       band(BW_QUIET_PT), lat_cut_deg=15.0)
        da = drift.drift_average([bd, bq],
                                 weights=[W_DAWN, 1.0 - W_DAWN])["daa"]
        for tau_list, prof in ((tau_avg, da), (tau_dawn, bd["daa"])):
            dmax = prof.max()
            if dmax <= 0.0:
                tau_list.append(np.inf)
                continue
            prof_f = np.maximum(prof, 1e-8 * dmax)
            tau_list.append(float(fp1.precipitation_lifetime(
                prof_f, a_lc, n_cells=96)))
    tau_avg, tau_dawn = np.asarray(tau_avg), np.asarray(tau_dawn)
    ax.loglog(e_line, tau_avg / 86400.0, lw=1.6, label="drift-averaged")
    ax.loglog(e_line, tau_dawn / 86400.0, lw=1.2, ls="--",
              label="dawn band everywhere")
    ax.set_xlabel("E [keV]")
    ax.set_ylabel(r"$\tau$ [days]")
    ax.legend(fontsize=8)
    ratio = np.nanmedian(tau_avg / tau_dawn)
    ax.set_title(f"lifetimes: MLT axis is worth\n~{ratio:.1f}x "
                 f"(occupancy {W_DAWN:g})")

    fig.tight_layout()
    path = os.path.join(OUT, "drift_averaged_scattering.png")
    fig.savefig(path, dpi=110)
    print(f"T_d(1 MeV, L=5, eq) = "
          f"{float(drift.drift_rate(1000.0, math.radians(89.0), L_SHELL)['t_drift_s'])/60:.1f} min; "
          f"lifetime ratio drift-avg/dawn-everywhere = {ratio:.2f}")
    print("wrote", path)


if __name__ == "__main__":
    main()
