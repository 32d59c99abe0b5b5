"""Quasi-linear diffusion map: how fast the traced waves scatter electrons.

Renders the wave-particle endpoint of the framework (raytrace_tpu.diffusion,
the quasi-linear chain derived in tools/derive_diffusion.py and validated by
the test-particle Monte Carlo in tests/test_diffusion.py):

  (a) the local coefficients D_aa, |D_ap|/p, D_pp/p^2 vs pitch angle at the
      L = 4 equator for 100 keV electrons in a hiss-like band -- the
      resonance structure (roots entering/leaving the band) is visible as
      kinks, and D_ap^2 = D_aa D_pp per root bounds the mixed term;
  (b) the bounce-averaged <D_aa>(E, alpha_eq) map on the framework's own
      dipole + CA1992 medium at L = 4 -- the classic "surf plot" a
      radiation-belt diffusion code consumes, with the dipole loss cone
      marked;
  (c) resonance anatomy: the resonant frequencies w_j/2pi vs energy at the
      equator (alpha = 45 deg) against the band edges -- why the map's
      response is confined in energy;
  (d) weak-diffusion loss-cone lifetimes tau ~ 1/<D_aa>(a_LC) vs energy for
      L = 3, 4, 5 and the Bw^2 scaling (halving the wave amplitude
      quadruples every lifetime).

Writes examples/output/diffusion_map.png. Runs anywhere (CPU, ~40 s:
host-side numpy float64 diagnostics, no JIT).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import diffusion
    from raytrace_tpu.constants import FCE_E
    from raytrace_tpu.diffusion import WaveSpectrum
    from raytrace_tpu.models import make_env_lat, medium

    env = make_env_lat()
    l_shell = 4.0
    bm_eq = float(medium.b_mag(l_shell, 0.0, env))
    ne_eq = float(medium.ne_total_m3(l_shell, 0.0, env))
    fce_eq = FCE_E * bm_eq
    # hiss-like band pinned to the local gyrofrequency so the example is
    # meaningful whatever the medium: 0.05-0.5 fce, peak 0.15 fce, 100 pT
    spec = WaveSpectrum(bw_t=100e-12, f_m=0.15 * fce_eq, df=0.10 * fce_eq,
                        f_lc=0.05 * fce_eq, f_uc=0.50 * fce_eq)

    fig, axes = plt.subplots(1, 4, figsize=(19.5, 4.4))

    # (a) local coefficients vs pitch angle at the equator, 100 keV
    ax = axes[0]
    a = np.radians(np.linspace(1.0, 89.0, 353))
    c = diffusion.local_coefficients(100.0, a, bm_eq, ne_eq, spec)
    _, _, p = diffusion.kinematics(100.0)
    ax.semilogy(np.degrees(a), c["daa"], label=r"$D_{\alpha\alpha}$")
    ax.semilogy(np.degrees(a), np.abs(c["dap"]) / p, "--",
                label=r"$|D_{\alpha p}|/p$")
    ax.semilogy(np.degrees(a), c["dpp"] / p**2, ":", label=r"$D_{pp}/p^2$")
    ax.set_xlabel(r"local pitch angle $\alpha$ [deg]")
    ax.set_ylabel(r"D [s$^{-1}$]")
    ax.set_title(f"local coefficients, 100 keV\nL = {l_shell:g} equator, "
                 f"$B_w$ = 100 pT band")
    ax.legend()

    # (b) bounce-averaged <D_aa>(E, alpha_eq) map
    ax = axes[1]
    e_kev = np.geomspace(10.0, 2000.0, 44)
    aeq = np.radians(np.linspace(3.0, 89.0, 44))
    ee, aa = np.meshgrid(e_kev, aeq, indexing="ij")
    ba = diffusion.bounce_averaged(ee, aa, l_shell, env, spec, n_lat=48)
    daa = np.ma.masked_less_equal(ba["daa"], 0.0)
    pcm = ax.pcolormesh(np.degrees(aeq), e_kev, daa,
                        norm=mcolors.LogNorm(), shading="auto",
                        cmap="viridis")
    rl = 1.0 / l_shell
    a_lc = np.degrees(np.arcsin(np.sqrt(rl**3 / np.sqrt(4.0 - 3.0 * rl))))
    ax.axvline(a_lc, color="w", ls="--", lw=1.0)
    ax.text(a_lc + 1.5, e_kev[1], "loss cone", color="w", fontsize=8,
            rotation=90)
    ax.set_yscale("log")
    ax.set_xlabel(r"$\alpha_{eq}$ [deg]")
    ax.set_ylabel("E [keV]")
    ax.set_title(r"bounce-averaged $\langle D_{\alpha\alpha}\rangle$"
                 f" [rad$^2$/s], L = {l_shell:g}")
    fig.colorbar(pcm, ax=ax)

    # (c) resonance anatomy: root frequencies vs energy at alpha = 45 deg
    ax = axes[2]
    e_scan = np.geomspace(5.0, 5000.0, 300)
    roots = diffusion.resonant_roots(e_scan, np.radians(45.0), bm_eq, ne_eq,
                                     spec)
    for di, (lbl, color) in enumerate((("forward", "tab:blue"),
                                       ("backward", "tab:red"))):
        for j in range(roots["w"].shape[1]):
            fj = np.where(roots["valid"][di, j],
                          roots["w"][di, j] / (2 * np.pi), np.nan)
            ax.plot(e_scan, fj / 1e3, color=color, lw=1.2,
                    label=lbl if j == 0 else None)
    for f_edge, ls in ((spec.f_lc, ":"), (spec.f_m, "--"), (spec.f_uc, ":")):
        ax.axhline(f_edge / 1e3, color="k", ls=ls, lw=0.7)
    ax.set_xscale("log")
    ax.set_xlabel("E [keV]")
    ax.set_ylabel(r"resonant $f_j$ [kHz]")
    ax.set_title("cyclotron-resonance roots in the band\n"
                 r"$\alpha$ = 45$^\circ$ (dotted: band edges, dashed: peak)")
    ax.legend()

    # (d) loss-cone lifetimes vs energy, several L, and the Bw^2 scaling
    ax = axes[3]
    e_scan = np.geomspace(20.0, 2000.0, 60)
    for lsh, color in ((3.0, "tab:blue"), (4.0, "tab:orange"),
                       (5.0, "tab:green")):
        bm_l = float(medium.b_mag(lsh, 0.0, env))
        fce_l = FCE_E * bm_l
        spec_l = WaveSpectrum(bw_t=100e-12, f_m=0.15 * fce_l,
                              df=0.10 * fce_l, f_lc=0.05 * fce_l,
                              f_uc=0.50 * fce_l)
        tau = diffusion.loss_cone_lifetime_s(e_scan, lsh, env, spec_l,
                                             n_lat=48)
        ax.loglog(e_scan, tau / 86400.0, color=color, label=f"L = {lsh:g}")
        if lsh == 4.0:
            spec_h = WaveSpectrum(bw_t=50e-12, f_m=spec_l.f_m, df=spec_l.df,
                                  f_lc=spec_l.f_lc, f_uc=spec_l.f_uc)
            tau_h = diffusion.loss_cone_lifetime_s(e_scan, lsh, env, spec_h,
                                                   n_lat=48)
            ax.loglog(e_scan, tau_h / 86400.0, color=color, ls="--", lw=0.9,
                      label=r"L = 4, $B_w/2$ ($4\times\tau$)")
    ax.set_xlabel("E [keV]")
    ax.set_ylabel(r"$\tau \sim 1/\langle D_{\alpha\alpha}\rangle(a_{LC})$"
                  " [days]")
    ax.set_title("weak-diffusion loss-cone lifetime")
    ax.legend(fontsize=8)

    fig.tight_layout()
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "diffusion_map.png")
    fig.savefig(path, dpi=110)
    print("wrote", path)


if __name__ == "__main__":
    main()
