"""Kennel-Petschek whistler amplification: where and at what frequency.

Renders the quantitative growth/damping physics of raytrace_tpu.growth
(hot bi-Maxwellian susceptibility derived in tools/derive_growth.py):

  (a) the equatorial gain spectrum gamma(f) at L = 4 for several
      anisotropies -- growth below the KP cutoff fce * A/(1+A), cyclotron
      damping above, the peak sliding with A;
  (b) gamma along the L = 4 field line at fixed f: amplification is
      confined to ~15-20 degrees around the magnetic equator, where the
      resonant-electron energy dips into the hot population;
  (c) cumulative amplitude gain along a real traced (unducted) ray --
      anisotropic vs isotropic hot population. The unducted ray crosses
      the equator at r ~ 1.2 RE where 4 kHz resonates only with ~MeV
      electrons, so its net gain is tiny: the classic argument for why
      observable whistler amplification requires DUCTED paths that hold
      the wave near the high-L equator (panel b's window);
  (d) the EMIC counterpart (gamma_emic, the '-' root the framework also
      traces): proton-cyclotron growth below fci driven by hot
      anisotropic ring-current protons, same KP threshold structure at
      f_c = fci * A/(1+A).

Writes examples/output/growth_gain.png. Runs anywhere (CPU ~30 s).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu.constants import FCE_E, FCE_P, RE
    from raytrace_tpu.growth import (
        HotElectrons, HotProtons, equatorial_gain_profile, gamma_emic,
        gamma_whistler, path_gain,
    )
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import make_env_lat, medium
    from raytrace_tpu.ops import rhs

    env = make_env_lat()
    fig, axes = plt.subplots(1, 4, figsize=(19.5, 4.6))

    # (a) equatorial spectrum at L = 4
    ax = axes[0]
    f = np.linspace(300.0, 13000.0, 400)
    for a_val, color in ((0.5, "tab:blue"), (1.0, "tab:orange"),
                         (2.0, "tab:green")):
        hot = HotElectrons(eta=1e-3, t_par_ev=25e3, anisotropy=a_val)
        prof = equatorial_gain_profile(4.0, f, env, hot)
        ax.plot(f / 1e3, prof["gamma"], color=color, label=f"A = {a_val}")
        ax.axvline(prof["f_cutoff"][0] / 1e3, color=color, ls=":", lw=0.8)
    ax.axhline(0.0, color="k", lw=0.6)
    ax.set_xlabel("f [kHz]")
    ax.set_ylabel(r"$\gamma$ [rad/s]")
    ax.set_title("equatorial growth spectrum, L = 4\n"
                 r"($\eta$ = 1e-3, $T_\parallel$ = 25 keV; dotted: KP "
                 r"cutoff $f_{ce}A/(1{+}A)$)")
    ax.legend()

    # (b) field-line profile at fixed f
    ax = axes[1]
    lat = np.radians(np.linspace(-40.0, 40.0, 401))
    r = 4.0 * np.cos(lat) ** 2
    bm = np.asarray(medium.b_mag(r, np.abs(lat), env), np.float64)
    ne = np.asarray(medium.ne_total_m3(r, np.abs(lat), env), np.float64)
    fce_eq = FCE_E * bm[200]
    for frac, color in ((0.1, "tab:blue"), (0.2, "tab:orange"),
                        (0.35, "tab:green")):
        hot = HotElectrons(eta=1e-3, t_par_ev=25e3, anisotropy=1.0)
        gam = gamma_whistler(np.full_like(bm, frac * fce_eq), bm, ne, hot)
        ax.plot(np.degrees(lat), gam, color=color,
                label=f"f = {frac:.2f} " + r"$f_{ce,eq}$")
    ax.axhline(0.0, color="k", lw=0.6)
    ax.set_xlabel("magnetic latitude [deg]")
    ax.set_ylabel(r"$\gamma$ [rad/s]")
    ax.set_title("equatorial confinement along L = 4\n"
                 "(growth window where $E_{res}$ dips into the "
                 "hot population)")
    ax.legend()

    # (c) cumulative gain along a traced unducted ray
    ax = axes[2]
    u0 = jnp.array([[(RE + 1e6) / RE, np.radians(58.0), 0.0, 0.0]])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, jnp.array([4000.0]),
        cfg=SolverConfig(rtol=1e-5, atol=1e-9, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=3e9 / RE), max_steps=8192,
        save_every=8,
    )
    traj = np.asarray(res.traj["u"])
    for a_val, color, lbl in (
        (1.0, "tab:orange", "A = 1 (anisotropic)"),
        (0.0, "tab:gray", "A = 0 (isotropic: damping)"),
    ):
        hot = HotElectrons(eta=1e-3, t_par_ev=25e3, anisotropy=a_val)
        g = path_gain(traj, 4000.0, env, hot)
        t = g["t"][:, 0]
        keep = np.concatenate([[True], np.diff(t) > 0.0])
        ax.plot(t[keep], g["gain_db"][keep, 0] * 1e6, color=color, label=lbl)
    ax.axhline(0.0, color="k", lw=0.6)
    ax.set_xlabel("group time [s]")
    ax.set_ylabel(r"cumulative gain [$\mu$dB]")
    ax.set_title("gain along a traced UNDUCTED ray\n"
                 "(launch 58$^\\circ$, 4 kHz: equator pass at r ~ 1.2,\n"
                 "no resonant overlap -- the case for ducted paths)")
    ax.legend()

    # (d) EMIC spectrum at L = 4 (hot ring-current protons)
    ax = axes[3]
    lat_eq = np.zeros(1)
    bm_eq = float(np.asarray(medium.b_mag(np.array([4.0]), lat_eq, env))[0])
    ne_eq = float(
        np.asarray(medium.ne_total_m3(np.array([4.0]), lat_eq, env))[0]
    )
    fci = FCE_P * bm_eq
    f_emic = np.linspace(0.02 * fci, 0.98 * fci, 400)
    for a_val, color in ((0.5, "tab:blue"), (1.0, "tab:orange"),
                         (2.0, "tab:green")):
        hotp = HotProtons(eta=1e-3, t_par_ev=30e3, anisotropy=a_val)
        gam = gamma_emic(f_emic, bm_eq, ne_eq, hotp)
        ax.plot(f_emic, gam, color=color, label=f"$A_p$ = {a_val}")
        ax.axvline(fci * a_val / (1 + a_val), color=color, ls=":", lw=0.8)
    ax.axhline(0.0, color="k", lw=0.6)
    ax.set_xlabel("f [Hz]")
    ax.set_ylabel(r"$\gamma$ [rad/s]")
    ax.set_title("EMIC growth spectrum, L = 4\n"
                 r"(hot protons, $T_\parallel$ = 30 keV; "
                 f"$f_{{ci}}$ = {fci:.1f} Hz)")
    ax.legend()

    fig.tight_layout()
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "growth_gain.png")
    fig.savefig(path, dpi=110)
    print("wrote", path)

    # second figure: the classic KP map -- single-transit gain over
    # (L, f/fce_eq). Shows where in the magnetosphere which band
    # amplifies: the plasmapause (Lppo ~ 4.6 here) prints directly into
    # the map through the density jump, and the band tops out at the
    # equatorial KP cutoff f = fce_eq/2 for A = 1.
    from raytrace_tpu.growth import transit_gain_db

    fig2, ax = plt.subplots(figsize=(7.2, 5.0))
    l_grid = np.linspace(2.0, 6.5, 46)
    frac_grid = np.linspace(0.02, 0.7, 35)
    hot = HotElectrons(eta=1e-3, t_par_ev=25e3, anisotropy=1.0)
    gain = np.zeros((frac_grid.size, l_grid.size))
    for j, L in enumerate(l_grid):
        bm_e = float(np.asarray(
            medium.b_mag(np.array([L]), np.zeros(1), env))[0])
        gain[:, j] = transit_gain_db(
            L, frac_grid * FCE_E * bm_e, env, hot, n_lat=151
        )
    pos = np.ma.masked_less_equal(gain, 0.0)
    pc = ax.pcolormesh(l_grid, frac_grid, np.log10(pos),
                       cmap="viridis", shading="auto",
                       vmin=-2.0, vmax=3.2)
    fig2.colorbar(pc, ax=ax, label=r"log$_{10}$ single-transit gain [dB]")
    ax.contour(l_grid, frac_grid, gain, levels=[0.0], colors="w",
               linewidths=0.8)
    ax.axhline(0.5, color="r", ls=":", lw=0.9)
    ax.text(2.1, 0.515, "equatorial KP cutoff  $f_{ce,eq}A/(1{+}A)$",
            color="r", fontsize=8)
    ax.set_xlabel("L shell")
    ax.set_ylabel(r"f / $f_{ce,eq}$")
    ax.set_title("single-transit KP gain map "
                 r"($\eta$ = 1e-3, $T_\parallel$ = 25 keV, A = 1)"
                 "\nwhite contour: zero gain; damped region masked")
    fig2.tight_layout()
    path2 = os.path.join(OUT, "growth_gain_map.png")
    fig2.savefig(path2, dpi=110)
    print("wrote", path2)


if __name__ == "__main__":
    main()
