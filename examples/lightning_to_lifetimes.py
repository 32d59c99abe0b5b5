"""Lightning to lifetimes: the full mission pipeline in one figure.

Every tier of the framework chained end to end, the workflow whistler ray
tracing exists to serve (the reference's own stated aim, README.md:2-6, and
its lineage -- Bortnik's thesis, RayTrace_3D.jl:5, studies exactly this
chain for lightning-induced electron precipitation):

  1. TRACE   a fan of lightning-launched whistlers (lat x frequency grid)
             through the ionosphere + CA1992 plasmasphere; the traced
             paths themselves pick the wave-particle interaction region --
             unducted rays collapse inward and cross the magnetic equator
             near L ~ 1.6 regardless of launch latitude;
  2. AMPLIFY each ray through a hot anisotropic electron population:
             path-integrated Kennel-Petschek gain on the ray's own
             group-delay channel (growth.path_gain), evaluated AT each
             ray's equator-crossing snapshot (gain acquired after the
             crossing cannot feed it). The 43-53 deg launches sweep the
             outer L ~ 6-9 trough on their way up, where 3-6 kHz sits
             inside the KP growth window -- several dB of real gain,
             unlike the purely inner paths of examples/growth_gain.py;
  3. SPECTRUM collapse the rays crossing the measured interaction shell
             into an equivalent truncated-Gaussian band, power-weighted by
             the amplified amplitudes (diffusion.spectrum_from_rays);
  4. SCATTER  quasi-linear bounce-averaged <D_aa>(E, alpha_eq) from that
             band on the same medium (diffusion.bounce_averaged). At
             L ~ 1.6 the 3-6 kHz band sits at f/fce ~ 0.02, so the
             resonant electrons are MULTI-MeV -- the framework reproduces
             the textbook result that lightning whistlers scatter
             inner-belt relativistic electrons;
  5. PRECIPITATE precipitation lifetimes vs energy
             (fokker_planck.precipitation_lifetime) against the
             weak-diffusion estimate.

Panels: (a) the traced fan over the dipole field lines with the equator
crossings marked; (b) per-ray net gain and the moment-matched band it
feeds; (c) <D_aa>(alpha_eq) at three relativistic energies; (d)
precipitation lifetime vs energy.

Writes examples/output/lightning_to_lifetimes.png. CPU ~4 min.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

SEED_PT = 5.0            # seed wave amplitude entering the magnetosphere, pT


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import diffusion, fokker_planck as fp
    from raytrace_tpu.constants import FCE_E, RE
    from raytrace_tpu.growth import HotElectrons, path_gain
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import make_env_lat, medium
    from raytrace_tpu.ops import rhs

    os.makedirs(OUT, exist_ok=True)

    # ---- 1. trace the fan --------------------------------------------------
    env = make_env_lat()
    lats = np.linspace(0.76, 0.92, 5)
    freqs = np.array([3000.0, 4000.0, 5000.0, 6000.0])
    lat_g, f_g = np.meshgrid(lats, freqs, indexing="ij")
    lat_g, f_g = lat_g.ravel(), f_g.ravel()
    n = lat_g.size
    u0 = np.zeros((n, 4))
    u0[:, 0] = (RE + 1.0e6) / RE
    u0[:, 1] = lat_g
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f_g,
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
        max_steps=20000, save_every=25,
    )
    traj = np.asarray(res.traj["u"])            # (S, n, 4)
    st_t = np.asarray(res.traj["status"])

    # ---- 2. amplify along each ray -----------------------------------------
    hot = HotElectrons(eta=1e-3, t_par_ev=25e3, anisotropy=1.0)
    g = path_gain(traj, f_g, env, hot)

    # equator crossing per ray: snapshot of minimum |lat| while in flight
    inflight = st_t <= 1
    lat_abs = np.where(inflight, np.abs(traj[..., 1]), np.inf)
    i_eq = lat_abs.argmin(axis=0)
    r_eq = traj[i_eq, np.arange(n), 0]
    lat_eq = traj[i_eq, np.arange(n), 1]
    l_eq = r_eq / np.cos(lat_eq) ** 2
    crossed = lat_abs.min(axis=0) < 0.05
    # gain accumulated UP TO the crossing -- what the crossing wave carries
    gain_eq = g["gain_neper"][i_eq, np.arange(n)]

    # ---- 3. the rays themselves pick the interaction shell ----------------
    l_star = float(np.median(l_eq[crossed]))
    in_shell = crossed & (np.abs(l_eq - l_star) < 0.15)
    bw_ray = SEED_PT * 1e-12 * np.exp(np.clip(gain_eq, -20.0, 10.0))
    spec = diffusion.spectrum_from_rays(f_g[in_shell], bw_ray[in_shell])
    bm_eq = float(medium.b_mag(l_star, 0.0, env))
    fce_eq = FCE_E * bm_eq
    print(f"{in_shell.sum()}/{n} rays cross within 0.15 L of the median "
          f"shell L = {l_star:.2f}; band f_m = {spec.f_m:.0f} Hz "
          f"(f/fce = {spec.f_m/fce_eq:.3f}), Bw = {spec.bw_t*1e12:.1f} pT")

    # ---- 4. + 5. scattering and lifetimes at the measured shell -----------
    rl = 1.0 / l_star
    a_lc = math.asin(math.sqrt(rl**3 / math.sqrt(4.0 - 3.0 * rl)))
    nc = 96
    centers, _, _ = fp.make_grid(a_lc, nc)
    e_three = np.array([1000.0, 2500.0, 5000.0])        # keV
    ba3 = diffusion.bounce_averaged(e_three[:, None], centers[None, :],
                                    l_star, env, spec, n_lat=32,
                                    n_grid=256, n_bisect=24)
    daa3 = np.asarray(ba3["daa"], np.float64)

    e_scan = np.geomspace(500.0, 10000.0, 12)           # 0.5 - 10 MeV
    ba_e = diffusion.bounce_averaged(e_scan[:, None], centers[None, :],
                                     l_star, env, spec, n_lat=32,
                                     n_grid=256, n_bisect=24)
    daa_e = np.asarray(ba_e["daa"], np.float64)
    dmax = daa_e.max(axis=1, keepdims=True)
    has_wave = dmax[:, 0] > 0.0
    daa_e = np.maximum(daa_e, 1e-8 * np.where(dmax > 0, dmax, 1.0))
    tau_e = np.asarray(fp.precipitation_lifetime(jnp.asarray(daa_e), a_lc,
                                                 n_cells=nc))
    tau_weak = np.asarray(diffusion.loss_cone_lifetime_s(
        e_scan, l_star, env, spec, n_lat=32, n_grid=256, n_bisect=24))

    # ---- figure -------------------------------------------------------------
    fig, axes = plt.subplots(1, 4, figsize=(19.5, 4.6))

    ax = axes[0]
    lat_line = np.linspace(-np.pi / 2, np.pi / 2, 200)
    for L in (1.5, 2.0, 2.6, 3.5):
        ax.plot(L * np.cos(lat_line) ** 3,
                L * np.cos(lat_line) ** 2 * np.sin(lat_line),
                color="0.85", lw=0.7, zorder=0)
    th = np.linspace(0, 2 * np.pi, 180)
    ax.fill(np.cos(th), np.sin(th), color="0.6", zorder=1)
    cmap = plt.cm.plasma
    for b in range(n):
        alive = st_t[:, b] <= 1
        r, la = traj[alive, b, 0], traj[alive, b, 1]
        ax.plot(r * np.cos(la), r * np.sin(la), lw=0.7,
                color=cmap((f_g[b] - 3000.0) / 3000.0), zorder=2)
    ax.plot(r_eq[crossed] * np.cos(lat_eq[crossed]),
            r_eq[crossed] * np.sin(lat_eq[crossed]), "k.", ms=5, zorder=3,
            label="equator crossings")
    ax.set_xlim(0, 3.4)
    ax.set_ylim(-2.0, 2.4)
    ax.set_aspect("equal")
    ax.set_xlabel("x [RE]")
    ax.set_ylabel("y [RE]")
    ax.legend(fontsize=8, loc="lower right")
    ax.set_title("1. traced fan (3-6 kHz, colored by f)\n"
                 f"crossings cluster at L = {l_star:.2f}")

    ax = axes[1]
    ax.scatter(f_g[crossed] / 1e3, 8.686 * gain_eq[crossed],
               c=np.where(in_shell[crossed], 1.0, 0.0), cmap="coolwarm",
               s=18, vmin=0, vmax=1)
    ax.axhline(0.0, color="k", lw=0.6)
    ax.set_xlabel("f [kHz]")
    ax.set_ylabel("gain at the crossing [dB]")
    ax2 = ax.twinx()
    f_ax = np.linspace(spec.f_lc, spec.f_uc, 400)
    ax2.plot(f_ax / 1e3,
             spec.power_density(2 * math.pi * f_ax) * 2 * math.pi * 1e24,
             color="tab:green", lw=1.2)
    ax2.set_ylabel(r"W(f) [pT$^2$/Hz]", color="tab:green")
    ax.set_title("2.-3. KP gain from the outer-L path segment\n"
                 "-> moment-matched band "
                 f"(Bw = {spec.bw_t*1e12:.1f} pT)")

    ax = axes[2]
    for i, e in enumerate(e_three):
        ax.semilogy(np.degrees(centers), np.maximum(daa3[i], 1e-14),
                    label=f"{e/1000:g} MeV")
    ax.axvline(np.degrees(a_lc), color="k", ls="--", lw=0.8)
    ax.set_ylim(1e-12, None)
    ax.set_xlabel(r"$\alpha_{eq}$ [deg]")
    ax.set_ylabel(r"$\langle D_{\alpha\alpha}\rangle$ [rad$^2$/s]")
    ax.set_title(f"4. bounce-averaged scattering, L = {l_star:.2f}\n"
                 r"(f/fce ~ 0.02 $\Rightarrow$ resonant electrons are "
                 "multi-MeV)")
    ax.legend(fontsize=8)

    ax = axes[3]
    ax.loglog(e_scan[has_wave] / 1e3, tau_e[has_wave] / 86400.0, "o-",
              ms=3, label=r"eigen $\tau = 1/\lambda_1$")
    ax.loglog(e_scan / 1e3, tau_weak / 86400.0, "s--", ms=3,
              label=r"weak-diffusion $1/\langle D\rangle(a_{LC})$")
    ax.set_xlabel("E [MeV]")
    ax.set_ylabel(r"$\tau$ [days]")
    ax.set_title("5. precipitation lifetime at the crossing shell\n"
                 "(lightning-induced relativistic-electron loss)")
    ax.legend(fontsize=8)

    fig.tight_layout()
    path = os.path.join(OUT, "lightning_to_lifetimes.png")
    fig.savefig(path, dpi=110)
    print("wrote", path)


if __name__ == "__main__":
    main()
