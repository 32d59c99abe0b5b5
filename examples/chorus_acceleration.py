"""Chorus acceleration: momentum diffusion building the MeV electron belt.

The classic local-acceleration result, computed end to end on the
framework's own physics: outside the plasmapause (L = 4.5 sits in the
CA1992 trough for the canonical Kp_max = 3 -- low density, high fce/fpe,
exactly the regime where whistler momentum diffusion is strong), a
lower-band chorus wave field energy-diffuses hundred-keV electrons into
the MeV range within a day or two.

Chain: diffusion.bounce_averaged_jax (the jittable chip path) evaluates
the FULL quasi-linear tensor <D_aa>, <D_ap>, <D_pp> on the solver's
(alpha_eq, p) grid -> fokker_planck_2d evolves the bounce-averaged 2D
diffusion equation (Crank-Nicolson, matrix-free CG) with an absorbing
loss cone.

  (a) the drive: <D_pp>/p^2 map over (E, alpha_eq) -- momentum diffusion
      peaks for near-equatorially-mirroring electrons at a few hundred keV;
  (b) f(E) at alpha_eq = 80 deg through time: the exponential seed
      population grows a relativistic tail -- orders of magnitude at MeV
      energies while the bulk barely moves;
  (c) PSD vs time at three energies (the storm-recovery "flux ramp");
  (d) f(alpha_eq) at 1 MeV: acceleration + loss-cone scattering sculpt
      the pancake distribution.

Runs on either backend: float64 on CPU, float32 on the chip (the 1440-step
f32 CN evolution matches the f64 oracle to ~4e-4 median relative error;
the tensor itself demands momentum_units='mc' on f32 -- SI momentum
underflows the D_pp channel). Writes
examples/output/chorus_acceleration.png. ~2 min.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

L_SHELL = 4.5
BW_PT = 100.0             # chorus RMS amplitude, pT
T_DAYS = 2.0
DT_S = 120.0
N_A, N_P = 48, 56


def main():
    import functools

    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import diffusion, fokker_planck_2d as fp2
    from raytrace_tpu.constants import FCE_E
    from raytrace_tpu.diffusion import WaveSpectrum
    from raytrace_tpu.models import make_env_lat, medium

    os.makedirs(OUT, exist_ok=True)

    env = make_env_lat()
    bm_eq = float(medium.b_mag(L_SHELL, 0.0, env))
    ne_eq = float(medium.ne_total_m3(L_SHELL, 0.0, env))
    fce = FCE_E * bm_eq
    fpe = 8.98 * math.sqrt(ne_eq * 1e-6) * 1e3 * 1.0  # Hz (sqrt(ne/cm3))
    print(f"L = {L_SHELL}: fce = {fce/1e3:.2f} kHz, "
          f"ne = {ne_eq/1e6:.1f} cm^-3, fpe/fce = {fpe/fce:.2f} (trough)")

    # lower-band chorus, equatorially confined
    spec = WaveSpectrum(bw_t=BW_PT * 1e-12, f_m=0.30 * fce, df=0.10 * fce,
                        f_lc=0.10 * fce, f_uc=0.45 * fce)

    # loss cone at L, 100 km absorption altitude ~ r_loss = 1
    rl = 1.0 / L_SHELL
    a_lc = math.asin(math.sqrt(rl**3 / math.sqrt(4.0 - 3.0 * rl)))

    grid = fp2.make_grid_2d(a_lc, N_A, fp2.p_from_energy(30.0),
                            fp2.p_from_energy(6000.0), N_P)
    e_c = fp2.energy_from_p(grid.p_c)                   # keV at p centers

    # full tensor on the solver grid via the jittable chip path, directly
    # in solver units (p in m_e c -- mandatory on f32 chips, where SI
    # momentum underflows the D_pp channel)
    ba_fn = jax.jit(functools.partial(
        diffusion.bounce_averaged_jax, l_shell=L_SHELL, env=env, spec=spec,
        lat_cut_deg=15.0, n_lat=32, n_grid=256, n_bisect=26,
        momentum_units="mc"))
    ba = ba_fn(jnp.asarray(e_c)[None, :], jnp.asarray(grid.alpha_c)[:, None])
    daa, dap, dpp = (np.asarray(ba[k], np.float64)
                     for k in ("daa", "dap", "dpp"))

    op = fp2.make_operator_2d(grid, daa, dap, dpp)

    # seed: soft exponential spectrum, isotropic outside the loss cone
    e0 = 150.0                                          # keV e-folding
    f0 = np.exp(-e_c[None, :] / e0) * np.ones((N_A, 1))
    f0 = jnp.asarray(f0)

    n_steps = int(T_DAYS * 86400.0 / DT_S)
    save_every = n_steps // 8
    f_end, snaps = fp2.evolve_cn_2d(f0, op, DT_S, n_steps,
                                    save_every=save_every)
    snaps = np.asarray(snaps)                           # (8, N_A, N_P)
    t_snap = (np.arange(1, snaps.shape[0] + 1)) * save_every * DT_S

    i80 = int(np.argmin(np.abs(grid.alpha_c - math.radians(80.0))))
    j1mev = int(np.argmin(np.abs(e_c - 1000.0)))

    fig, axes = plt.subplots(1, 4, figsize=(19, 4.4))

    ax = axes[0]
    dppn = np.where(dpp > 0, dpp, np.nan) / grid.p_c[None, :] ** 2
    pc = ax.pcolormesh(e_c / 1e3, np.degrees(grid.alpha_c),
                       np.log10(dppn), shading="auto", cmap="viridis")
    fig.colorbar(pc, ax=ax, label=r"log$_{10}$ $\langle D_{pp}\rangle/p^2$"
                 " [1/s]")
    ax.set_xscale("log")
    ax.set_xlabel("E [MeV]")
    ax.set_ylabel(r"$\alpha_{eq}$ [deg]")
    ax.set_title(f"momentum diffusion drive\nL = {L_SHELL}, "
                 f"{BW_PT:.0f} pT lower-band chorus")

    ax = axes[1]
    cmap = plt.cm.magma
    ax.semilogy(e_c / 1e3, np.asarray(f0)[i80], "k--", lw=1.2, label="t = 0")
    for s in range(snaps.shape[0]):
        ax.semilogy(e_c / 1e3, np.maximum(snaps[s, i80], 1e-30),
                    color=cmap(0.15 + 0.75 * s / (snaps.shape[0] - 1)),
                    lw=1.0,
                    label=(f"{t_snap[s]/86400:.2f} d"
                           if s in (0, snaps.shape[0] - 1) else None))
    ax.set_xscale("log")
    ax.set_ylim(1e-9, 2.0)
    ax.set_xlabel("E [MeV]")
    ax.set_ylabel(r"f($\alpha_{eq}$=80$^\circ$) [arb]")
    ax.legend(fontsize=8)
    ax.set_title("the relativistic tail grows\n(bulk at 100 keV barely moves)")

    ax = axes[2]
    for e_probe in (300.0, 1000.0, 3000.0):
        j = int(np.argmin(np.abs(e_c - e_probe)))
        psd = np.concatenate([[np.asarray(f0)[i80, j]], snaps[:, i80, j]])
        tt = np.concatenate([[0.0], t_snap]) / 86400.0
        ax.semilogy(tt, np.maximum(psd, 1e-30), "o-", ms=3,
                    label=f"{e_c[j]/1e3:.1f} MeV")
    ax.set_xlabel("t [days]")
    ax.set_ylabel(r"f at $\alpha_{eq}$=80$^\circ$")
    ax.legend(fontsize=8)
    ax.set_title("PSD ramp at fixed energy\n(the storm-recovery signature)")

    ax = axes[3]
    for s in (0, 3, snaps.shape[0] - 1):
        ax.semilogy(np.degrees(grid.alpha_c),
                    np.maximum(snaps[s, :, j1mev], 1e-30),
                    label=f"{t_snap[s]/86400:.2f} d")
    ax.axvline(math.degrees(a_lc), color="k", ls=":", lw=0.8)
    ax.set_xlabel(r"$\alpha_{eq}$ [deg]")
    ax.set_ylabel("f at 1 MeV")
    ax.legend(fontsize=8)
    ax.set_title("pitch-angle shape at 1 MeV\n(pancake + loss-cone drain)")

    fig.tight_layout()
    path = os.path.join(OUT, "chorus_acceleration.png")
    fig.savefig(path, dpi=110)
    for e_probe in (1000.0, 3000.0):
        j = int(np.argmin(np.abs(e_c - e_probe)))
        gain = float(snaps[-1, i80, j]
                     / max(float(np.asarray(f0)[i80, j]), 1e-300))
        print(f"{e_c[j]/1e3:.1f} MeV PSD gain over {T_DAYS:.0f} days: "
              f"{gain:.3g}x")
    print("wrote", path)


if __name__ == "__main__":
    main()
