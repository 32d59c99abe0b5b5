"""Acceleration vs loss: chorus and EMIC waves competing over the MeV belt.

The modern radiation-belt dynamics picture, end to end on the framework's
own physics: at one trough L-shell, lower-band chorus momentum-diffuses
hundred-keV electrons up to MeV (examples/chorus_acceleration.py), while
H-band EMIC waves -- seen by electrons through the anomalous n = -1
resonance (diffusion mode='emic', derived in tools/derive_diffusion.py
step 5) -- scatter precisely the multi-MeV, low-pitch-angle population
into the loss cone. Quasi-linear tensors are additive, so the combined
drive is just the SUM of the two bounce-averaged tensors (each PSD, so
the sum is PSD and the 2D solver's split scheme applies unchanged).

  (a) where each wave acts: bounce-averaged D_aa at 55 deg vs energy for
      chorus, EMIC, and the sum -- chorus owns the sub-MeV band, EMIC
      switches on above its relativistic threshold;
  (b) f(E) at alpha_eq = 80 deg after 2 days, chorus-only vs combined:
      the accelerated tail survives near 90 deg (EMIC cannot reach
      near-equatorial mirrors) but is capped at mid pitch angles;
  (c) pitch-angle profiles at 3 MeV: EMIC carves the classic loss-cone-
      widened "top-hat" out of the chorus-built pancake;
  (d) trapped >1 MeV content vs time for the two runs -- net belt
      building slows when the loss channel opens.

Writes examples/output/belt_competition.png. ~3 min.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

L_SHELL = 4.5
BW_CHORUS_PT = 100.0
BW_EMIC_NT = 1.0              # storm-time EMIC, ~nT class
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
    fce = FCE_E * bm_eq
    fcp = fce / 1836.15267
    chorus = WaveSpectrum(bw_t=BW_CHORUS_PT * 1e-12, f_m=0.30 * fce,
                          df=0.10 * fce, f_lc=0.10 * fce, f_uc=0.45 * fce)
    emic = WaveSpectrum(bw_t=BW_EMIC_NT * 1e-9, f_m=0.6 * fcp,
                        df=0.25 * fcp, f_lc=0.3 * fcp, f_uc=0.95 * fcp)
    print(f"L = {L_SHELL}: fce = {fce/1e3:.2f} kHz, fcp = {fcp:.1f} Hz")

    rl = 1.0 / L_SHELL
    a_lc = math.asin(math.sqrt(rl**3 / math.sqrt(4.0 - 3.0 * rl)))
    grid = fp2.make_grid_2d(a_lc, N_A, fp2.p_from_energy(30.0),
                            fp2.p_from_energy(6000.0), N_P)
    e_c = fp2.energy_from_p(grid.p_c)

    def tensor(spec, mode, lat_cut):
        fn = jax.jit(functools.partial(
            diffusion.bounce_averaged_jax, l_shell=L_SHELL, env=env,
            spec=spec, lat_cut_deg=lat_cut, n_lat=32, n_grid=256,
            n_bisect=26, momentum_units="mc", mode=mode))
        ba = fn(jnp.asarray(e_c)[None, :], jnp.asarray(grid.alpha_c)[:, None])
        return tuple(np.asarray(ba[k], np.float64)
                     for k in ("daa", "dap", "dpp"))

    t_ch = tensor(chorus, "whistler", 15.0)
    t_em = tensor(emic, "emic", 20.0)
    t_sum = tuple(a + b for a, b in zip(t_ch, t_em))

    op_ch = fp2.make_operator_2d(grid, *t_ch)
    op_sum = fp2.make_operator_2d(grid, *t_sum)

    f0 = jnp.asarray(np.exp(-e_c[None, :] / 150.0) * np.ones((N_A, 1)))
    n_steps = int(T_DAYS * 86400.0 / DT_S)
    save_every = n_steps // 8
    _, snap_ch = fp2.evolve_cn_2d(f0, op_ch, DT_S, n_steps,
                                  save_every=save_every)
    _, snap_sum = fp2.evolve_cn_2d(f0, op_sum, DT_S, n_steps,
                                   save_every=save_every)
    snap_ch = np.asarray(snap_ch)
    snap_sum = np.asarray(snap_sum)
    t_snap = np.arange(1, snap_ch.shape[0] + 1) * save_every * DT_S

    i80 = int(np.argmin(np.abs(grid.alpha_c - math.radians(80.0))))
    i55 = int(np.argmin(np.abs(grid.alpha_c - math.radians(55.0))))
    j3mev = int(np.argmin(np.abs(e_c - 3000.0)))

    fig, axes = plt.subplots(1, 4, figsize=(19, 4.4))

    ax = axes[0]
    ax.loglog(e_c / 1e3, np.maximum(t_ch[0][i55], 1e-12), lw=1.2,
              label="chorus (R, n=+1)")
    ax.loglog(e_c / 1e3, np.maximum(t_em[0][i55], 1e-12), lw=1.2,
              label="EMIC (L, n=-1)")
    ax.loglog(e_c / 1e3, np.maximum(t_sum[0][i55], 1e-12), "k--", lw=1.0,
              label="sum")
    ax.set_ylim(1e-10, None)
    ax.set_xlabel("E [MeV]")
    ax.set_ylabel(r"$\langle D_{\alpha\alpha}\rangle$ at 55$^\circ$"
                  " [rad$^2$/s]")
    ax.legend(fontsize=8)
    ax.set_title("who scatters whom\n(EMIC switches on above its "
                 "MeV threshold)")

    ax = axes[1]
    ax.semilogy(e_c / 1e3, np.asarray(f0)[i80], "k--", lw=1.0, label="seed")
    ax.semilogy(e_c / 1e3, np.maximum(snap_ch[-1, i80], 1e-30), lw=1.3,
                label="chorus only")
    ax.semilogy(e_c / 1e3, np.maximum(snap_sum[-1, i80], 1e-30), lw=1.3,
                label="chorus + EMIC")
    ax.set_xscale("log")
    ax.set_ylim(1e-9, 2.0)
    ax.set_xlabel("E [MeV]")
    ax.set_ylabel(r"f($\alpha_{eq}$ = 80$^\circ$, 2 d)")
    ax.legend(fontsize=8)
    ax.set_title("the accelerated tail survives near 90$^\\circ$\n"
                 "(EMIC cannot reach near-equatorial mirrors)")

    ax = axes[2]
    ax.semilogy(np.degrees(grid.alpha_c),
                np.maximum(snap_ch[-1, :, j3mev], 1e-30), lw=1.3,
                label="chorus only")
    ax.semilogy(np.degrees(grid.alpha_c),
                np.maximum(snap_sum[-1, :, j3mev], 1e-30), lw=1.3,
                label="chorus + EMIC")
    ax.axvline(math.degrees(a_lc), color="k", ls=":", lw=0.8)
    ax.set_xlabel(r"$\alpha_{eq}$ [deg]")
    ax.set_ylabel("f at 3 MeV, 2 d")
    ax.legend(fontsize=8)
    ax.set_title("EMIC carves the top-hat\nout of the chorus-built pancake")

    ax = axes[3]
    mass = np.asarray(op_ch.mass)
    sel = e_c >= 1000.0
    for name, snaps in (("chorus only", snap_ch),
                        ("chorus + EMIC", snap_sum)):
        content = [(s * mass)[:, sel].sum() for s in snaps]
        ax.semilogy(t_snap / 86400.0, content, "o-", ms=3, label=name)
    ax.set_xlabel("t [days]")
    ax.set_ylabel("trapped content > 1 MeV [arb]")
    ax.legend(fontsize=8)
    ax.set_title("net belt building\nwith and without the loss channel")

    fig.tight_layout()
    path = os.path.join(OUT, "belt_competition.png")
    fig.savefig(path, dpi=110)
    n_ch = float((snap_ch[-1] * mass)[:, sel].sum())
    n_sum = float((snap_sum[-1] * mass)[:, sel].sum())
    print(f"trapped >1 MeV content after {T_DAYS:.0f} d: EMIC loss channel "
          f"cuts it {n_ch/n_sum:.1f}x (and redistributes the 90-deg "
          f"pancake toward the loss cone, panel c)")
    print("wrote", path)


if __name__ == "__main__":
    main()
