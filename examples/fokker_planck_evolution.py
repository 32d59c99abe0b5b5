"""Pitch-angle Fokker-Planck evolution: from wave field to electron lifetime.

The full wave-particle chain closed end to end on the framework's own
medium: quasi-linear <D_aa>(E, alpha_eq) from diffusion.bounce_averaged ->
the bounce-averaged pitch-angle diffusion equation (fokker_planck.py) ->
distribution evolution and precipitation lifetimes.

  (a) the bounce-averaged diffusion profile <D_aa>(alpha_eq) at 100 keV,
      L = 4 -- the operator's coefficient, spanning many decades;
  (b) f(alpha_eq, t) snapshots from the Crank-Nicolson evolution: the loss
      cone drains, the distribution relaxes onto the lowest decay mode
      (dashed: the inverse-iteration eigenmode it must converge to);
  (c) decay of the particle content N(t): after the overtone transient the
      slope equals 1/tau from precipitation_lifetime (dotted line);
  (d) lifetime vs energy: the true eigen-lifetime (batched inverse power
      iteration, one jitted program over all energies) against the classic
      weak-diffusion estimate 1/<D_aa>(a_LC) -- the estimate tracks the
      shape but misses the bottleneck physics where D varies strongly
      across the line.

Writes examples/output/fokker_planck_evolution.png. CPU, ~1 min.
"""

import math
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

    from raytrace_tpu import diffusion, fokker_planck as fp
    from raytrace_tpu.constants import FCE_E
    from raytrace_tpu.diffusion import WaveSpectrum
    from raytrace_tpu.models import make_env_lat, medium

    env = make_env_lat()
    l_shell = 4.0
    bm = float(medium.b_mag(l_shell, 0.0, env))
    fce = FCE_E * bm
    spec = WaveSpectrum(bw_t=300e-12, f_m=0.15 * fce, df=0.10 * fce,
                        f_lc=0.05 * fce, f_uc=0.50 * fce)
    rl = 1.0 / l_shell
    a_lc = math.asin(math.sqrt(rl**3 / math.sqrt(4.0 - 3.0 * rl)))

    n_cells = 128
    centers, faces, da = fp.make_grid(a_lc, n_cells)
    g_c = fp.bounce_time_factor(centers) * np.sin(centers) * np.cos(centers)
    g_f = np.maximum(
        fp.bounce_time_factor(faces) * np.sin(faces) * np.cos(faces), 1e-12)

    e_ref = 100.0
    ba = diffusion.bounce_averaged(e_ref, centers, l_shell, env, spec,
                                   n_lat=48)
    daa = np.maximum(np.asarray(ba["daa"], np.float64),
                     1e-8 * float(np.max(ba["daa"])))
    tau = float(fp.precipitation_lifetime(jnp.asarray(daa), a_lc,
                                          n_cells=n_cells))

    fig, axes = plt.subplots(1, 4, figsize=(19.5, 4.4))

    # (a) the coefficient
    ax = axes[0]
    ax.semilogy(np.degrees(centers), daa)
    ax.axvline(np.degrees(a_lc), color="k", ls="--", lw=0.8)
    ax.set_xlabel(r"$\alpha_{eq}$ [deg]")
    ax.set_ylabel(r"$\langle D_{\alpha\alpha}\rangle$ [rad$^2$/s]")
    ax.set_title(f"bounce-averaged coefficient\n{e_ref:g} keV, L = "
                 f"{l_shell:g} (dashed: loss cone)")

    # (b) f(alpha, t) snapshots + the converged lowest mode
    ax = axes[1]
    d_faces = jnp.concatenate([jnp.asarray(daa[:1]),
                               0.5 * jnp.asarray(daa[1:] + daa[:-1]),
                               jnp.asarray(daa[-1:])])
    tri = fp.build_operator(d_faces, jnp.asarray(g_c), jnp.asarray(g_f), da)
    f0 = jnp.sin(jnp.asarray(centers - centers[0]))
    # log-spaced snapshot times: the in-band pitch angles drain on the
    # fast internal-mixing scale (~1e-3 tau), the near-90 deg reservoir
    # (where the band has no resonance) holds out to t ~ tau
    t_snaps = tau * np.array([1e-4, 1e-3, 1e-2, 0.1, 0.5])
    ax.plot(np.degrees(centers), np.asarray(f0), color="k", lw=1.0,
            label="t = 0")
    f_cur, t_cur, snaps = f0, 0.0, []
    for i, t_target in enumerate(t_snaps):
        f_cur = fp.evolve_cn(f_cur, tri, (t_target - t_cur) / 300, 300)
        t_cur = t_target
        snaps.append(f_cur)
        ax.plot(np.degrees(centers), np.asarray(f_cur),
                color=plt.cm.viridis(i / (len(t_snaps) - 1)),
                label=f"t = {t_target/tau:g} " + r"$\tau$")
    # lowest mode by inverse iteration (same machinery as the lifetime)
    x = f0
    for _ in range(8):
        x = fp.thomas_solve(-tri[0], -tri[1], -tri[2], x)
        x = x / jnp.max(x)
    ax.plot(np.degrees(centers),
            np.asarray(x) * float(snaps[-1].max()), "k--", lw=1.0,
            label="lowest mode")
    ax.set_xlabel(r"$\alpha_{eq}$ [deg]")
    ax.set_ylabel(r"f($\alpha_{eq}$, t)")
    ax.set_title("Crank-Nicolson PSD evolution")
    ax.legend(fontsize=7)

    # (c) content decay vs the eigen slope
    ax = axes[2]
    n_snap2, per2 = 60, 120
    dt2 = 3.0 * tau / (n_snap2 * per2)
    _, snaps2 = fp.evolve_cn(f0, tri, dt2, n_snap2 * per2, save_every=per2)
    t_ax = dt2 * per2 * np.arange(1, n_snap2 + 1)
    n_t = np.asarray(fp.content(snaps2, jnp.asarray(g_c), da))
    n0 = float(fp.content(f0, jnp.asarray(g_c), da))
    ax.semilogy(t_ax / tau, n_t / n0, label="N(t) (CN evolution)")
    ax.semilogy(t_ax / tau, (n_t[0] / n0) * np.exp(-(t_ax - t_ax[0]) / tau),
                "k:", label=r"slope $1/\tau$ (inverse iteration)")
    ax.set_xlabel(r"t / $\tau$")
    ax.set_ylabel(r"N(t) / N(0)")
    ax.set_title(f"content decay, tau = {tau/86400.0:.1f} days")
    ax.legend(fontsize=8)

    # (d) lifetime vs energy: true eigenvalue vs weak-diffusion estimate.
    # Coarser (E, alpha, lat, root-grid) resolution than panels a-c: the
    # resonance root-solve is the cost here, and tau is insensitive to it.
    ax = axes[3]
    e_scan = np.geomspace(30.0, 1000.0, 16)
    nc_d = 80
    centers_d, _, _ = fp.make_grid(a_lc, nc_d)
    ba_e = diffusion.bounce_averaged(e_scan[:, None], centers_d[None, :],
                                     l_shell, env, spec, n_lat=32,
                                     n_grid=256, n_bisect=24)
    daa_e = np.asarray(ba_e["daa"], np.float64)
    dmax = daa_e.max(axis=1, keepdims=True)
    has_wave = dmax[:, 0] > 0.0
    daa_e = np.maximum(daa_e, 1e-8 * np.where(dmax > 0, dmax, 1.0))
    tau_e = np.asarray(fp.precipitation_lifetime(jnp.asarray(daa_e), a_lc,
                                                 n_cells=nc_d))
    tau_weak = np.asarray(
        diffusion.loss_cone_lifetime_s(e_scan, l_shell, env, spec, n_lat=32,
                                       n_grid=256, n_bisect=24))
    ax.loglog(e_scan[has_wave], tau_e[has_wave] / 86400.0, "o-", ms=3,
              label=r"eigen $\tau = 1/\lambda_1$")
    ax.loglog(e_scan, tau_weak / 86400.0, "s--", ms=3,
              label=r"weak-diffusion $1/\langle D\rangle(a_{LC})$")
    ax.set_xlabel("E [keV]")
    ax.set_ylabel(r"$\tau$ [days]")
    ax.set_title(f"precipitation lifetime, L = {l_shell:g}")
    ax.legend(fontsize=8)

    fig.tight_layout()
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "fokker_planck_evolution.png")
    fig.savefig(path, dpi=110)
    print("wrote", path)


if __name__ == "__main__":
    main()
