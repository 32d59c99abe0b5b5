"""The two-belt structure: radial diffusion vs the framework's own hiss losses.

The iconic Lyons-Thorne result, reproduced end to end on this framework's
physics with NO imported loss rates: the slot region between the inner and
outer radiation belts exists because plasmaspheric hiss -- whistler-mode
waves trapped inside the plasmasphere -- scatters ~MeV electrons into the
loss cone fastest at L ~ 2-3.5, faster there than ULF radial diffusion can
refill from the plasma-sheet source.

Chain, every coefficient from the repo's own machinery:
  1. tau(L): a plasmaspheric-hiss band (confined inside the CA1992
     plasmapause the medium itself pre-solves, env.lppi) -> bounce-averaged
     <D_aa>(alpha_eq) on the medium's own B/ne profiles
     (diffusion.bounce_averaged_jax) -> TRUE decay lifetime by inverse
     power iteration (fokker_planck.precipitation_lifetime), per L-shell;
  2. radial transport: D_LL = d0 (L/4)^10 (the one user-supplied knob --
     ULF power is global-magnetospheric input this single-flux-tube medium
     cannot derive; radial.dll_power_law documents the scaling class);
  3. equilibrium and refilling: radial.steady_state / evolve_radial with
     the plasma-sheet population held at the outer wall and 1/tau(L) as
     the loss term.

Panels: (a) the loss map -- hiss <D_aa> vs (L, alpha_eq) at 1 MeV;
(b) rates: 1/tau(L) against the radial transport rate D_LL (where loss
wins, the slot forms); (c) the equilibrium two-belt profile f(L);
(d) storm-recovery refilling: snapshots of an emptied belt filling from
the outer boundary while the slot holds.

Writes examples/output/two_belt_structure.png. ~2 min.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

E_MEV = 1.0               # fixed-energy slice (standard simplification)
BW_HISS_PT = 300.0        # storm-time hiss
D0_LL = 3.0e-8            # D_LL at L=4 [1/s] -- moderate-activity class
N_L = 240


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import diffusion, fokker_planck as fp1, radial
    from raytrace_tpu.diffusion import WaveSpectrum
    from raytrace_tpu.models import make_env_lat

    os.makedirs(OUT, exist_ok=True)

    env = make_env_lat()
    lppi = float(env.lppi)
    spec = WaveSpectrum(bw_t=BW_HISS_PT * 1e-12, f_m=700.0, df=500.0,
                        f_lc=100.0, f_uc=4000.0)
    print(f"plasmapause (CA1992 pre-solve): Lppi = {lppi:.2f}; hiss band "
          f"{spec.f_lc:.0f}-{spec.f_uc:.0f} Hz, {BW_HISS_PT:.0f} pT, "
          f"E = {E_MEV:g} MeV")

    # ---- 1. tau(L) from the framework's own pitch-angle chain ----------
    l_probe = np.linspace(1.6, 6.4, 33)
    nc = 96
    tau = np.full(l_probe.size, np.inf)
    daa_map = []
    for i, L in enumerate(l_probe):
        if L >= lppi:              # hiss lives inside the plasmasphere
            daa_map.append(np.zeros(nc))
            continue
        rl = 1.0 / L
        a_lc = math.asin(math.sqrt(rl**3 / math.sqrt(4.0 - 3.0 * rl)))
        centers, _, _ = fp1.make_grid(a_lc, nc)
        ba = diffusion.bounce_averaged_jax(
            jnp.asarray(E_MEV * 1000.0), jnp.asarray(centers),
            l_shell=float(L), env=env, spec=spec, n_lat=32, n_grid=192,
            n_bisect=24)
        daa = np.asarray(ba["daa"], np.float64)
        daa_map.append(daa)
        if daa.max() > 0.0:
            dmax = daa.max()
            daa_f = np.maximum(daa, 1e-8 * dmax)
            tau[i] = float(fp1.precipitation_lifetime(
                jnp.asarray(daa_f), a_lc, n_cells=nc))
    daa_map = np.array(daa_map)                     # (n_L, nc)
    with np.errstate(divide="ignore"):
        inv_tau_probe = np.where(np.isfinite(tau), 1.0 / tau, 0.0)

    # ---- 2.-3. radial equilibrium and refilling -------------------------
    centers_l, faces_l, dl = radial.make_l_grid(1.6, 6.4, N_L)
    d_faces = radial.dll_power_law(faces_l, d0=D0_LL, l0=4.0, q=10.0)
    inv_tau = np.interp(centers_l, l_probe, inv_tau_probe)
    # the inner belt's true source is CRAND, not diffusion through the
    # slot: solve the boundary-fed and source-fed parts separately (the
    # equation is linear) and scale the CRAND magnitude -- the one free
    # normalization -- so the inner-belt peak sits at half the
    # plasma-sheet level
    src_shape = np.exp(-(((centers_l - 1.9) / 0.25) ** 2))
    f_bnd = np.asarray(radial.steady_state(centers_l, faces_l, dl, d_faces,
                                           f_out=1.0,
                                           inv_tau_centers=inv_tau))
    f_src_unit = np.asarray(radial.steady_state(
        centers_l, faces_l, dl, d_faces, f_out=0.0,
        inv_tau_centers=inv_tau, source_centers=src_shape))
    s0 = 0.5 / f_src_unit.max()
    src = s0 * src_shape
    f_eq = f_bnd + s0 * f_src_unit
    f_free = np.asarray(radial.steady_state(centers_l, faces_l, dl,
                                            d_faces, f_out=1.0,
                                            source_centers=src))
    print(f"CRAND source normalization s0 = {s0:.2e} /s")
    # storm recovery: outer zone emptied, inner belt survives; refills
    # from the boundary while the slot holds
    f0 = np.where(centers_l < 2.5, f_eq, 0.0)
    n_steps, n_snap = 6000, 6
    _, snaps = radial.evolve_radial(f0, centers_l, faces_l, dl, d_faces,
                                    dt=1.0e4, n_steps=n_steps, f_out=1.0,
                                    inv_tau_centers=inv_tau,
                                    source_centers=src,
                                    save_every=n_steps // n_snap)
    snaps = np.asarray(snaps)
    t_snap = np.arange(1, n_snap + 1) * (n_steps // n_snap) * 1.0e4 / 86400.0

    fig, axes = plt.subplots(1, 4, figsize=(19, 4.4))

    ax = axes[0]
    alpha_frac = np.linspace(0, 1, nc)
    pc = ax.pcolormesh(l_probe, alpha_frac,
                       np.log10(np.maximum(daa_map, 1e-12)).T,
                       shading="auto", cmap="viridis", vmin=-9)
    fig.colorbar(pc, ax=ax,
                 label=r"log$_{10}\langle D_{\alpha\alpha}\rangle$ [1/s]")
    ax.axvline(lppi, color="w", ls="--", lw=0.8)
    ax.set_xlabel("L")
    ax.set_ylabel(r"($\alpha_{eq}$ - $\alpha_{LC}$)/(90$^\circ$ - "
                  r"$\alpha_{LC}$)")
    ax.set_title(f"hiss scattering at {E_MEV:g} MeV\n"
                 "(confined inside the plasmapause, dashes)")

    ax = axes[1]
    ax.semilogy(centers_l, inv_tau, lw=1.4, label=r"loss rate 1/$\tau$(L)"
                " (from the FP chain)")
    ax.semilogy(centers_l,
                radial.dll_power_law(centers_l, d0=D0_LL, l0=4.0, q=10.0),
                lw=1.4, label=r"transport rate D$_{LL}$(L)")
    ax.axvline(lppi, color="k", ls="--", lw=0.8)
    ax.set_ylim(1e-10, None)
    ax.set_xlabel("L")
    ax.set_ylabel("rate [1/s]")
    ax.legend(fontsize=8)
    ax.set_title("where loss beats transport,\nthe slot forms")

    ax = axes[2]
    ax.semilogy(centers_l, np.maximum(f_free, 1e-12), "0.6", lw=1.0,
                label="no losses")
    ax.semilogy(centers_l, np.maximum(f_eq, 1e-12), lw=1.6,
                label="with hiss losses")
    ax.axvline(lppi, color="k", ls="--", lw=0.8)
    ax.set_ylim(1e-7, 3.0)
    ax.set_xlabel("L")
    ax.set_ylabel("equilibrium f (plasma-sheet units)")
    ax.legend(fontsize=8)
    ax.set_title("the two-belt structure\n(inner belt, SLOT, outer belt)")

    ax = axes[3]
    cmap = plt.cm.magma
    for s in range(n_snap):
        ax.semilogy(centers_l, np.maximum(snaps[s], 1e-12),
                    color=cmap(0.15 + 0.7 * s / (n_snap - 1)), lw=1.1,
                    label=f"{t_snap[s]:.0f} d" if s in (0, n_snap - 1)
                    else None)
    ax.semilogy(centers_l, np.maximum(f_eq, 1e-12), "k--", lw=0.9,
                label="equilibrium")
    ax.set_ylim(1e-7, 3.0)
    ax.set_xlabel("L")
    ax.set_ylabel("f")
    ax.legend(fontsize=8)
    ax.set_title("storm-recovery refilling:\nthe outer belt returns, "
                 "the slot holds")

    fig.tight_layout()
    path = os.path.join(OUT, "two_belt_structure.png")
    fig.savefig(path, dpi=110)
    i_slot = np.argmin(f_eq[(centers_l > 1.8) & (centers_l < lppi)])
    l_slot = centers_l[(centers_l > 1.8) & (centers_l < lppi)][i_slot]
    print(f"slot minimum at L = {l_slot:.2f}; min tau = "
          f"{np.nanmin(tau)/86400:.1f} d at L = "
          f"{l_probe[np.nanargmin(tau)]:.2f}")
    print("wrote", path)


if __name__ == "__main__":
    main()
