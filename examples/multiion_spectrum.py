"""Multi-ion dispersion spectrum: what He+/O+ fractions do to mu(f).

Scans the refractive index of both cold-plasma branches across the
ion-cyclotron band at a fixed magnetospheric point, protons-only vs a
10% He+ / 5% O+ plasma. The multi-ion curves show the classic
structure: L-mode (EMIC) resonances at each ion gyrofrequency, stop
bands between each resonance and its cutoff, and the crossover
frequencies where the branches exchange polarization -- none of which
exist in the reference's protons-only plasma.

Writes examples/output/multiion_spectrum.png. Runs anywhere (seconds).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu.constants import FCE_HE, FCE_O, FCE_P
    from raytrace_tpu.models import make_env, medium
    from raytrace_tpu.ops import dispersion

    os.makedirs(OUT, exist_ok=True)

    # fixed point: L = 2 equator
    r, lat, psi = 2.0, 0.0, 0.05  # near-parallel propagation
    env0 = make_env()
    env1 = make_env(eta_he=0.10, eta_o=0.05)
    b = float(medium.b_mag(r, lat, env0))
    ne = float(medium.ne_total_m3(r, lat, env0))
    fc_p, fc_he, fc_o = FCE_P * b, FCE_HE * b, FCE_O * b

    f = np.geomspace(0.05 * fc_o, 3.0 * fc_p, 4000)

    def mu2(env, root):
        rr, ll, pp = dispersion.stix_rlp(
            ne, b, f, env.eta_he, env.eta_o
        )
        return np.asarray(
            dispersion.mu2_signed(rr, ll, pp, psi, root)
        )

    fig, axes = plt.subplots(1, 2, figsize=(12, 5), sharey=True)
    for ax, env, title in (
        (axes[0], env0, "protons only (the reference plasma)"),
        (axes[1], env1, "10% He$^+$, 5% O$^+$"),
    ):
        for root, name, color in ((-1.0, "L mode (EMIC)", "tab:red"),
                                  (1.0, "R mode (whistler)", "tab:blue")):
            m2 = mu2(env, root)
            mu = np.where(m2 > 0, np.sqrt(m2), np.nan)  # propagating only
            ax.loglog(f, mu, color=color, lw=1.2, label=name)
        for fc, lbl in ((fc_p, "f$_{cH}$"), (fc_he, "f$_{cHe}$"),
                        (fc_o, "f$_{cO}$")):
            ax.axvline(fc, color="0.8", lw=0.8, zorder=0)
            ax.text(fc, 2e4, lbl, ha="center", fontsize=8, color="0.4")
        ax.set_title(title)
        ax.set_xlabel("f (Hz)")
    axes[0].set_ylabel(r"$\mu$ (propagating bands only)")
    axes[0].legend(fontsize=9)
    fig.suptitle(
        f"Cold-plasma branches at L = 2 equator "
        f"(n$_e$ = {ne * 1e-6:.0f} cm$^{{-3}}$, "
        f"f$_{{cH}}$ = {fc_p:.1f} Hz), $\\psi$ = {psi}"
    )
    fig.tight_layout()
    path = os.path.join(OUT, "multiion_spectrum.png")
    fig.savefig(path, dpi=120)
    print("wrote", path)


if __name__ == "__main__":
    main()
