"""Landing-footprint map: where a whistler fan comes down.

Traces a (launch latitude x frequency) fan through the canonical CA1992
medium and renders the receiver-network view built on
analysis.landing_footprint: landing latitude vs launch latitude colored
by frequency, the landing-L distribution, and the one-hop group-delay
dispersion (the T ~ D0/sqrt(f) whistler signature). Mid-latitude
launches land NEAR THE EQUATOR -- most rays reflect across it and come
back (even equator-crossing counts), a minority thread through to the
conjugate hemisphere.

Writes examples/output/conjugate_footprint.png. Runs anywhere
(CPU ~2 min).
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

    from raytrace_tpu.analysis import footprint_spreading, landing_footprint
    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs
    from raytrace_tpu.parallel import LaunchSpec, build_launch

    os.makedirs(OUT, exist_ok=True)
    env = make_env_lat()
    spec = LaunchSpec(
        lats=tuple(np.linspace(0.5, 1.0, 12)),
        chis=(0.0,),
        freqs=tuple(np.geomspace(1000.0, 4000.0, 5)),
    )
    u0, f = build_launch(spec, np.float64)
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0), jnp.asarray(f),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE), max_steps=20000,
    )
    fp = landing_footprint(u0, f, res)
    h = fp["hit"]

    fig, axes = plt.subplots(2, 2, figsize=(11.5, 8.8))
    axes = axes.ravel()
    sc = axes[0].scatter(
        np.degrees(fp["launch_lat"][h]), np.degrees(fp["landing_lat"][h]),
        c=fp["freq_hz"][h] / 1e3, cmap="viridis", s=22,
    )
    axes[0].axhline(0.0, color="0.6", lw=0.8)
    axes[0].set_xlabel("launch latitude [deg]")
    axes[0].set_ylabel("landing latitude [deg]")
    axes[0].set_title(
        f"landing footprint ({int(h.sum())}/{h.size} rays reach the surface)"
    )
    fig.colorbar(sc, ax=axes[0], label="f [kHz]")

    axes[1].hist(fp["landing_l"][h], bins=24, color="#4878d0")
    axes[1].set_xlabel("landing L-shell")
    axes[1].set_ylabel("rays")
    axes[1].set_title("landing field-line distribution")

    axes[2].scatter(
        1.0 / np.sqrt(fp["freq_hz"][h]), fp["group_delay_s"][h],
        c=np.degrees(fp["launch_lat"][h]), cmap="plasma", s=22,
    )
    axes[2].set_xlabel(r"$1/\sqrt{f}$ [Hz$^{-1/2}$]")
    axes[2].set_ylabel("one-hop group delay [s]")
    axes[2].set_title("whistler dispersion (Eckersley: T $\\propto$ 1/$\\sqrt{f}$)")

    # geometric ray-tube amplitude along each fixed-frequency launch fan
    # (analysis.footprint_spreading): focusing/defocusing from pure ray
    # geometry -- adjacent-ray secants, NOT the folded-map tangent
    freqs = np.unique(fp["freq_hz"])
    cmap = plt.get_cmap("viridis")
    for i, fq in enumerate(freqs):
        sel = fp["freq_hz"] == fq
        order = np.argsort(fp["launch_lat"][sel])
        sub = {k: np.asarray(v)[sel][order] for k, v in fp.items()}
        sp = footprint_spreading(sub, sub["launch_lat"])
        if sp["param_mid"].size:
            axes[3].plot(
                np.degrees(sp["param_mid"]), sp["rel_amplitude"], "o-",
                ms=4, lw=1.2, color=cmap(i / max(len(freqs) - 1, 1)),
                label=f"{fq/1e3:.1f} kHz",
            )
    axes[3].set_xlabel("launch latitude [deg]")
    axes[3].set_ylabel("relative landing amplitude (tube geometry)")
    axes[3].set_title("ray-tube focusing: 1/$\\sqrt{|ds_{land}/d\\lambda_0|}$")
    axes[3].legend(fontsize=8)
    for ax in axes:
        ax.grid(alpha=0.3)
    fig.tight_layout()
    path = os.path.join(OUT, "conjugate_footprint.png")
    fig.savefig(path, dpi=120)
    print(path)


if __name__ == "__main__":
    main()
