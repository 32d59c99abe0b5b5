"""Whistler sonogram: the frequency-time signature of a traced sweep.

Traces a 32-frequency sweep from one canonical launch to the conjugate
surface and renders what a VLF receiver at the landing point records:
the falling-tone one-hop whistler f(T), the 3-hop and 5-hop echo train
(odd multiples of the one-hop delay for a source-side receiver), and
the Eckersley fit T = D0/sqrt(f) overlaid. This is the measurement the
whole reference exists to model -- the dispersed falling tone of a
lightning-generated whistler.

Writes examples/output/whistler_sonogram.png. Runs anywhere (~1 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    import jax

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu import analysis
    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    os.makedirs(OUT, exist_ok=True)

    env = make_env_lat()
    freqs = np.geomspace(800.0, 6000.0, 32)
    n = freqs.size
    u0 = np.zeros((n, 4))
    u0[:, 0] = (RE + 1.0e6) / RE
    u0[:, 1] = np.pi / 4
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, freqs,
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE), max_steps=30000,
    )
    st = np.asarray(res.status)
    f_hit, T_hit = analysis.hop_delays(res, freqs, group_idx=3)
    fit = analysis.fit_eckersley(
        np.asarray(res.u)[:, 3], freqs, status=st
    )
    print(f"{f_hit.size}/{n} frequencies landed; "
          f"Eckersley D0 = {fit['d0']:.1f} s*sqrt(Hz), "
          f"rms {fit['rms_rel']:.3f}")

    fig, ax = plt.subplots(figsize=(9, 5.5))
    tt = np.linspace(0.8 * T_hit.min(), 5.4 * T_hit.max(), 400)
    order = np.argsort(f_hit)
    for hop, alpha in ((1, 1.0), (3, 0.55), (5, 0.3)):
        ax.plot(hop * T_hit[order], f_hit[order] / 1e3, "o-", ms=3,
                lw=1.2, alpha=alpha, color="tab:blue",
                label=f"{hop}-hop" + (" (traced)" if hop == 1 else ""))
        ax.plot(tt, (fit["d0"] / (tt / hop)) ** 2 / 1e3, ls="--", lw=0.8,
                alpha=alpha, color="tab:orange",
                label="Eckersley fit" if hop == 1 else None)
    ax.set_xlim(0, 5.4 * T_hit.max())
    ax.set_ylim(0, freqs.max() / 1e3 * 1.1)
    ax.set_xlabel("group delay after the causative sferic (s)")
    ax.set_ylabel("frequency (kHz)")
    ax.legend()
    ax.set_title(
        "Whistler echo train at the conjugate point "
        f"(lat 45$^\\circ$ launch; D$_0$ = {fit['d0']:.0f} s$\\cdot$Hz$^{{1/2}}$)"
    )
    fig.tight_layout()
    path = os.path.join(OUT, "whistler_sonogram.png")
    fig.savefig(path, dpi=120)
    print("wrote", path)


if __name__ == "__main__":
    main()
