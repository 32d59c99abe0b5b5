"""The production stack, end to end: 10,240 7-state rays over the plume.

One script exercises everything round 4 added, at full production scale:
the `ensemble10k_plume` preset (launch fan spread over all local times),
the MLT-resolved plasmasphere (`ps_mlt=True` — the drift-derived dusk
teardrop the reference freezes to a scalar, RayTrace_3D.jl:114), the
bucketed rounds tracer with its tuned (512, 1024, 2048) schedule, AND
the production trajectory channel (per-round decimated snapshots,
bounded device memory) — plus the same fan through the axisymmetric
control medium, so the plume's imprint on the global whistler
circulation is a measured difference, not an assertion:

  1. equatorial projection of one ray per launch cell over the
     equatorial density map — the fan riding the teardrop;
  2. matched per-ray differences (the fan is identical ray-for-ray in
     both media) for the knee-crossing subset: the plume moves their
     landings by DEGREES (p90 up to ~6 deg) and their group delays by
     milliseconds, maximally on the dusk flanks -- while the anchor
     meridian (phi = 0, where the Fourier shape reproduces the
     axisymmetric medium exactly) shows ~zero difference, a built-in
     validation;
  3. landing-latitude distribution by sector, plume vs control.

Writes examples/output/global_plume_ensemble.png. Sized for the chip
(two 10,240-ray programs + the trajectory channel); on CPU expect
minutes.
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

    from raytrace_tpu.config import MediumConfig, preset
    from raytrace_tpu.constants import B0_3D
    from raytrace_tpu.integrate import events
    from raytrace_tpu.models import medium as M
    from raytrace_tpu.run import run

    os.makedirs(OUT, exist_ok=True)

    # production plume run WITH the trajectory channel (rounds tracer,
    # per-round snapshot offload; 19968 = 312 * 64 keeps every round a
    # multiple of the cadence)
    cfg = preset("ensemble10k_plume", save_every=64, max_steps=19968)
    print("tracing", cfg.name, "(10,240 rays + trajectory channel) ...")
    out = run(cfg)
    # same fan, axisymmetric control (final states only)
    import dataclasses
    ctrl_cfg = dataclasses.replace(
        preset("ensemble10k_plume", medium=MediumConfig(b0=B0_3D),
               max_steps=19968),
        name="plume_control")
    print("tracing the axisymmetric control ...")
    ctrl = run(ctrl_cfg)

    v = np.asarray(out["valid"])
    u = np.asarray(out["result"].u)[v]
    st = np.asarray(out["result"].status)[v]
    u_c = np.asarray(ctrl["result"].u)[np.asarray(ctrl["valid"])]
    st_c = np.asarray(ctrl["result"].status)[np.asarray(ctrl["valid"])]
    traj = {k: np.asarray(a)[:, v] for k, a in out["result"].traj.items()
            if k in ("u", "status")}
    env = cfg.medium.build()
    a0 = float(env.ps_mlt_a0)

    # rebuild the launch grid (same (lat, phi, chi, freq) product order
    # as run._build_u0) so plume/control rays pair up index-for-index
    import itertools
    lat0, phi0 = [], []
    for la, ph, _chi, _fr in itertools.product(
            cfg.lats, cfg.phis, cfg.chis, cfg.freqs):
        lat0.append(la)
        phi0.append(ph)
    lat0, phi0 = np.asarray(lat0), np.asarray(phi0)

    def mlt_of(phi):
        return (12.0 * (a0 + phi) / np.pi + 12.0) % 24.0

    hit = st == events.HIT_EARTH
    hit_c = st_c == events.HIT_EARTH
    print(f"census: plume {hit.sum()}/{hit.size} hit, "
          f"control {hit_c.sum()}/{hit_c.size} hit")

    fig = plt.figure(figsize=(16, 5.0))

    # --- panel 1: trajectories over the equatorial plume map -----------
    ax = fig.add_subplot(1, 3, 1)
    rr = np.linspace(1.05, 7.5, 140)
    pp = np.linspace(-np.pi, np.pi, 221)
    Rg, Pg = np.meshgrid(rr, pp)
    import jax.numpy as jnp
    ne = np.asarray(jax.vmap(jax.vmap(
        lambda r, p: M.ne_total_m3(r, 0.0, env, phi=p)))(
            jnp.asarray(Rg), jnp.asarray(Pg)))
    ang = Pg + a0  # MLT frame: dusk (18 h) at +90 deg
    ax.pcolormesh(Rg * np.cos(ang), Rg * np.sin(ang),
                  np.log10(ne / 1e6), cmap="viridis", shading="gouraud",
                  vmin=0.0, vmax=4.0, rasterized=True)
    tu = traj["u"]          # (S, B, 7)
    alive = traj["status"] == events.ACTIVE
    # one ray per launch cell at the central frequency/chi: stride the
    # flat (lat, phi, chi, freq) grid
    stride = len(cfg.chis) * len(cfg.freqs)
    sel = np.arange(4 * stride + len(cfg.freqs) // 2, tu.shape[1],
                    5 * stride)
    for b in sel:
        n_live = max(int(alive[:, b].sum()), 2)
        r, th, ph = tu[:n_live, b, 0], tu[:n_live, b, 1], tu[:n_live, b, 2]
        s = r * np.sin(th)
        aa = ph + a0
        ax.plot(s * np.cos(aa), s * np.sin(aa), color="w", lw=0.5,
                alpha=0.75)
    ax.set_aspect("equal")
    ax.set_xlabel("$x_{MLT}$ [$R_E$] (dusk up)")
    ax.set_ylabel("$y_{MLT}$ [$R_E$]")
    ax.set_title("ensemble10k_plume: rays over the equatorial\n"
                 "density (white: one ray per launch cell)", fontsize=10)

    # --- panel 2: matched per-ray differences, knee-crossing subset ----
    axd = fig.add_subplot(1, 3, 2)
    mlt = mlt_of(phi0)
    both = hit & hit_c
    L0 = cfg.r0 / np.sin(np.pi / 2 - lat0) ** 2   # launch field line
    kc = both & (L0 > float(env.lppi))            # crosses the base knee
    d_lat = np.degrees(np.abs(u[:, 1] - u_c[:, 1]))
    d_t = (u[:, 6] - u_c[:, 6]) * 1e3             # ms
    sectors = np.asarray(sorted({round(float(m), 3) for m in
                                 mlt_of(np.asarray(cfg.phis))}))
    p90_dlat, med_dt = [], []
    for s0 in sectors:
        m = kc & (np.abs(mlt - s0) < 1.0)
        p90_dlat.append(np.percentile(d_lat[m], 90))
        med_dt.append(np.median(d_t[m]))
    axd.plot(sectors, p90_dlat, "o-", color="C3",
             label="p90 |$\\Delta$ landing lat| [deg]")
    axd2 = axd.twinx()
    axd2.plot(sectors, med_dt, "s--", color="C0",
              label="median $\\Delta$ group delay [ms]")
    axd2.axhline(0.0, color="C0", lw=0.5, alpha=0.5)
    axd2.set_ylabel("median $\\Delta T$ [ms]", color="C0")
    anchor = mlt_of(0.0)
    axd.axvline(anchor, color="k", ls=":", lw=0.8)
    axd.text(anchor, max(p90_dlat), " anchor\n (exact 0)", va="top",
             fontsize=7)
    axd.axvline(18.0, color="k", ls="--", lw=0.8)
    axd.text(18.0, max(p90_dlat), " dusk", va="top", fontsize=8)
    axd.set_xlabel("launch local time [h]")
    axd.set_ylabel("p90 |$\\Delta$ landing latitude| [deg]", color="C3")
    axd.grid(alpha=0.3)
    axd.set_title(f"plume $-$ control, matched ray-for-ray\n"
                  f"(the {int(kc.sum())} knee-crossing rays)", fontsize=10)
    h1, l1 = axd.get_legend_handles_labels()
    h2, l2 = axd2.get_legend_handles_labels()
    axd.legend(h1 + h2, l1 + l2, fontsize=8, loc="center left")

    # --- panel 3: landing latitude by sector ---------------------------
    axl = fig.add_subplot(1, 3, 3)
    lat_land = np.degrees(np.pi / 2 - u[:, 1])
    lat_c = np.degrees(np.pi / 2 - u_c[:, 1])
    s_dusk = sectors[np.argmin(np.abs(sectors - 18.0))]
    s_dawn = sectors[np.argmin(np.abs(sectors - 6.0))]
    for s0, color in ((s_dusk, "C3"), (s_dawn, "C0")):
        mp = hit & (np.abs(mlt - s0) < 0.6)
        mc = hit_c & (np.abs(mlt - s0) < 0.6)
        axl.hist(lat_land[mp], bins=40, histtype="step", color=color,
                 label=f"{s0:.0f} MLT, plume")
        axl.hist(lat_c[mc], bins=40, histtype="step", color=color,
                 ls="--", alpha=0.6, label=f"{s0:.0f} MLT, control")
    axl.set_xlabel("landing latitude [deg]")
    axl.set_ylabel("rays")
    axl.grid(alpha=0.3)
    axl.set_title("landing footprint by sector", fontsize=10)
    axl.legend(fontsize=8)

    fig.tight_layout()
    path = os.path.join(OUT, "global_plume_ensemble.png")
    fig.savefig(path, dpi=120)
    print(path)
    i_anchor = np.argmin(np.abs(sectors - anchor))
    print(f"knee-crossers: {int(kc.sum())}; "
          f"max sector p90|dlat| {max(p90_dlat):.2f} deg; "
          f"anchor-meridian p90 {p90_dlat[i_anchor]:.4f} deg (exact-0 check); "
          f"status flips {int((st != st_c).sum())}/{st.size}")


if __name__ == "__main__":
    main()
