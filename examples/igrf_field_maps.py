"""IGRF-truncation field maps: what degree 2-3 adds over the dipole.

Surface-field magnitude map of the degree-3 IGRF truncation
(models/dipole.py::b_vec_igrf, IGRF-13 epoch 2020) against the tilted
centered dipole extracted from its own degree-1 part. The difference map
shows the real longitudinal structure the higher degrees carry -- the
South Atlantic weak region and the Siberian/American lobes -- which is
what makes 3D rays genuinely longitude-dependent under b_model="igrf".

Writes examples/output/igrf_maps.png. Runs anywhere (CPU, seconds).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    import jax

    # host-side mapping work: keep it off the tunneled chip (the axon
    # plugin pins jax_platforms at interpreter start, so config it away)
    jax.config.update("jax_platforms", "cpu")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from raytrace_tpu.models import dipole

    os.makedirs(OUT, exist_ok=True)

    coeffs = dipole.IGRF13_2020
    b0, tilt, phi0 = dipole.igrf_dipole(coeffs)

    lat = np.linspace(-85.0, 85.0, 180)
    lon = np.linspace(-180.0, 180.0, 360)
    LO, LA = np.meshgrid(lon, lat)
    theta = np.radians(90.0 - LA)
    phi = np.radians(LO)

    def bmag(fn):
        br, bt, bp = fn(1.0, theta.ravel(), phi.ravel())
        return np.sqrt(
            np.asarray(br) ** 2 + np.asarray(bt) ** 2 + np.asarray(bp) ** 2
        ).reshape(theta.shape)

    b_igrf = bmag(lambda r, t, p: dipole.b_vec_igrf(r, t, p, coeffs))
    b_dip = bmag(lambda r, t, p: dipole.b_vec_tilted(r, t, p, b0, tilt, phi0))

    fig, axes = plt.subplots(3, 1, figsize=(9, 11))
    for ax, data, title, cmap in (
        (axes[0], b_igrf * 1e6, "|B| at the surface, IGRF degree-3 (uT)",
         "viridis"),
        (axes[1], b_dip * 1e6, "|B|, tilted centered dipole (degree 1 only)",
         "viridis"),
        (axes[2], (b_igrf - b_dip) * 1e6,
         "difference: what degrees 2-3 add (uT)", "RdBu_r"),
    ):
        kw = {}
        if cmap == "RdBu_r":
            m = np.abs(data).max()
            kw = dict(vmin=-m, vmax=m)
        im = ax.pcolormesh(lon, lat, data, cmap=cmap, shading="auto", **kw)
        fig.colorbar(im, ax=ax, shrink=0.9)
        ax.set_title(title)
        ax.set_ylabel("geographic latitude (deg)")
    axes[2].set_xlabel("geographic longitude (deg)")
    fig.tight_layout()
    path = os.path.join(OUT, "igrf_maps.png")
    fig.savefig(path, dpi=120)
    print("wrote", path)
    # the weak region should sit over the South Atlantic (lat ~ -25,
    # lon ~ -50) and be substantially below the dipole-only minimum
    imin = np.unravel_index(np.argmin(b_igrf), b_igrf.shape)
    print("surface |B| min: %.1f uT at lat %.0f lon %.0f"
          % (b_igrf[imin] * 1e6, lat[imin[0]], lon[imin[1]]))


if __name__ == "__main__":
    main()
