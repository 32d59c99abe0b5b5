"""Reproduce the reference's figures with the TPU framework.

One script covering every plot the Julia reference produces across its
script cells (SURVEY.md C22-C25):
  1. ray path over Earth disk + dipole field lines (RayMain.jl:403-404,
     RayTrace_lat.jl:354-355)
  2. saved-value diagnostics: mu, dmu/dpsi, dip, psi, step size vs step
     (RayTrace_lat.jl:357-378)
  3. refractive-index surface, B-aligned + x-y frames
     (RayTrace_lat.jl:380-416)
  4. environment maps: log10 n_e with L-shell contours, |B|, day/night
     terminator (RayTrace_3D.jl:504-586, plasmasphere.jl:157-233)
  5. equatorial density profile with Lppi/Lppo (plasmasphere.jl:134-155)

Writes PNGs to examples/output/. Runs anywhere (CPU ~1 min).
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
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.integrate.saving import make_save_fn_2d_lat
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs
    from raytrace_tpu.viz import (
        plot_density_profile,
        plot_diagnostics,
        plot_environment,
        plot_ray_paths,
        plot_refractive_surface,
    )

    os.makedirs(OUT, exist_ok=True)
    env = make_env_lat()

    # canonical RayTrace_lat ray with diagnostics recording
    u0 = jnp.array([[(RE + 1.0e6) / RE, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
        max_steps=8192, save_every=8, save_fn=make_save_fn_2d_lat(env),
    )
    plot_ray_paths(
        res.traj["u"], path=os.path.join(OUT, "ray_path.png"),
        title="canonical whistler ray (RayTrace_lat config)",
    )
    plot_diagnostics(
        np.asarray(res.traj["t"])[:, 0],
        np.asarray(res.traj["extras"])[:, 0, :],
        path=os.path.join(OUT, "diagnostics.png"),
    )
    # mu surface at the reference's test point (RayTrace_lat.jl:382-385)
    x_t, y_t = 9.031e6 / RE, 1.537e6 / RE
    lat_t = float(np.arctan(abs(y_t / x_t)))
    r_t = float(np.hypot(x_t, y_t))
    plot_refractive_surface(
        r_t, lat_t, 5000.0, env,
        path=os.path.join(OUT, "mu_surface.png"),
    )
    plot_environment(env, path=os.path.join(OUT, "environment.png"))
    plot_density_profile(env, path=os.path.join(OUT, "density_profile.png"))

    # 3D canonical ray (RayTrace_3D.jl:390-395) with the SavedValues
    # channel the reference left TODO (RayTrace_3D.jl:374-387)
    from raytrace_tpu.integrate.saving import save_fn_for
    from raytrace_tpu.models import make_env

    env3 = make_env()
    u0_3d = jnp.array([[(RE + 1.0e6) / RE, np.pi / 4, 0.0, 1.0, 1.0, 0.0, 0.0]])
    res3 = trace(
        lambda u, ff: rhs.rhs_3d(u, ff, env3), u0_3d, jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=2048, save_every=4,
        save_fn=save_fn_for("3d", env3),
    )
    plot_ray_paths(
        res3.traj["u"], frame="2d_colat",  # meridional plane: (r, theta)
        path=os.path.join(OUT, "ray_path_3d.png"),
        title="canonical 3D ray, meridional plane (RayTrace_3D config)",
    )
    plot_diagnostics(
        np.asarray(res3.traj["t"])[:, 0],
        np.asarray(res3.traj["extras"])[:, 0, :],
        path=os.path.join(OUT, "diagnostics_3d.png"),
    )
    for name in os.listdir(OUT):
        print(os.path.join(OUT, name))


if __name__ == "__main__":
    main()
