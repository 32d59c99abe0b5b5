"""Round-3 local arc ceiling: L-dependent spatial resolution on chip.

perf_r03f/h sized one global ds_max for the medium's sharpest feature
(the plasmapause knee), so the smooth 90% of every ray path is
over-resolved by the knee's requirement. SolverConfig.ds_local_knee
replaces the constant with a gradient-length profile of the medium
itself: ceiling = ds_local_w (the CA1992 transition scale) only within
the knee shell's radial distance |r - L_knee cos^2(mlat)|, opening to
r/4.5 (the L^-4.5 plasmasphere power law + dipole field scale)
elsewhere. dt_max stays as the outer phase bound.

Cases (10,240-ray headline shape, auto over bs3 base):
  prod_ctl   -- ensemble10k_production control (ds 2e6 m + phase 8e6 m)
  local      -- local profile (w = 0.1 RE), phase 8e6 m, no global clamp
  local_w06  -- tighter knee floor w = 0.06 RE (~the 6.4e5 m knee scale)

Writes benchmarks/perf_r03k.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03k.json")


def main():
    from raytrace_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec
    from raytrace_tpu.models import cast_env, make_env_lat
    from raytrace_tpu.parallel import (
        LaunchSpec, build_launch, make_ray_mesh, pad_batch,
    )
    from raytrace_tpu.parallel.ensemble import (
        ensemble_stats, make_rounds_tracer,
    )

    env64 = make_env_lat()
    knee_l = float(env64.lppo)
    env = cast_env(env64, jnp.float32)
    mesh = make_ray_mesh()
    spec10k = LaunchSpec(
        lats=tuple(np.linspace(0.45, 1.1, 40)),
        chis=tuple(np.linspace(-0.5, 0.5, 16)),
        freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
    )
    u0, f, valid = pad_batch(*build_launch(spec10k, np.float32), mesh)
    stop = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)

    def run_case(name, cfg):
        tracer = make_rounds_tracer(
            env, mesh=mesh, cfg=cfg, spec=stop, max_steps=20000,
            round_steps=(2048, 2048, 1024), chunk=512, bucket_floor=256,
            stepper="auto", base_stepper="bs3", want_carry=False,
        )
        tracer(u0, f, valid)  # compile + warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = tracer(u0, f, valid)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        acc = np.asarray(res.n_accept)[valid]
        rej = np.asarray(res.n_reject)[valid]
        steps = int(acc.sum() + rej.sum())
        stats = ensemble_stats(res, valid, xp=np)
        rec = {
            "wall_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls],
            "steps": steps,
            "rejection_pct": round(100.0 * float(rej.sum()) / max(steps, 1), 2),
            "status_counts": {
                k: int(v) for k, v in stats.items() if k.startswith("n_")
            },
            "median_landing_l": round(float(stats["median_landing_l"]), 6),
            "median_group_delay_s": round(
                float(stats["median_group_delay_s"]), 6
            ),
        }
        print(name, json.dumps(rec), flush=True)
        return rec

    base = dict(rtol=1e-5, atol=1e-8, dt0=1e-4, dt_max=8.0e6 / RE)
    results = {"knee_l": knee_l}
    results["prod_ctl"] = run_case(
        "prod_ctl", SolverConfig(ds_max=2.0e6 / RE, **base))
    results["local"] = run_case(
        "local", SolverConfig(ds_local_knee=knee_l, ds_local_w=0.1, **base))
    results["local_w06"] = run_case(
        "local_w06",
        SolverConfig(ds_local_knee=knee_l, ds_local_w=0.06, **base))

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
