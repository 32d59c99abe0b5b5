"""3D-frame ensemble throughput: 1,024 seven-state rays on one chip.

The headline tracks the 2D latitude frame; this records the 7-state 3D
frame (Kimura RHS, 12-term gradient chain, vector dipole) at ensemble
scale through the production rounds tracer -- the number a user doing
3D magnetospheric mapping cares about. Launches follow the canonical
RayTrace_3D.jl ICs fanned over latitude x frequency, with the initial
refractive-index vector solved on-shell per ray (consistent_rho_3d).

Cases:
  ref3d  -- reference phase ceiling dtmax = 1e6 m
  prod3d -- production arc ceiling (ds_max 2e6 m, phase 8e6 m)

Writes benchmarks/perf_r03j.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03j.json")


def main():
    from raytrace_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec
    from raytrace_tpu.models import cast_env, make_env
    from raytrace_tpu.ops.dispersion import consistent_rho_3d
    from raytrace_tpu.parallel import make_ray_mesh, pad_batch
    from raytrace_tpu.parallel.ensemble import (
        ensemble_stats, make_rounds_tracer,
    )

    env64 = make_env(b0=3.12e-5)
    env = cast_env(env64, jnp.float32)
    mesh = make_ray_mesh()

    lats = np.linspace(0.45, 1.1, 64)
    freqs = np.geomspace(500.0, 8000.0, 16)
    r0 = (RE + 1.0e6) / RE
    # on-shell launches: one vmapped call pinned to the CPU backend -- a
    # per-ray Python loop dispatches every jnp op through the tunnel at
    # 10-30 ms each (~minutes for 1024 rays), pure setup cost
    import jax
    lat_g, fq_g = np.meshgrid(lats, freqs, indexing="ij")
    th_g = (np.pi / 2 - lat_g).ravel()
    fs = fq_g.ravel()
    with jax.default_device(jax.devices("cpu")[0]):
        rho = jax.jit(jax.vmap(
            lambda th, fq: jnp.stack(consistent_rho_3d(
                r0, th, 0.0, (1.0, 1.0, 0.0), fq, env64))
        ))(jnp.asarray(th_g), jnp.asarray(fs))
        rho = np.asarray(rho)
    u0 = np.stack([
        np.full_like(th_g, r0), th_g, np.zeros_like(th_g),
        rho[:, 0], rho[:, 1], rho[:, 2], np.zeros_like(th_g),
    ], axis=1).astype(np.float32)
    f = fs.astype(np.float32)
    u0, f, valid = pad_batch(u0, f, mesh)
    stop = StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)

    def run_case(name, cfg):
        tracer = make_rounds_tracer(
            env, frame="3d", mesh=mesh, cfg=cfg, spec=stop,
            max_steps=20000, round_steps=(2048, 2048, 1024), chunk=512,
            bucket_floor=256, stepper="auto", want_carry=False,
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
        stats = ensemble_stats(res, valid, lat_sign=-1.0,
                               lat_offset=np.pi / 2, xp=np)
        rec = {
            "rays": int(np.asarray(valid).sum()),
            "wall_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls],
            "steps": steps,
            "steps_per_s_M": round(steps / wall / 1e6, 2),
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

    base = dict(rtol=1e-5, atol=1e-8, dt0=1e-4)
    results = {}
    # keep the pre-fix record: it is the measured evidence for the
    # cos(psi)-form reparameterization (ops/fused.py docstrings cite it)
    if os.path.exists(OUT):
        with open(OUT) as fh:
            prev = json.load(fh)
        if "before_cos_form" in prev:
            results["before_cos_form"] = prev["before_cos_form"]
    results["ref3d"] = run_case(
        "ref3d", SolverConfig(dt_max=1.0e6 / RE, **base))
    results["prod3d"] = run_case(
        "prod3d", SolverConfig(dt_max=8.0e6 / RE, ds_max=2.0e6 / RE, **base))

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
