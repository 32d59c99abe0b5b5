"""Headline benchmark: 10k-ray whistler ensemble throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ray-steps/sec/chip, "unit": "steps/s",
   "vs_baseline": single_ray_cpu_f64_wallclock / ensemble_wallclock}

The reference publishes no numbers (BASELINE.md), so the baseline proxy is
what BASELINE.json specifies: a single canonical ray traced by the CPU
float64 reference path (standing in for the Julia script's wall-clock).
vs_baseline > 1 means the whole 10k-ray TPU ensemble finishes faster than
one CPU reference ray -- the north-star target.

The CPU proxy is measured in a subprocess (the axon plugin pins the main
process's platform list), FRESH each run as a median of 3 with the spread
reported -- it is host-of-the-day noise (3.72 s -> 17.95 s across rounds
2-3 on identical work), so cross-round perf claims should use the
steps/s value and the pinned-denominator vs_native_compiled ratio, not
vs_baseline.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cpu_baseline.json")

N_LATS = 40
N_CHIS = 16
N_FREQS = 16  # 40*16*16 = 10240 rays
MAX_STEPS = 20000


def measure_cpu_single_ray():
    """Wall-clock of one canonical ray on CPU float64 (post-compile).

    Median of 3 post-compile runs, with the spread reported: the proxy is
    host-speed-of-the-day noise (measured 3.72 s -> 17.95 s across rounds
    on the same workload), so vs_baseline is only meaningful WITH its
    denominator's spread attached -- the pinned cross-round ratio is
    vs_native_compiled."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    env = make_env_lat()
    u0 = jnp.array([[(RE + 1.0e6) / RE, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])

    def run():
        res = trace(
            lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
            cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
            spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
            max_steps=MAX_STEPS,
        )
        jax.block_until_ready(res.u)
        return res

    run()  # compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    steps = int(res.n_accept[0]) + int(res.n_reject[0])
    return {"wall_s": walls[1], "wall_min_s": walls[0],
            "wall_max_s": walls[-1], "steps": steps}


def measure_native_single_ray():
    """Honest compiled-baseline: the C++ float64 oracle tracing the same
    canonical ray (what a native CVODE-class integrator costs)."""
    import numpy as np

    from raytrace_tpu import native
    from raytrace_tpu.constants import RE
    from raytrace_tpu.models import make_env_lat

    env = make_env_lat()
    u0 = np.array([(RE + 1.0e6) / RE, np.pi / 4, 0.0, 0.0])
    native.trace_2d_lat(u0, 1000.0, env, t_max=5e9 / RE)  # warm
    t0 = time.perf_counter()
    res = native.trace_2d_lat(u0, 1000.0, env, t_max=5e9 / RE)
    wall = time.perf_counter() - t0
    return {"wall_s": wall, "steps": res["n_accept"] + res["n_reject"]}


def cpu_baseline():
    """Always measured FRESH (same-day denominator): the old run-to-run
    cache made vs_baseline compare a today-TPU numerator against a
    whenever-the-cache-was-written denominator -- the dominant source of
    its 4.8x cross-round swings. The cache file now only records the last
    measurement for inspection."""
    out = subprocess.run(
        [sys.executable, __file__, "--cpu-baseline"],
        capture_output=True, text=True, cwd=REPO, timeout=1200,
    )
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    with open(CACHE, "w") as fh:
        json.dump(data, fh)
    return data


def measure_tpu_ensemble():
    import jax
    import numpy as np

    from raytrace_tpu.utils.cache import enable_compilation_cache

    # persist tracer programs across bench subprocesses (each retry/run is
    # a fresh interpreter; without this every attempt re-pays the full
    # tunnel compile)
    enable_compilation_cache()

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.parallel import (
        LaunchSpec, build_launch, make_ray_mesh, pad_batch,
    )
    from raytrace_tpu.parallel.ensemble import make_rounds_tracer

    mesh = make_ray_mesh()
    env = make_env_lat()
    import jax.numpy as jnp

    from raytrace_tpu.models import cast_env

    env = cast_env(env, jnp.float32)
    spec = LaunchSpec(
        lats=tuple(np.linspace(0.45, 1.1, N_LATS)),
        chis=tuple(np.linspace(-0.5, 0.5, N_CHIS)),
        freqs=tuple(np.geomspace(500.0, 8000.0, N_FREQS)),
    )
    u0, f, valid = pad_batch(*build_launch(spec, np.float32), mesh)
    tracer = make_rounds_tracer(
        env,
        mesh=mesh,
        cfg=SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
        max_steps=MAX_STEPS,
        # schedule re-tuned on-chip (round 2, second pass): rounds shrink
        # with the active set (measured per-round walls in BASELINE.md),
        # the bucket floor sits at the latency knee (256 lanes), and the
        # tail-merge in the tracer absorbs the stragglers
        round_steps=(2048, 2048, 1024),
        chunk=512,  # exit-check cadence: 512 measured ~2% over 256
        bucket_floor=256,
        # auto stepping over the BS3 base (round 3): the ensemble rides
        # dt_max (median accepted dt = 0.985 dt_max, perf_r03.json), so
        # the half-stage-cost 3(2) pair wins ~1.7x wall at the same
        # tolerance contract; the stiff ros2x pool is unchanged.
        # Validated vs the DP5 run: same tolerance-gated physics
        # (perf_r03b.json: 8820 vs 8810 hits, median landing L within
        # 5e-4 relative).
        stepper="auto",
        base_stepper="bs3",
        want_carry=False,  # the bench reads results, not solver state
    )

    tracer(u0, f, valid)  # compile every bucket + warm run
    t0 = time.perf_counter()
    res = tracer(u0, f, valid)
    wall = time.perf_counter() - t0
    steps = int(np.sum(np.asarray(res.n_accept)[valid])) + int(
        np.sum(np.asarray(res.n_reject)[valid])
    )
    return {
        "wall_s": wall,
        "rays": int(valid.sum()),
        "ray_steps": steps,
        "n_devices": mesh.devices.size,
    }


def measure_tpu_ensemble_3d():
    """The 3D production headline (VERDICT r3 #1): the 10,240-ray 7-state
    ensemble (preset ensemble10k_3d -- lat x chi x freq fan launched ON
    the dispersion surface, 12 dispersion evals/RHS in the reference,
    RayTrace_3D.jl:336-344) through the rounds tracer with its on-chip-
    tuned (512, 1024, 2048) schedule."""
    import jax

    from raytrace_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.config import preset
    from raytrace_tpu.models import cast_env
    from raytrace_tpu.parallel import make_ray_mesh, pad_batch
    from raytrace_tpu.parallel.ensemble import make_rounds_tracer
    from raytrace_tpu.run import _build_u0

    cfg = preset("ensemble10k_3d")
    env = cast_env(cfg.medium.build(), jnp.float32)
    mesh = make_ray_mesh()
    u0, f = _build_u0(cfg, np.float32)
    u0, f, valid = pad_batch(u0, f, mesh)
    tracer = make_rounds_tracer(
        env, mesh=mesh, frame="3d", cfg=cfg.solver(), spec=cfg.stop(),
        max_steps=cfg.max_steps, round_steps=tuple(cfg.round_steps),
        chunk=512, bucket_floor=256, stepper="auto",
        base_stepper=cfg.base_stepper, want_carry=False,
    )
    tracer(u0, f, valid)  # compile + warm
    t0 = time.perf_counter()
    res = tracer(u0, f, valid)
    wall = time.perf_counter() - t0
    v = __import__("numpy").asarray(valid)
    steps = int((res.n_accept + res.n_reject)[v].sum())
    st = res.status[v]
    return {
        "wall_s": wall, "rays": int(v.sum()), "ray_steps": steps,
        "hits": int((st == 1).sum()),
        "n_devices": mesh.devices.size,
    }


LAST_GOOD = os.path.join(REPO, ".bench_last_good.json")


def tpu_ensemble_with_retries(attempts=4, timeout_s=900, flag="--tpu-ensemble",
                              cache=LAST_GOOD):
    """Run a TPU measurement in a subprocess with timeout + retry.

    The tunneled compile service for this environment intermittently hangs
    on large-program compiles (reproduced on trivial programs too); a
    fresh process gets a fresh chance, and a successful measurement is
    cached so a later full outage still yields an honest (marked stale)
    number instead of a hung driver."""
    for _ in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, __file__, flag],
                capture_output=True, text=True, cwd=REPO, timeout=timeout_s,
            )
            for line in reversed(out.stdout.strip().splitlines()):
                if line.startswith("{"):
                    ens = json.loads(line)
                    with open(cache, "w") as fh:
                        json.dump(ens, fh)
                    return ens
        except subprocess.TimeoutExpired:
            continue
    if os.path.exists(cache):
        with open(cache) as fh:
            ens = json.load(fh)
        ens["stale"] = True
        return ens
    raise RuntimeError(f"TPU measurement {flag} failed every attempt")


def pallas_record():
    """Latest SUCCESSFUL on-chip Pallas measurement (the r03 re-run hit a
    full Mosaic-relay outage -- 5/5 compile hangs -- recorded in
    pallas_r03.json; the kernel-tier decision is closed in DESIGN.md)."""
    path = None
    for name in ("pallas_r05.json", "pallas_r03.json", "pallas_r02.json"):
        cand = os.path.join(REPO, "benchmarks", name)
        if os.path.exists(cand):
            with open(cand) as fh:
                if json.load(fh).get("ok"):
                    path = cand
                    break
    if path is None:
        return None
    with open(path) as fh:
        rec = json.load(fh)
    keep = ("ok", "block", "pallas_lane_steps_per_s",
            "xla_lane_steps_per_s", "parity_one_step_max_abs_err",
            "attempts")
    return {k: rec[k] for k in keep if k in rec}


_RESULTS_ROWS = None


def results_json_record(config, extra=()):
    """Committed warm-pass record of a preset from the per-config
    harness (benchmarks/run_all.py) -- cited, not re-measured, so the
    headline bench does not pay extra full compiles through the
    tunnel. The file is read once per process."""
    global _RESULTS_ROWS
    if _RESULTS_ROWS is None:
        path = os.path.join(REPO, "benchmarks", "results.json")
        if not os.path.exists(path):
            _RESULTS_ROWS = []
        else:
            with open(path) as fh:
                rows = json.load(fh)
            _RESULTS_ROWS = (
                rows if isinstance(rows, list) else rows.get("results", [])
            )
    for row in _RESULTS_ROWS:
        if row.get("config") == config:
            return {
                "wall_s": row["wall_s"],
                "ray_steps": row["ray_steps"],
                **{k: row[k] for k in extra if k in row},
                "source": "benchmarks/results.json (run_all.py warm pass)",
            }
    return None


def production_record():
    """The production arc-ceiling preset (ensemble10k_production:
    ds_max 2e6 m + phase bound 8e6 m). Same workload as the headline,
    landing medians inside tolerance noise (benchmarks/perf_r03h.json)."""
    return results_json_record("ensemble10k_production")


def main():
    if "--cpu-baseline" in sys.argv:
        print(json.dumps(measure_cpu_single_ray()))
        return
    if "--tpu-ensemble" in sys.argv:
        print(json.dumps(measure_tpu_ensemble()))
        return
    if "--tpu-ensemble-3d" in sys.argv:
        print(json.dumps(measure_tpu_ensemble_3d()))
        return
    base = cpu_baseline()
    nat = measure_native_single_ray()
    ens = tpu_ensemble_with_retries()
    ens3 = tpu_ensemble_with_retries(
        flag="--tpu-ensemble-3d",
        cache=os.path.join(REPO, ".bench_last_good_3d.json"),
    )
    steps_per_sec = ens["ray_steps"] / ens["wall_s"] / ens["n_devices"]
    print(
        json.dumps(
            {
                "metric": (
                    "ray-steps/sec/chip (10k-ray whistler ensemble); "
                    "single-ray trace wall-clock"
                ),
                "value": round(steps_per_sec, 1),
                "unit": "steps/s",
                # vs_baseline divides by the BASELINE.json-designated CPU
                # f64 single-ray proxy, measured FRESH (median of 3, see
                # cpu_proxy_spread_s) -- still host-of-the-day noise, so
                # the PRIMARY cross-round ratio is vs_native_compiled
                "vs_baseline": round(base["wall_s"] / ens["wall_s"], 3),
                # PRIMARY ratio (VERDICT r2 #8, r3 #6): ensemble
                # ray-retire rate vs the in-repo C++ DP5 oracle's single
                # compiled ray -- the honest Sundials-class number with a
                # pinned denominator (vs_baseline's CPU-JAX proxy is
                # ~100x slower than compiled code and swings with host
                # load; its spread is attached in detail)
                "vs_native_compiled": round(
                    (ens["rays"] / ens["wall_s"]) * nat["wall_s"], 1
                ),
                "detail": {
                    "ensemble_wall_s": round(ens["wall_s"], 3),
                    "ensemble_rays": ens["rays"],
                    "ensemble_ray_steps": ens["ray_steps"],
                    "cpu_single_ray_wall_s": round(base["wall_s"], 3),
                    "cpu_proxy_spread_s": [
                        round(base.get("wall_min_s", base["wall_s"]), 3),
                        round(base.get("wall_max_s", base["wall_s"]), 3),
                    ],
                    "cpu_single_ray_steps": base["steps"],
                    "native_cpp_single_ray_wall_s": round(nat["wall_s"], 4),
                    # the 3D production headline (7-state Kimura frame):
                    # same 10,240-ray fan shape, on-shell launch, tuned
                    # (512, 1024, 2048) schedule
                    "ensemble10k_3d": {
                        "wall_s": round(ens3["wall_s"], 3),
                        "ray_steps": ens3["ray_steps"],
                        "steps_per_s": round(
                            ens3["ray_steps"] / ens3["wall_s"]
                            / ens3["n_devices"], 1),
                        "hits": ens3.get("hits"),
                        **({"stale": True} if ens3.get("stale") else {}),
                    },
                    # honest compiled-baseline ratio: ensemble rays/s vs the
                    # C++ oracle's single compiled ray (see BASELINE.md)
                    "ensemble_rays_per_s_vs_native_ray_per_s": round(
                        (ens["rays"] / ens["wall_s"]) * nat["wall_s"], 1
                    ),
                    **({"pallas_on_chip": pallas_record()}
                       if pallas_record() else {}),
                    # cited per-config harness rows: the production
                    # arc-ceiling preset, and the round-5 capability
                    # rows -- 3D magnetospheric reflection and the
                    # non-dipole (tilted/IGRF, general hybrid fused
                    # chain) production presets
                    **{
                        k: v for k, v in (
                            ("production_arc_ceiling", production_record()),
                            ("mr_fan_3d",
                             results_json_record("mr_fan_3d", ("status",))),
                            ("ensemble10k_tilted",
                             results_json_record("ensemble10k_tilted")),
                            ("ensemble10k_igrf",
                             results_json_record("ensemble10k_igrf")),
                        ) if v
                    },
                    **({"stale_tpu_measurement": True} if ens.get("stale") else {}),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
