"""Round-3 per-step cost experiments on the real chip.

Measures, on the live TPU:
  1. DP5 attempt throughput at several widths (after the round-3
     division-count reduction in ops/fused.py + ops/rhs.py);
  2. the ILP experiment -- G independent sub-batch chains interleaved in
     ONE loop body ("pack 2 rays into one lane's op stream"): does XLA's
     scheduler overlap independent RHS dependency chains where a single
     batched chain stalls on VPU latency?
  3. BS3(2) vs DP5 attempt cost (the cheaper-stepper experiment);
  4. headline dt analysis: mean accepted dt vs dt_max from the final
     ensemble state (is the step budget spent against the dt ceiling?).

Writes benchmarks/perf_r03.json. Run directly on the chip host:
  python benchmarks/perf_r03.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "perf_r03.json")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec
    from raytrace_tpu.integrate.solve import _step_one, init_carry
    from raytrace_tpu.models import cast_env, make_env_lat
    from raytrace_tpu.ops import rhs

    quick = "--quick" in sys.argv
    env = cast_env(make_env_lat(), jnp.float32)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4)
    spec = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)  # noqa: E731

    def make_batch(n, seed=0):
        rng = np.random.default_rng(seed)
        u0 = np.zeros((n, 4), np.float32)
        u0[:, 0] = (RE + 1.0e6) / RE
        u0[:, 1] = rng.uniform(0.45, 1.1, n)
        u0[:, 2] = rng.uniform(-0.5, 0.5, n)
        f = rng.uniform(500.0, 8000.0, n).astype(np.float32)
        return jnp.asarray(u0), jnp.asarray(f)

    def step_b(stepper):
        one = lambda c, ff: _step_one(
            rhs_fn, c, ff, cfg=cfg, spec=spec, group_idx=3, adaptive=True,
            stepper=stepper,
        )
        return jax.vmap(one)

    CHUNK = 64

    def timed(fn, args, iters=3):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    results = {"chunk": CHUNK}

    # ---- 1 + 2: width sweep x group count (G independent chains) ----
    widths = (256, 1024, 4096, 10240) if not quick else (256, 10240)
    groups = (1, 2, 4)
    sweep = {}
    for n in widths:
        u0, f = make_batch(n)
        sb = step_b("dopri5")
        carry0 = jax.vmap(lambda u, ff: init_carry(rhs_fn, u, ff, cfg))(
            u0, f
        )
        for g in groups:
            if n % g:
                continue
            m = n // g
            cs = tuple(
                jax.tree.map(lambda a: a[i * m:(i + 1) * m], carry0)
                for i in range(g)
            )
            fs = tuple(f[i * m:(i + 1) * m] for i in range(g))

            @jax.jit
            def run(cs, fs):
                def body(_, cs):
                    # G independent chains in ONE loop body: the XLA
                    # scheduler may interleave their op streams
                    return tuple(step_b("dopri5")(c, ff)
                                 for c, ff in zip(cs, fs))

                return jax.lax.fori_loop(0, CHUNK, body, cs)

            wall, _ = timed(run, (cs, fs))
            rate = n * CHUNK / wall
            sweep[f"w{n}_g{g}"] = {
                "lane_steps_per_s": round(rate / 1e6, 2),
                "us_per_attempt": round(wall / CHUNK * 1e6, 1),
            }
            print(f"width {n:6d} groups {g}: {rate/1e6:7.2f}M lane-steps/s "
                  f"({wall/CHUNK*1e6:7.1f} us/attempt)", flush=True)
    results["dp5_sweep"] = sweep

    # ---- 3: BS3 vs DP5 attempt cost at the headline width ----
    n = 10240
    u0, f = make_batch(n)
    for st in ("dopri5", "bs3"):
        sb = step_b(st)
        carry0 = jax.vmap(lambda u, ff: init_carry(rhs_fn, u, ff, cfg))(
            u0, f
        )

        @jax.jit
        def run(c, ff):
            return jax.lax.fori_loop(0, CHUNK, lambda _, cc: sb(cc, ff), c)

        wall, _ = timed(run, (carry0, f))
        results[f"{st}_attempt_us_10240"] = round(wall / CHUNK * 1e6, 1)
        results[f"{st}_lane_steps_per_s_10240"] = round(
            n * CHUNK / wall / 1e6, 2
        )
        print(f"{st}: {n*CHUNK/wall/1e6:.2f}M lane-steps/s", flush=True)

    # ---- 4: headline dt analysis + BS3 end-to-end ----
    from raytrace_tpu.parallel import (
        LaunchSpec, build_launch, make_ray_mesh, pad_batch,
    )
    from raytrace_tpu.parallel.ensemble import make_rounds_tracer

    mesh = make_ray_mesh()
    spec10k = LaunchSpec(
        lats=tuple(np.linspace(0.45, 1.1, 40)),
        chis=tuple(np.linspace(-0.5, 0.5, 16)),
        freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
    )
    u0e, fe, valid = pad_batch(*build_launch(spec10k, np.float32), mesh)
    for st in ("auto", "bs3"):
        tracer = make_rounds_tracer(
            env, mesh=mesh, cfg=cfg, spec=spec10k_stop(RE),
            max_steps=20000, round_steps=(2048, 2048, 1024), chunk=512,
            bucket_floor=256, stepper=st, want_carry=(st == "auto"),
        )
        tracer(u0e, fe, valid)  # compile + warm
        t0 = time.perf_counter()
        res = tracer(u0e, fe, valid)
        wall = time.perf_counter() - t0
        acc = np.asarray(res.n_accept)[valid]
        rej = np.asarray(res.n_reject)[valid]
        steps = int(acc.sum() + rej.sum())
        rec = {
            "wall_s": round(wall, 3),
            "attempted_steps": steps,
            "steps_per_s": round(steps / wall / 1e6, 2),
            "rejection_pct": round(100.0 * rej.sum() / max(steps, 1), 1),
        }
        if st == "auto" and res.carry is not None:
            # mean accepted dt per ray vs the dt ceiling
            t_fin = np.asarray(res.t)[valid]
            mean_dt = t_fin / np.maximum(acc, 1)
            dt_max = float(cfg.dt_max)
            rec["dt_max"] = dt_max
            rec["frac_rays_mean_dt_over_half_ceiling"] = round(
                float((mean_dt > 0.5 * dt_max).mean()), 3
            )
            rec["median_mean_dt_over_dtmax"] = round(
                float(np.median(mean_dt) / dt_max), 3
            )
        results[f"headline_{st}"] = rec
        print(f"headline {st}: {rec}", flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


def spec10k_stop(RE):
    from raytrace_tpu.integrate import StopSpec

    return StopSpec(r_floor=1.0, t_max=5.0e9 / RE)


if __name__ == "__main__":
    main()
