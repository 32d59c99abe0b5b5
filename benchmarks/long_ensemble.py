"""Long multi-frequency ensemble with checkpoint/resume (SURVEY.md 5.4,
build-plan step 8).

Demonstrates the preemption-recovery story for production ensembles: the
integration runs in rounds; the full per-ray RayCarry is checkpointed to
.npz after each round; a (simulated) preemption at any round resumes
bit-exactly.

Usage:
  python benchmarks/long_ensemble.py            # run, checkpointing
  python benchmarks/long_ensemble.py --resume   # continue from checkpoint
  python benchmarks/long_ensemble.py --verify   # prove kill+resume == run
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "long_ensemble.ckpt.npz")


def build():
    import jax.numpy as jnp

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.models import cast_env, make_env_lat
    from raytrace_tpu.ops import rhs as rhs_mod
    from raytrace_tpu.parallel import LaunchSpec, build_launch, make_ray_mesh, pad_batch

    mesh = make_ray_mesh()
    env = cast_env(make_env_lat(), jnp.float32)
    spec_l = LaunchSpec(
        lats=tuple(np.linspace(0.5, 1.0, 8)),
        chis=(0.0,),
        freqs=tuple(np.geomspace(300.0, 12000.0, 32)),  # wide f sweep
    )
    u0, f, valid = pad_batch(*build_launch(spec_l, np.float32), mesh)
    rhs_fn = lambda u, ff: rhs_mod.rhs_2d_lat(u, ff, env)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4)
    stop = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)
    return trace, rhs_fn, u0, f, valid, cfg, stop


def run(resume=False, rounds=10, round_steps=2048, quiet=False):
    import jax
    import jax.numpy as jnp

    from raytrace_tpu.integrate import events
    from raytrace_tpu.parallel import checkpoint

    trace, rhs_fn, u0, f, valid, cfg, stop = build()
    carry, start_round = None, 0
    if resume and os.path.exists(CKPT):
        carry, start_round, _ = checkpoint.load_carry(CKPT)
        carry = jax.tree.map(jnp.asarray, carry)
        if not quiet:
            print(f"resumed from round {start_round}")
    result = None
    for i in range(start_round, rounds):
        result = trace(
            rhs_fn, jnp.asarray(u0), jnp.asarray(f), cfg=cfg, spec=stop,
            max_steps=round_steps, carry0=carry,
        )
        carry = result.carry
        checkpoint.save_carry(CKPT, jax.tree.map(np.asarray, carry), step=i + 1)
        active = int((np.asarray(carry.status)[valid] == events.ACTIVE).sum())
        if not quiet:
            print(f"round {i + 1}/{rounds}: {active} rays still active")
        if active == 0:
            break
    return jax.tree.map(np.asarray, carry)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resume", action="store_true")
    p.add_argument("--verify", action="store_true")
    p.add_argument("--rounds", type=int, default=10)
    args = p.parse_args()
    if args.verify:
        # uninterrupted run
        if os.path.exists(CKPT):
            os.remove(CKPT)
        full = run(rounds=args.rounds, quiet=True)
        # interrupted: 3 rounds, "preempt", resume to completion
        os.remove(CKPT)
        run(rounds=3, quiet=True)
        resumed = run(resume=True, rounds=args.rounds, quiet=True)
        for name in full._fields:
            np.testing.assert_array_equal(
                getattr(full, name), getattr(resumed, name), err_msg=name
            )
        print("verify OK: kill-after-3-rounds + resume == uninterrupted run")
        return
    t0 = time.perf_counter()
    carry = run(resume=args.resume, rounds=args.rounds)
    print(f"done in {time.perf_counter() - t0:.1f}s; checkpoint at {CKPT}")


if __name__ == "__main__":
    main()
