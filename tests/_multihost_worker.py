"""Worker process for the real 2-process DCN integration test.

Launched by tests/test_parallel.py::test_multihost_two_real_processes --
each worker initializes jax.distributed against a localhost coordinator
(the standard multi-controller setup, SURVEY.md section 5.8), traces its
slice of a shared global launch grid through the production multihost
path, and prints its LOCAL stats row plus (every process computes it --
SPMD) the GLOBAL aggregated stats as JSON lines.

Usage: python _multihost_worker.py <port> <num_processes> <process_id>
"""

import json
import sys


def main():
    port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # the axon plugin's sitecustomize pins jax_platforms at interpreter
    # start; force the CPU backend before any backend use
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc

    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.parallel import LaunchSpec, build_launch
    from raytrace_tpu.parallel import distributed as dist
    from raytrace_tpu.parallel.ensemble import ensemble_stats

    env = make_env_lat()
    # identical global grid on every process (SPMD)
    spec = LaunchSpec(
        lats=tuple(np.linspace(0.6, 0.9, 4)), chis=(0.0,),
        freqs=(1000.0, 2000.0),
    )
    u0, f = build_launch(spec)
    kw = dict(
        cfg=SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE),
        max_steps=2000, round_steps=1024, chunk=64, bucket_floor=8,
    )
    res, v_l, gstats = dist.trace_ensemble_multihost(env, u0, f, tracer_kw=kw)
    local = {
        k: float(v)
        for k, v in ensemble_stats(res, v_l, xp=np).items()
    }
    print(f"LOCAL {pid} " + json.dumps(local), flush=True)
    print(f"GLOBAL {pid} " + json.dumps(gstats), flush=True)


if __name__ == "__main__":
    main()
