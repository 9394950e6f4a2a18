"""Virtual-mesh weak scaling of the sharded training step (VERDICT r4 #6).

Times the FULL jitted MHPPO train iteration over an n-device virtual CPU mesh
(env-axis DP, the same program `__graft_entry__.dryrun_multichip` validates)
at a FIXED number of envs per device, for n in {1, 2, 4, 8}.

Interpretation on this 1-core host: the n virtual XLA:CPU devices all
serialize onto one physical core, so ideal weak scaling shows T(n) = n*T(1)
(n times the total compute, zero parallel hardware). Anything ABOVE that is
the overhead the sharded program ADDS — partition bookkeeping + the psum/
all-gather collectives in the update — i.e. exactly the term that would bend
the scaling curve on real chips, where compute is parallel and
T(n) = T(1)*(1+overhead(n)). We report
    overhead(n) = T(n) / (n * T(1)) - 1
per device count. CPU absolute throughput is irrelevant; the ratio is the
evidence (reference anchor: single-GPU design, train_agent.py:89 — the
reference has no scaling story to compare against).

Each device count runs in a fresh subprocess (XLA_FLAGS is read once per
process). Results: one JSON line per n on stdout.

Usage:
    python tools/weak_scaling.py [envs_per_device=32] [iters=6]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure_one(n_devices, envs_per_device, iters):
    """Runs in the child process: time the sharded train iteration."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}")

    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from pbhc_tpu.utils.cpu_cache import setup_cpu_cache

    setup_cpu_cache(min_compile_secs=1.0)

    import __graft_entry__ as ge
    from pbhc_tpu.parallel.mesh import make_mesh, shard_train_state

    mesh = make_mesh(n_devices)
    num_envs = envs_per_device * n_devices
    env, algo = ge._build(num_envs=num_envs)
    ts = algo.init_train_state(jax.random.PRNGKey(0))
    ts = shard_train_state(ts, mesh, num_envs)
    ctx = jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh
    with ctx:
        ts, _ = algo.train_iteration(ts)   # compile 1
        ts, _ = algo.train_iteration(ts)   # compile 2 (steady avals)
        jax.block_until_ready(ts.actor_params)
        t0 = time.time()
        for _ in range(iters):
            ts, _ = algo.train_iteration(ts)
        jax.block_until_ready(ts.actor_params)
        dt = (time.time() - t0) / iters
    print(json.dumps({
        "n_devices": n_devices, "envs_per_device": envs_per_device,
        "num_envs": num_envs, "sec_per_iter": round(dt, 4),
        "env_steps_per_sec": round(algo.num_steps * num_envs / dt, 1),
    }))


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    epd = int(kv.get("envs_per_device", 32))
    iters = int(kv.get("iters", 6))
    rows = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "child",
             str(n), str(epd), str(iters)],
            capture_output=True, text=True, cwd=REPO)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(json.dumps({"n_devices": n, "error": out.stderr[-400:]}))
            continue
        row = json.loads(line[-1])
        rows.append(row)
        if rows and rows[0]["n_devices"] == 1:
            t1 = rows[0]["sec_per_iter"]
            row["overhead_vs_serialized_ideal"] = round(
                row["sec_per_iter"] / (n * t1) - 1, 4)
        print(json.dumps(row))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        measure_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
