"""Communication model of the sharded training step (VERDICT r4 #6).

Wall-clock weak scaling on the virtual CPU mesh is bounded by 1-core thread
rendezvous (8 device threads context-switching on one physical core), so the
measured ratios are an upper bound on overhead, not an estimate of it
(tools/weak_scaling.py rows carry that caveat). This tool produces the
architecture-level number that actually predicts multi-chip behavior: the
BYTES MOVED BY COLLECTIVES per iteration in the exact compiled sharded
program, vs the per-chip compute time.

Method: lower the same env-axis-DP train_iteration `dryrun_multichip` runs,
at production scale (4096 envs) over an 8-device virtual mesh; parse the
optimized HLO for collective ops (all-reduce / all-gather / reduce-scatter /
collective-permute) and sum their output bytes. Communication time on real
hardware = bytes / ICI bandwidth (v5e: ~45 GB/s/link duplex ring, 2 links
per chip => ~90 GB/s usable per chip for bidirectional ring collectives);
compare against the measured per-iteration compute time (BENCH: 0.506 s at
4096 envs) for the communication fraction.

Usage: python tools/comm_model.py [n_devices=8] [num_envs=4096]
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}


def shape_bytes(shape_str):
    """'f32[4096,29]' -> bytes; tuples '(f32[..], f32[..])' -> sum."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    n_devices = int(kv.get("n_devices", 8))
    num_envs = int(kv.get("num_envs", 4096))

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}")

    import jax

    jax.config.update("jax_platforms", "cpu")
    from pbhc_tpu.utils.cpu_cache import setup_cpu_cache

    setup_cpu_cache(min_compile_secs=1.0)

    import __graft_entry__ as ge
    from pbhc_tpu.parallel.mesh import make_mesh, shard_train_state

    mesh = make_mesh(n_devices)
    env, algo = ge._build(num_envs=num_envs)
    ts = algo.init_train_state(jax.random.PRNGKey(0))
    ts = shard_train_state(ts, mesh, num_envs)
    ctx = jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh
    with ctx:
        compiled = jax.jit(algo.train_iteration).lower(ts).compile()
    hlo = compiled.as_text()

    # line-based: take the shapes on the LHS of `= <shape> <op>(`; ring-
    # collective bytes on the wire per device: all-gather moves
    # out*(n-1)/n, all-reduce moves 2*size*(n-1)/n (reduce-scatter+gather)
    counts, byte_totals = {}, {}
    ops = ("all-reduce", "all-gather", "reduce-scatter",
           "collective-permute", "all-to-all")
    for line in hlo.splitlines():
        for op in ops:
            if f" {op}(" in line or f" {op}-start(" in line:
                lhs = line.split(f" {op}", 1)[0]
                out_b = shape_bytes(lhs.split("=", 1)[-1])
                factor = ((n_devices - 1) / n_devices
                          * (2.0 if op == "all-reduce" else 1.0))
                counts[op] = counts.get(op, 0) + 1
                byte_totals[op] = byte_totals.get(op, 0) + int(out_b * factor)
                break

    # NOTE: algo here uses the dryrun's shrunken PPO sizing (_build sets
    # num_steps_per_env=2, 1 epoch); collective VOLUME per update is
    # unchanged (grad psum size depends on param count, not steps), but
    # scale compute-side numbers with care.
    total_bytes = sum(byte_totals.values())
    per_chip_time = float(kv.get("iter_time_s", 0.506))
    ici_gbs = float(kv.get("ici_gbs", 90.0))
    comm_s = total_bytes / (ici_gbs * 1e9)
    print(json.dumps({
        "n_devices": n_devices, "num_envs": num_envs,
        "collective_ops": counts, "collective_bytes": byte_totals,
        "total_collective_bytes_per_iter": total_bytes,
        "est_comm_time_s": round(comm_s, 6),
        "measured_iter_time_s": per_chip_time,
        "comm_fraction": round(comm_s / per_chip_time, 6),
    }))


if __name__ == "__main__":
    main()
