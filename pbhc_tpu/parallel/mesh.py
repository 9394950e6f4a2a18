"""Device-mesh scale-out: env-axis data parallelism.

The workload's natural decomposition (SURVEY §2.10): environments shard
across chips, parameters replicate, and the only cross-chip traffic is the
gradient all-reduce XLA inserts for the replicated-parameter update — it
rides ICI inside a slice. Sim state stays device-local, so env throughput
scales linearly with chips (the reference is single-GPU, `train_agent.py:89`;
this module is the rebuild's `jax.distributed`-native equivalent).

Used by `pbhc_tpu.train` (auto-shards when >1 device is visible) and
`__graft_entry__.dryrun_multichip` (the driver's virtual-mesh validation).
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("env",))


def shard_env_tree(tree, mesh: Mesh, num_envs: int):
    """Shard every [num_envs, ...] leaf on the env axis; replicate the rest
    (curriculum scalars, shared RNG, adaptive sigmas)."""
    env_s = NamedSharding(mesh, P("env"))
    rep_s = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, env_s)
        return jax.device_put(x, rep_s)

    return jax.tree.map(place, tree)


def replicate_tree(tree, mesh: Mesh):
    rep_s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep_s), tree)


def shard_train_state(ts, mesh: Mesh, num_envs: int):
    """Place a TrainState for env-axis DP: env_state/obs shard, params and
    optimizer state replicate. Works for MHPPO and PPOMimic TrainStates
    (any dataclass with env_state/obs fields; every other field replicates)."""
    updates = {}
    for f in dataclasses.fields(ts):
        v = getattr(ts, f.name)
        if f.name in ("env_state", "obs"):
            updates[f.name] = shard_env_tree(v, mesh, num_envs)
        else:
            updates[f.name] = replicate_tree(v, mesh)
    return dataclasses.replace(ts, **updates)
