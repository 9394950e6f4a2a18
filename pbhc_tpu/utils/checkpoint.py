"""Structured checkpointing (reference train_agent.py:102-104 save/load +
config/base.yaml:16 auto_load_latest).

Checkpoints are Orbax PyTree directories (`ckpt/model_<it>/`) — versioned,
partially restorable, and restored INTO a target pytree so optax optimizer
structures survive round trips. Legacy `.pkl` checkpoints from earlier rounds
load transparently through the same API.
"""
from __future__ import annotations

import pickle
import re
from pathlib import Path

import jax
import numpy as np


def save_checkpoint_payload(path, payload) -> Path:
    """Save `payload` (a dict pytree) at `path` (extension-less dir)."""
    import orbax.checkpoint as ocp

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    ocp.PyTreeCheckpointer().save(path.resolve(), payload, force=True)
    return path


def load_checkpoint_payload(path, target=None) -> dict:
    """Load a checkpoint dir (Orbax) or legacy .pkl file.

    `target`: optional pytree whose STRUCTURE the restore must match (needed
    when the payload holds optax states — JSON round-trips turn tuples into
    lists otherwise). Extra/missing top-level keys vs `target` are tolerated.
    """
    path = Path(path)
    if path.is_file() or str(path).endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(path.resolve())
    if target is None:
        return raw
    # second pass restores INTO the target structures (tuple/namedtuple
    # fidelity); top-level keys absent from `target` keep the raw form
    item = {k: (jax.tree.map(np.asarray, target[k]) if k in target else v)
            for k, v in raw.items()}
    return ckptr.restore(path.resolve(), item=item)


def latest_checkpoint(root, experiment_name=None):
    """Newest `model_<it>` checkpoint under `root` (a run dir, its ckpt/, or
    a logs tree filtered by experiment name). Returns None when empty."""
    root = Path(root)
    pat = re.compile(r"model_(\d+)(\.pkl)?$")
    cands = []
    for p in root.rglob("model_*"):
        m = pat.match(p.name)
        if not m:
            continue
        if experiment_name and f"-{experiment_name}-" not in str(p.parent.parent):
            continue
        cands.append((int(m.group(1)), p.stat().st_mtime, p))
    if not cands:
        return None
    return max(cands)[2]
