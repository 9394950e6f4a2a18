"""Minimal Hydra-style YAML config composition.

The reference uses Hydra 1.1 + OmegaConf (reference humanoidverse/config/,
SURVEY §5.6); neither ships in this image, so this module reimplements the
subset the framework needs:

* config groups: ``compose(cfg_dir, ["exp=motion_tracking", "robot=g1_23dof",
  "obs=motion_tracking", ...])`` deep-merges ``<group>/<name>.yaml`` files over
  ``base.yaml``; later groups win.
* dotted CLI overrides: ``"env.config.max_episode_length_s=20"``.
* interpolation: ``${a.b.c}`` references and ``${eval:'3 * ${robot.num_bodies}'}``
  arithmetic (reference obs yaml uses this for obs dims).
* a tiny attribute-access wrapper (`Cfg`) so env code reads
  ``config.obs.obs_dict`` like the reference does.

Files may declare ``defaults: [other, _self_]`` like Hydra to pull in sibling
files before/after their own content.
"""
from __future__ import annotations

import copy
import re
from pathlib import Path

import yaml


class Cfg(dict):
    """dict with attribute access (recursive)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Cfg({k: Cfg.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Cfg.wrap(v) for v in obj]
        return obj

    def get_path(self, dotted, default=None):
        node = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            deep_merge(dst[k], v)
        else:
            dst[k] = copy.deepcopy(v)
    return dst


def _parse_scalar(s: str):
    return yaml.safe_load(s)


def set_dotted(cfg: dict, dotted: str, value):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


_INTERP = re.compile(r"\$\{([^${}]+)\}")


def _resolve_str(s: str, root: dict, depth=0):
    if depth > 10:
        raise ValueError(f"interpolation loop resolving {s!r}")

    def lookup(path: str):
        node = root
        for part in path.split("."):
            node = node[part]
        return node

    original = s
    # eval resolver: ${eval:'expr'} — expr may itself contain ${...}
    while True:
        m = re.search(r"\$\{eval:\s*'([^']*)'\s*\}", s)
        if m is None:
            m = re.search(r"\$\{eval:\s*([^{}]*)\}", s)
        if m is None:
            break
        inner = _INTERP.sub(lambda mm: str(_resolve_value(lookup(mm.group(1)), root, depth + 1)), m.group(1))
        val = eval(inner, {"__builtins__": {}}, {})  # arithmetic only, no builtins
        s = s[: m.start()] + str(val) + s[m.end():]

    # pure reference: whole string is ${path} -> return typed value
    m = _INTERP.fullmatch(s.strip())
    if m and not m.group(1).startswith("eval:"):
        return _resolve_value(lookup(m.group(1)), root, depth + 1)

    # embedded references -> string substitution
    out = _INTERP.sub(lambda mm: str(_resolve_value(lookup(mm.group(1)), root, depth + 1)), s)
    if out != original:
        return _parse_scalar(out)   # eval/substitution happened -> re-type
    return s


def _resolve_value(v, root, depth=0, strict=True):
    if isinstance(v, str) and "${" in v:
        try:
            return _resolve_str(v, root, depth)
        except (KeyError, TypeError):
            # foreign resolvers (hydra ${now:...}, ${oc.env:...}) in snapshot
            # configs from the reference: keep the raw string in lenient mode
            if strict:
                raise
            return v
    return v


def resolve_interpolations(cfg: dict, strict: bool = True):
    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return _resolve_value(node, cfg, strict=strict)

    prev = None
    out = cfg
    # iterate to fixpoint (references to interpolated values)
    for _ in range(5):
        out = walk(out)
        if out == prev:
            break
        prev = out
    return out


def _load_file(path: Path, cfg_dir: Path) -> dict:
    raw = yaml.safe_load(path.read_text()) or {}
    defaults = raw.pop("defaults", None)
    merged: dict = {}
    if defaults:
        for entry in defaults:
            if entry == "_self_":
                deep_merge(merged, raw)
                raw = {}
                continue
            if isinstance(entry, dict):
                ((group, name),) = entry.items()
                sub = _load_file(cfg_dir / str(group).lstrip("/") / f"{name}.yaml", cfg_dir)
            else:
                sub = _load_file(path.parent / f"{entry}.yaml", cfg_dir)
            deep_merge(merged, sub)
    deep_merge(merged, raw)
    return merged


def compose(cfg_dir, selections=(), overrides=()) -> Cfg:
    """Compose base.yaml + group selections + dotted overrides -> resolved Cfg.

    selections: ["exp=motion_tracking", "robot=g1/g1_23dof_lock_wrist", ...]
    overrides:  ["num_envs=1024", "env.config.termination.x=false", ...]
    """
    cfg_dir = Path(cfg_dir)
    cfg: dict = {}
    base = cfg_dir / "base.yaml"
    if base.exists():
        deep_merge(cfg, _load_file(base, cfg_dir))
    for sel in selections:
        group, name = sel.split("=", 1)
        deep_merge(cfg, _load_file(cfg_dir / group / f"{name}.yaml", cfg_dir))
    for ov in overrides:
        key, val = ov.split("=", 1)
        set_dotted(cfg, key, _parse_scalar(val))
    cfg = resolve_interpolations(cfg)
    return Cfg.wrap(cfg)


def parse_cli(argv):
    """Split CLI args into (selections, overrides): group=name vs dotted.key=v."""
    sels, ovs = [], []
    for a in argv:
        a = a.lstrip("+")
        key = a.split("=", 1)[0]
        if "." in key or key in {"num_envs", "seed", "checkpoint", "experiment_name",
                                 "project_name", "headless", "base_dir", "multichip",
                                 "use_wandb", "save_motion", "log_task_name",
                                 "auto_load_latest", "total_iterations",
                                 "watchdog_timeout_s", "watchdog_boot_timeout_s",
                                 "artifact_dir"}:
            ovs.append(a)
        else:
            sels.append(a)
    return sels, ovs
