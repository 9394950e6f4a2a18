"""Policy export for CPU deployment.

The reference exports ONNX (reference humanoidverse/utils/inference_helpers.py);
onnx isn't available in this image, so the portable format is an .npz of the
MLP weights plus deployment metadata, executed by `NumpyPolicy` — a
dependency-free numpy forward pass usable from the MuJoCo sim2sim runtime and
the real-robot controller. ONNX export is attempted when the package exists.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def export_policy(actor_params, env, path, meta_extra=None, actor=None):
    """Flatten flax MLP params -> npz with deploy metadata.

    When `actor` (the flax actor module) is given, an ONNX twin is written
    next to the npz (reference inference_helpers.py:13-44)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    params = actor_params["params"]

    arrays = {}
    n_layers = 0
    # GaussianActor -> MLP_0 Dense_i; std parameter alongside
    mlp = params["MLP_0"]
    while f"Dense_{n_layers}" in mlp:
        d = mlp[f"Dense_{n_layers}"]
        arrays[f"w{n_layers}"] = np.asarray(d["kernel"])
        arrays[f"b{n_layers}"] = np.asarray(d["bias"])
        n_layers += 1
    arrays["std"] = np.asarray(params.get("std", np.zeros(1)))

    meta = {
        "n_layers": n_layers,
        "activation": "ELU",
        "num_actions": int(arrays[f"b{n_layers-1}"].shape[0]),
        "obs_dim": int(arrays["w0"].shape[0]),
        "action_scale": np.asarray(env.action_scales).tolist(),
        "default_dof_pos": np.asarray(env.raw_default_dof_pos).tolist(),
        "kp": np.asarray(env.p_gains).tolist(),
        "kd": np.asarray(env.d_gains).tolist(),
        "torque_limits": np.asarray(env.torque_limits).tolist(),
        "dof_names": list(env.sim_model.dof_names),
        "obs_groups": {k: list(v) for k, v in env.config.obs.obs_dict.items()},
        "obs_dims": dict(env.obs_dims),
        "obs_scales": {k: float(v) for k, v in env.config.obs.obs_scales.items()},
        "history_spec": {g: dict(s) for g, s in env.history_spec.items()},
        "action_clip": float(env.action_clip),
        "clip_obs": float(env.clip_obs),
        "dt": float(env.dt),
        "robot_type": str(env.config.robot.robot_type),
    }
    if meta_extra:
        meta.update(meta_extra)
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)

    # ONNX twin next to the npz (reference inference_helpers.py:13-44 exports
    # ONNX as the deploy artifact; see pbhc_tpu/deploy/onnx_export.py)
    if actor is not None:
        try:
            from pbhc_tpu.deploy.onnx_export import export_actor_onnx

            export_actor_onnx(actor, actor_params, meta["obs_dim"],
                              Path(path).with_suffix(".onnx"))
        except Exception as e:  # pragma: no cover - non-MLP backbones (MoE)
            print(f"[export] ONNX export skipped: {e}")
    return path


def student_meta(env, meta_extra=None):
    """Deploy metadata for a general-tracking (student) env — everything
    StudentObsBuilder and the runtimes need to rebuild the training obs."""
    meta = {
        "num_actions": int(env.nd),
        "obs_dim": int(env.obs_dim("actor_obs")),
        "action_scale": np.asarray(env.action_scales).tolist(),
        "default_dof_pos": np.asarray(env.raw_default_dof_pos).tolist(),
        "kp": np.asarray(env.p_gains).tolist(),
        "kd": np.asarray(env.d_gains).tolist(),
        "torque_limits": np.asarray(env.torque_limits).tolist(),
        "dof_names": list(env.sim_model.dof_names),
        "obs_groups": {k: list(v) for k, v in env.config.obs.obs_dict.items()},
        "obs_dims": dict(env.obs_dims),
        "obs_scales": {k: float(v) for k, v in env.config.obs.obs_scales.items()},
        "history_spec": {g: dict(s) for g, s in env.history_spec.items()},
        "history_length": int(env.config.obs.history_length),
        "future_num_steps": int(env.future_num_steps),
        "future_max_steps": int(env.future_max_steps),
        "key_body_ids": np.asarray(env.key_body_id).tolist(),
        "anchor_index": int(env.anchor_index),
        "action_clip": float(env.action_clip),
        "clip_obs": float(env.clip_obs),
        "dt": float(env.dt),
        "robot_type": str(env.config.robot.robot_type),
    }
    if meta_extra:
        meta.update(meta_extra)
    return meta


def export_student(net, params, env, path, meta_extra=None):
    """Export the deployable student: the 3-input ONNX graph (actor_obs /
    future_motion_targets / prop_history, reference inference_helpers.py:
    95-138) plus a sidecar .meta.json consumed by StudentObsBuilder and the
    deploy runtimes."""
    from pbhc_tpu.deploy.onnx_export import export_mimic_onnx

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    export_mimic_onnx(net, params, path, obs_dim=env.obs_dim("actor_obs"))
    meta = student_meta(env, meta_extra)
    Path(str(path) + ".meta.json").write_text(json.dumps(meta, indent=1))
    return path


class StudentPolicy:
    """Runs an exported student ONNX with its sidecar metadata; input is the
    3-array feed dict from StudentObsBuilder.

    `native=True` executes the graph on the in-repo C++ core
    (deploy/native/onnx_exec.cpp) instead of the numpy executor — the
    real-robot controller's deterministic-latency path (reference runs
    onnxruntime's C++ core, reference deploy_real.py:31)."""

    def __init__(self, path, native=False):
        from pbhc_tpu.deploy.onnx_numpy import OnnxPolicy

        self.meta = json.loads(Path(str(path) + ".meta.json").read_text())
        if native:
            from pbhc_tpu.deploy.native.onnx_exec import NativeOnnxPolicy

            self._onnx = NativeOnnxPolicy(path, meta=self.meta)
        else:
            self._onnx = OnnxPolicy(path, meta=self.meta)

    def __call__(self, feeds: dict):
        return np.asarray(self._onnx.run(feeds)[0]).reshape(-1)


class NumpyPolicy:
    """Dependency-free deterministic policy forward pass (deploy inference)."""

    def __init__(self, path):
        data = np.load(path)
        self.meta = json.loads(bytes(data["meta_json"]).decode())
        n = self.meta["n_layers"]
        self.layers = [(data[f"w{i}"], data[f"b{i}"]) for i in range(n)]

    @staticmethod
    def _elu(x):
        return np.where(x > 0, x, np.expm1(np.minimum(x, 0.0)))

    def __call__(self, obs):
        x = np.asarray(obs, dtype=np.float32)
        for i, (w, b) in enumerate(self.layers):
            x = x @ w + b
            if i < len(self.layers) - 1:
                x = self._elu(x)
        return x


def main(argv=None):
    """CLI:
    `python -m pbhc_tpu.deploy.export info policy.npz` — inspect an export
    (reference check_model_dims.py);
    `python -m pbhc_tpu.deploy.export student <ckpt.pkl> [out.onnx]` —
    export a PPOMimic checkpoint as the deployable 3-input student ONNX."""
    import json
    import sys

    argv = argv or sys.argv[1:]
    if argv and argv[0] == "student":
        import pickle

        from pbhc_tpu.eval.batch_eval import _load

        ckpt = Path(argv[1])
        out = Path(argv[2]) if len(argv) > 2 else \
            ckpt.parent.parent / "exported" / f"{ckpt.stem}_student.onnx"
        env, algo, payload = _load(ckpt, 1)
        params = payload.get("actor_params") or payload.get("params")
        mf = str(env.config.robot.motion.motion_file)
        export_student(algo.net, params, env, out, meta_extra={"motion_file": mf})
        print(f"[export] student ONNX -> {out}")
        return
    assert argv and argv[0] == "info", "usage: export info <policy.npz>"
    pol = NumpyPolicy(argv[1])
    meta = dict(pol.meta)
    meta["layers"] = [f"{w.shape[0]}x{w.shape[1]}" for w, _ in pol.layers]
    for k in ("kp", "kd", "torque_limits", "action_scale", "default_dof_pos"):
        meta[k] = f"[{len(meta[k])} values]"
    print(json.dumps(meta, indent=1, default=str))


if __name__ == "__main__":
    main()
