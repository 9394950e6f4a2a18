"""Eval-time callback framework.

Mirrors the reference's RL_EvalCallback hook interface (reference
humanoidverse/agents/callbacks/base_callback.py:4-20) and its concrete
analysis callbacks (analysis_plot_motion_tracking.py, *_openloop.py,
analysis_plot_force.py): per-step tensors are logged into the live
dashboard (pbhc_tpu.eval.dashboard, the Flask/Plotly equivalent), and the
open-loop variant replays the motion clip's stored actions instead of the
policy's.

The hooks receive/return an `actor_state` dict:
    {"step": int, "obs": obs-dict, "actions": [N,nd], "env_state": EnvState}
`on_pre_eval_env_step` may rewrite "actions" (open-loop replay, perturbation
studies); `on_post_eval_env_step` sees the post-step env state.
"""
from __future__ import annotations

import numpy as np


class RLEvalCallback:
    """reference base_callback.py:4-20."""

    def __init__(self, config, env):
        self.config = config
        self.env = env

    def on_pre_evaluate_policy(self):
        pass

    def on_pre_eval_env_step(self, actor_state):
        return actor_state

    def on_post_eval_env_step(self, actor_state):
        return actor_state

    def on_post_evaluate_policy(self):
        pass


class AnalysisPlotCallback(RLEvalCallback):
    """Stream per-step dof/torque/tracking tensors to the live dashboard
    (reference analysis_plot_motion_tracking.py:25-313)."""

    def __init__(self, config, env, dashboard, env_index: int = 0):
        super().__init__(config, env)
        self.dash = dashboard
        self.i = env_index

    def on_post_eval_env_step(self, actor_state):
        st = actor_state["env_state"]
        sim = st.sim
        i = self.i
        scalars = {"root_z": float(sim.root_pos[i, 2])}
        for j in range(min(6, self.env.nd)):
            scalars[f"dof_pos_{j}"] = float(sim.dof_pos[i, j])
            scalars[f"action_{j}"] = float(actor_state["actions"][i, j])
        if hasattr(st, "torques"):
            scalars["torque_norm"] = float(np.linalg.norm(np.asarray(st.torques[i])))
        self.dash.log_step(scalars)
        return actor_state


class ForcePlotCallback(RLEvalCallback):
    """Contact-force logging (reference analysis_plot_force.py)."""

    def __init__(self, config, env, dashboard, env_index: int = 0):
        super().__init__(config, env)
        self.dash = dashboard
        self.i = env_index

    def on_post_eval_env_step(self, actor_state):
        cf = np.asarray(actor_state["env_state"].sim.contact_forces[self.i])  # [B,3]
        self.dash.log_step({
            "contact_fz_total": float(cf[:, 2].sum()),
            "contact_f_max": float(np.abs(cf).max()),
        })
        return actor_state


class OpenLoopReplayCallback(RLEvalCallback):
    """Replace policy actions with the clip's recorded action sequence
    (reference analysis_plot_motion_tracking_openloop.py) — the open-loop
    fidelity check: a dynamics-accurate sim replays the training actions
    into roughly the training trajectory."""

    def __init__(self, config, env, motion_file=None):
        super().__init__(config, env)
        from pbhc_tpu.motion.motion_lib import load_motion_dict

        mf = motion_file or str(env.config.robot.motion.motion_file)
        raw = load_motion_dict(mf)
        clip = raw[next(iter(raw.keys()))]
        if "action" not in clip:
            raise ValueError(f"{mf} carries no recorded actions for open-loop replay")
        self.actions = np.asarray(clip["action"], dtype=np.float32)  # [T,nd]
        # recorded at clip fps; resample to control dt
        self.fps = float(clip["fps"])

    def on_pre_eval_env_step(self, actor_state):
        t = actor_state["step"] * self.env.dt
        frame = min(int(t * self.fps), len(self.actions) - 1)
        a = self.actions[frame]
        actor_state["actions"] = np.broadcast_to(
            a, (self.env.num_envs,) + a.shape).copy()
        return actor_state


def build_callbacks(names, config, env, dashboard=None):
    """Instantiate callbacks by name (CLI: eval callbacks=plot,force,openloop)."""
    out = []
    for n in names:
        n = n.strip()
        if not n:
            continue
        if n in ("plot", "analysis_plot"):
            out.append(AnalysisPlotCallback(config, env, dashboard))
        elif n == "force":
            out.append(ForcePlotCallback(config, env, dashboard))
        elif n in ("openloop", "open_loop"):
            out.append(OpenLoopReplayCallback(config, env))
        else:
            raise ValueError(f"unknown eval callback {n!r}")
    return out
