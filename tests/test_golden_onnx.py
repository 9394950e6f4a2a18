"""Golden-artifact validation: the reference's shipped PRETRAINED ONNX
policies run unchanged in our deploy stack (SURVEY §4: the reference's own
validation idiom is the MuJoCo sim2sim replay of its pretrained checkpoints).

The ONNX graphs are executed by pbhc_tpu.deploy.onnx_numpy (no onnxruntime in
the image); deploy metadata comes from the ckpt-adjacent config.yaml. A policy
that keeps the robot upright through its whole motion proves the obs layout,
PD conventions, and motion-phase handling all match the reference.
"""
import os

import numpy as np
import pytest

POSE = "/root/reference/example/pretrained_horse_stance_pose"
PUNCH = "/root/reference/example/pretrained_horse_stance_punch"
MOTIONS = "/root/reference/example/motion_data"

# golden artifacts only exist in the reference checkout; the framework itself
# runs from vendored assets/ (these tests are optional reference-parity checks)
pytestmark = pytest.mark.skipif(
    not os.path.isdir(POSE), reason="reference golden artifacts not available")


def test_onnx_decoder_matches_graph():
    from pbhc_tpu.deploy.onnx_numpy import OnnxPolicy, meta_from_reference_config

    meta = meta_from_reference_config(f"{POSE}/config.yaml")
    pol = OnnxPolicy(f"{POSE}/exported/model_50000.onnx", meta)
    assert pol.inputs == ["actor_obs"]
    assert {n["op"] for n in pol.nodes} <= {"Gemm", "Elu", "Relu", "Identity"}
    a = pol(np.zeros(380, dtype=np.float32))
    assert a.shape == (23,) and np.isfinite(a).all()
    # batched call
    ab = pol(np.zeros((5, 380), dtype=np.float32))
    assert ab.shape == (5, 23)
    np.testing.assert_allclose(ab[0], a, atol=1e-6)


@pytest.mark.parametrize("ckpt_dir,onnx,motion,steps", [
    (POSE, "model_50000.onnx", "Horse-stance_pose.pkl", 348),
    (PUNCH, "model_33000.onnx", "Horse-stance_punch.pkl", 332),
])
def test_pretrained_policy_sim2sim(ckpt_dir, onnx, motion, steps):
    from pbhc_tpu.deploy.urci import URCIRobot

    robot = URCIRobot([f"{ckpt_dir}/exported/{onnx}"],
                      motion_file=f"{MOTIONS}/{motion}")
    traj = robot.routing(total_steps=steps, loop=False)
    z = traj["root_pos"][:, 2]
    assert len(z) == steps
    # horse stance: deep squat without falling, upright at motion end
    assert z.min() > 0.4, f"fell during motion (min z={z.min():.3f})"
    assert z[-1] > 0.7, f"not standing at motion end (z={z[-1]:.3f})"
