"""BaseSimulator facade: TPU + MuJoCo backends behind the same contract,
including a short lock-step cross-engine comparison (genesis_mjdebug idiom)."""
import numpy as np
import pytest

from pbhc_tpu.model.g1 import g1_asset_root, load_g1_sim_model
from pbhc_tpu.sim.engine import Engine
from pbhc_tpu.sim.simulator import MujocoSimulator, TpuSimulator


@pytest.fixture(scope="module")
def sims():
    import dataclasses

    import jax
    import jax.numpy as jnp

    eng = Engine(load_g1_sim_model())
    # strip passive joint forces on BOTH sides for the lock-step comparison
    base = dataclasses.replace(eng.default_params(),
                               dof_damping=jnp.zeros(eng.nd),
                               dof_frictionloss=jnp.zeros(eng.nd))
    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), base)
    tpu = TpuSimulator(eng, num_envs=2, params=params)
    mj = MujocoSimulator(g1_asset_root() / "g1_23dof_lock_wrist.xml")
    return tpu, mj


def test_contract_shapes(sims):
    tpu, mj = sims
    assert tpu.robot_root_states.shape == (2, 13)
    assert mj.robot_root_states.shape == (1, 13)
    assert tpu._rigid_body_pos.shape == (2, 24, 3)
    assert mj._rigid_body_pos.shape == (1, 24, 3)
    assert tpu._body_list == mj._body_list
    assert tpu.find_rigid_body_indice("torso_link") == mj._body_list.index("torso_link")


def test_state_setters_roundtrip(sims):
    tpu, mj = sims
    rs = np.zeros((2, 13), dtype=np.float32)
    rs[:, 2] = 1.5
    rs[:, 6] = 1.0  # unit quat xyzw
    rs[:, 7] = 0.3
    tpu.set_actor_root_state_tensor([0, 1], rs)
    tpu.refresh_sim_tensors()
    np.testing.assert_allclose(np.asarray(tpu.robot_root_states[:, 2]), 1.5, atol=1e-6)
    mj.set_actor_root_state_tensor([0], rs[:1])
    mj.refresh_sim_tensors()
    np.testing.assert_allclose(mj.robot_root_states[0, :3], rs[0, :3], atol=1e-6)
    np.testing.assert_allclose(mj.robot_root_states[0, 7:13], rs[0, 7:13], atol=1e-6)


def test_lockstep_freefall_parity(sims):
    """Identical init, zero torque, no contact: both backends agree."""
    tpu, mj = sims
    rs = np.zeros((2, 13), dtype=np.float32)
    rs[:, 2] = 5.0
    rs[:, 6] = 1.0
    dof = np.full((2, 23), 0.1, dtype=np.float32)
    tpu.set_actor_root_state_tensor([0, 1], rs)
    tpu.set_dof_state_tensor([0, 1], dof, np.zeros_like(dof))
    mj.set_actor_root_state_tensor([0], rs[:1])
    mj.set_dof_state_tensor([0], dof[:1], np.zeros((1, 23)))
    import mujoco

    mj.m.dof_damping[:] = 0
    mj.m.dof_frictionloss[:] = 0
    mj.m.dof_armature[:6] = 0
    mj.m.jnt_limited[:] = 0
    # the TPU engine has no self-collision; at this pose mujoco finds one
    # self-contact — disable contacts for the pure free-flight comparison
    mj.m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    tau = np.zeros((2, 23), dtype=np.float32)
    for _ in range(10):
        tpu.apply_torques_at_dof(tau)
        tpu.simulate_at_each_physics_step()
        mj.apply_torques_at_dof(tau[0])
        mj.simulate_at_each_physics_step()
    tpu.refresh_sim_tensors()
    mj.refresh_sim_tensors()
    np.testing.assert_allclose(np.asarray(tpu.robot_root_states[0, :3]),
                               mj.robot_root_states[0, :3], atol=2e-3)
    np.testing.assert_allclose(np.asarray(tpu.dof_pos[0]), mj.dof_pos[0], atol=2e-2)
