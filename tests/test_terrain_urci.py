"""Terrain generator + heightfield contact + URCI routing tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_terrain_generation():
    from pbhc_tpu.envs.terrain import Terrain, TerrainConfig

    t = Terrain(TerrainConfig(num_rows=3, num_cols=4, border_size=1.0))
    assert t.height_field.shape == (3 * 80 + 20, 4 * 80 + 20)
    assert np.isfinite(t.height_field).all()
    origins = t.sample_origins(16)
    assert origins.shape == (16, 3)
    # difficulty grows by row: later rows have larger height variance
    v0 = t.height_field[10:90].std()
    v2 = t.height_field[170:250].std()
    assert np.isfinite(v0) and np.isfinite(v2)


def test_engine_heightfield_contact():
    from pbhc_tpu.envs.terrain import Terrain, TerrainConfig
    from pbhc_tpu.model.g1 import load_g1_sim_model
    from pbhc_tpu.sim.engine import Engine

    t = Terrain(TerrainConfig(num_rows=2, num_cols=2, border_size=2.0))
    e = Engine(load_g1_sim_model())
    e.set_terrain(t.height_field * 0 + 0.5, t.cfg.horizontal_scale)  # flat raised 0.5
    h = np.asarray(e.ground_height(jnp.asarray([[3.0, 3.0]])))
    assert h[0] == pytest.approx(0.5)
    params = e.default_params()
    st = e.default_state(root_pos=(3.0, 3.0, 1.4))
    step = jax.jit(lambda s: e.substep(params, s, jnp.zeros(e.nd))[0])
    for _ in range(400):
        st = step(st)
    assert float(st.root_pos[2]) > 0.45  # rests ON the raised ground, not through it


def test_urci_routing_and_attacks(tmp_path):
    import dataclasses

    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.export import export_policy
    from pbhc_tpu.deploy.urci import AttackConfig, URCIRobot
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu"],
        ["num_envs=2",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    params = algo.actor.init(jax.random.PRNGKey(1), jnp.zeros((1, algo.actor_dim)))
    npz = export_policy(params, env, tmp_path / "p.npz",
                        meta_extra={"motion_file": str(cfg.robot.motion.motion_file)})

    robot = URCIRobot([npz, npz], attack=AttackConfig(imu="OU", action_delay_ms=10, dq_radial=True))
    traj = robot.routing(total_steps=30)
    assert len(traj["pid"]) == 30
    assert np.isfinite(traj["root_pos"]).all()
    # manual policy switch with EMA blend
    robot.switch_policy(1)
    assert robot.cur_pid == 1 and robot._blend == 0.0
    robot.control_step()
    assert np.isfinite(robot.d.qpos).all()


def test_terrain_config_group(tmp_path):
    """terrain=locomotion installs a heightfield into the engine."""
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=off", "simulator=tpu",
         "terrain=locomotion"],
        ["num_envs=2", "terrain.num_rows=2", "terrain.num_cols=2",
         "terrain.border_size=2.0",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    assert env.terrain is not None
    assert env.engine.terrain_hf is not None
    state = env.init_state(jax.random.PRNGKey(1))
    state, obs, rew, done, info = jax.jit(env.step)(state, jnp.zeros((2, env.nd)))
    assert bool(jnp.isfinite(rew).all())

    # plane group leaves the engine flat
    cfg2 = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=off", "simulator=tpu",
         "terrain=plane"],
        ["num_envs=2",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env2 = MotionTrackingEnv(cfg2, 2, jax.random.PRNGKey(0))
    assert env2.terrain is None and env2.engine.terrain_hf is None


def test_urci_deploy_groups(tmp_path):
    """deploy=external runs the routing loop on a stub policy."""
    from pbhc_tpu.agents.mh_ppo import MHPPO
    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.export import export_policy
    from pbhc_tpu.deploy import urci
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=off", "simulator=tpu"],
        ["num_envs=2",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env = MotionTrackingEnv(cfg, 2, jax.random.PRNGKey(0))
    algo = MHPPO(cfg, env)
    params = algo.actor.init(jax.random.PRNGKey(1), jnp.zeros((1, algo.actor_dim)))
    npz = export_policy(params, env, tmp_path / "p.npz",
                        meta_extra={"motion_file": str(cfg.robot.motion.motion_file)})
    urci.main([str(npz), "deploy=external", "steps=10"])
    urci.main([str(npz), "deploy=single", "steps=5"])


def test_terrain_curriculum_reset():
    """Per-env origins over the curriculum grid drive resets: spawns land on
    assigned tiles, ref fetches carry the origin shift, levels move up/down
    on episode performance (reference base_task.py:111-142)."""
    import dataclasses

    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=main", "simulator=tpu",
         "terrain=locomotion"],
        ["num_envs=4", "terrain.num_rows=3", "terrain.num_cols=2",
         "terrain.border_size=2.0", "terrain.curriculum=true",
         "terrain.max_init_terrain_level=1",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env = MotionTrackingEnv(cfg, 4, jax.random.PRNGKey(0))
    state = env.init_state(jax.random.PRNGKey(1))
    lvl = np.asarray(state.terrain_level)
    assert ((0 <= lvl) & (lvl <= 1)).all()

    # spawn xy must sit at the assigned tile origin (shift applied to reset)
    origins = np.asarray(env.terrain_origins)[lvl, np.asarray(env.terrain_types)]
    np.testing.assert_allclose(np.asarray(state.sim.root_pos[:, :2]),
                               origins[:, :2], atol=1e-4)
    # ...and the per-step ref fetch carries the same shift (dif ~ 0 at reset)
    mres, _ = env._motion_state_at(state, 1)
    np.testing.assert_allclose(np.asarray(mres["root_pos"][:, :2]),
                               np.asarray(state.sim.root_pos[:, :2]), atol=1e-4)

    # curriculum: near-complete episode -> level up; early failure -> down
    n = int(0.95 * float(state.motion_len[0]) / env.dt)
    state2 = dataclasses.replace(
        state,
        terrain_level=jnp.asarray([1, 1, 1, 1], jnp.int32),
        last_episode_length=jnp.asarray([n, n, 3, 3], jnp.int32))
    state2 = env._reset_envs(state2, jnp.ones(4, bool), jax.random.PRNGKey(2))
    lvl2 = np.asarray(state2.terrain_level)
    assert (lvl2[:2] == 2).all(), lvl2
    assert (lvl2[2:] == 0).all(), lvl2

    # a full jitted step on terrain stays finite
    step = jax.jit(env.step)
    st, obs, rew, done, info = step(state2, jnp.zeros((4, env.nd)))
    assert bool(jnp.isfinite(obs["actor_obs"]).all())


def test_mujoco_hfield_export(tmp_path):
    """Exported hfield scene heights match the engine's bilinear lookup."""
    import mujoco

    from pbhc_tpu.envs.terrain import Terrain, TerrainConfig, fill_mujoco_hfield
    from pbhc_tpu.model.g1 import g1_asset_root

    t = Terrain(TerrainConfig(num_rows=2, num_cols=2, border_size=2.0))
    out = t.export_mujoco(g1_asset_root() / "g1_23dof_lock_wrist.xml",
                          tmp_path / "scene.xml")
    m = fill_mujoco_hfield(mujoco.MjModel.from_xml_path(str(out)), out)
    hid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_HFIELD, "terrain")
    assert hid >= 0
    H, W = t.height_field.shape
    data = m.hfield_data.reshape(m.hfield_nrow[hid], m.hfield_ncol[hid])
    zmin = t.height_field.min()
    elev = m.hfield_size[hid][2]
    # mujoco data[row=y, col=x] must reproduce the engine's hf[x, y]
    xs, ys = [5, H // 2, H - 6], [7, W // 2, W - 3]
    for i in xs:
        for j in ys:
            got = data[j, i] * elev + zmin
            assert abs(got - t.height_field[i, j]) < 2e-3
    # compiled model simulates
    d = mujoco.MjData(m)
    mujoco.mj_step(m, d)


def test_hfield_sphere_soles(tmp_path):
    """Hfield scenes swap the ankle collision MESH for a BOX sole whose
    bottom face spans the engine's 4 sphere-bottom corners (mesh<->hfield is
    MuJoCo's weakest contact pair, and sphere<->hfield silently drops
    contacts for r<=17.5mm spheres — the box reproduces the plane-scene
    trajectory; see envs.terrain.swap_sphere_soles)."""
    import mujoco

    from pbhc_tpu.envs.terrain import Terrain, TerrainConfig, fill_mujoco_hfield
    from pbhc_tpu.model.g1 import G1_FOOT_SOLE_SPHERES, g1_asset_root

    t = Terrain(TerrainConfig(num_rows=2, num_cols=2, border_size=2.0))
    out = t.export_mujoco(g1_asset_root() / "g1_23dof_lock_wrist.xml",
                          tmp_path / "scene.xml")
    m = fill_mujoco_hfield(mujoco.MjModel.from_xml_path(str(out)), out)
    feet = [i for i in range(m.nbody)
            if mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, i).endswith(
                "ankle_roll_link")]
    assert len(feet) == 2
    sole_z = min(z - r for x, y, z, r in G1_FOOT_SOLE_SPHERES)
    for b in feet:
        geoms = [g for g in range(m.ngeom) if m.geom_bodyid[g] == b]
        boxes = [g for g in geoms if m.geom_type[g] == mujoco.mjtGeom.mjGEOM_BOX
                 and m.geom_contype[g] != 0]
        meshes = [g for g in geoms if m.geom_type[g] == mujoco.mjtGeom.mjGEOM_MESH]
        assert len(boxes) == 1
        assert all(m.geom_contype[g] == 0 for g in meshes), "mesh feet must not collide"
        g = boxes[0]
        # bottom face on the engine's sole plane, footprint covers the spheres
        assert abs((m.geom_pos[g][2] - m.geom_size[g][2]) - sole_z) < 1e-6
        for x, y, z, r in G1_FOOT_SOLE_SPHERES:
            assert abs(x - m.geom_pos[g][0]) <= m.geom_size[g][0] + 1e-9
            assert abs(y - m.geom_pos[g][1]) <= m.geom_size[g][1] + 1e-9


def test_mj_fleet_terrain_tile_centering():
    """MjFleet(terrain=, tile=) translates the hfield so the tile center sits
    at the world origin with ground height 0 (env/motion stay unshifted)."""
    import mujoco

    from pbhc_tpu.config.loader import compose
    from pbhc_tpu.deploy.mj_mirror import MjFleet
    from pbhc_tpu.envs.terrain import Terrain, TerrainConfig
    from pbhc_tpu.envs.tracking_env import MotionTrackingEnv

    cfg = compose(
        "/root/repo/pbhc_tpu/config",
        ["exp=motion_tracking", "robot=g1_23dof", "obs=motion_tracking",
         "rewards=motion_tracking", "domain_rand=off", "simulator=tpu"],
        ["num_envs=1",
         "robot.motion.motion_file=/root/repo/assets/motions/Horse-stance_pose.pkl"],
    )
    env = MotionTrackingEnv(cfg, 1, jax.random.PRNGKey(0))
    t = Terrain(TerrainConfig(num_rows=2, num_cols=2, border_size=2.0))
    tile = (1, 1)
    fleet = MjFleet(env, 1, terrain=t, tile=tile)
    d = fleet.d[0]
    # park the robot clear of the probe rays so they hit only the hfield
    d.qpos[0] += 100.0
    mujoco.mj_forward(fleet.m, d)
    tgid = mujoco.mj_name2id(fleet.m, mujoco.mjtObj.mjOBJ_GEOM, "terrain")
    geomid = np.zeros(1, dtype=np.int32)
    dist = mujoco.mj_ray(fleet.m, d, np.array([0.0, 0.0, 5.0]),
                         np.array([0.0, 0.0, -1.0]), None, 1, -1, geomid)
    assert dist >= 0 and geomid[0] == tgid
    # tile-center ground at z=0: the tile center is an exact grid sample
    # (export registers MuJoCo sample k at world x = k*horizontal_scale)
    assert abs((5.0 - dist) - 0.0) < 5e-3
    # a point one tile over must read the NEIGHBOR tile's height, offset by
    # the chosen tile's center height
    cx, cy, cz = t.env_origins[tile[0], tile[1]]
    ox, oy, oz = t.env_origins[0, 1]
    dist2 = mujoco.mj_ray(fleet.m, d,
                          np.array([float(ox - cx), 0.0, 5.0]),
                          np.array([0.0, 0.0, -1.0]), None, 1, -1, geomid)
    assert dist2 >= 0 and geomid[0] == tgid
    assert abs((5.0 - dist2) - float(oz - cz)) < 5e-3
