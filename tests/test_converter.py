"""SMPLConverter tests (smpl_mujoco.py:36 twin)."""
import numpy as np

import jax.numpy as jnp

from uhc_tpu.physics.model import Topology
from uhc_tpu.smpl.constants import MUJOCO_BODY_ORDER, MUJOCO_PARENTS
from uhc_tpu.smpl.converter import SMPLConverter


def _smpl_topo():
    return Topology(nbody=24, parents=tuple(MUJOCO_PARENTS),
                    body_names=tuple(MUJOCO_BODY_ORDER))


def _masterfoot_like_topo():
    """A mutated topology: two extra sub-bodies per foot, inserted after the
    toes (the masterfoot shape of smpl_robot.py:1336)."""
    names, parents = list(MUJOCO_BODY_ORDER), list(MUJOCO_PARENTS)
    for side in ("L", "R"):
        toe = names.index(f"{side}_Toe")
        for k in (1, 2):
            names.append(f"{side}_Toe_{k}")
            parents.append(toe)
    return Topology(nbody=len(names), parents=tuple(parents),
                    body_names=tuple(names))


def test_roundtrip_identity_topology():
    topo = _smpl_topo()
    conv = SMPLConverter(topo, topo)
    qpos = jnp.arange(topo.nq, dtype=jnp.float32)
    qvel = jnp.arange(topo.nv, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(conv.qpos_smpl_2_new(qpos)),
                                  np.asarray(qpos))
    np.testing.assert_array_equal(np.asarray(conv.qpos_new_2_smpl(qpos)),
                                  np.asarray(qpos))
    np.testing.assert_array_equal(np.asarray(conv.qvel_new_2_smpl(
        conv.qvel_smpl_2_new(qvel))), np.asarray(qvel))


def test_masterfoot_remap_and_tables():
    topo, new = _smpl_topo(), _masterfoot_like_topo()
    conv = SMPLConverter(topo, new)
    assert conv.get_new_qpos_lim() == topo.nq + 12
    assert conv.get_new_qvel_lim() == topo.nv + 12
    assert conv.get_new_body_lim() == 28

    qpos = jnp.arange(topo.nq, dtype=jnp.float32) + 1.0
    up = conv.qpos_smpl_2_new(qpos)
    assert up.shape == (new.nq,)
    # shared bodies keep their values; cloned sub-bodies are zero-filled
    np.testing.assert_array_equal(np.asarray(conv.qpos_new_2_smpl(up)),
                                  np.asarray(qpos))
    assert float(jnp.sum(jnp.abs(up[topo.nq:]))) == 0.0

    # batched remap
    q2 = jnp.stack([qpos, 2 * qpos])
    assert conv.qpos_smpl_2_new(q2).shape == (2, new.nq)

    # jpos subset comes back in smpl body order
    jp = jnp.arange(new.nbody * 3, dtype=jnp.float32).reshape(new.nbody, 3)
    back = conv.jpos_new_2_smpl(jp)
    assert back.shape == (24, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(jp[:24]))

    # gain tables: known entries + defaults for cloned bodies
    jkp = conv.get_new_jkp()
    assert jkp.shape == (3 * (new.nbody - 1),)
    names = list(new.body_names)
    l_hip = (names.index("L_Hip") - 1) * 3
    assert jkp[l_hip] == 500
    clone = (names.index("L_Toe_1") - 1) * 3
    assert jkp[clone] == 50.0          # default for unknown bodies
    dw = conv.get_new_diff_weight()
    assert dw[names.index("Head")] == 1.0
    assert dw[names.index("L_Toe_1")] == 0.0
