# PCG staleness study (CPU, engine-level): deviation of PCG-k with a
# substep-0 preconditioner vs exact solves over one control step, on
# dynamic walking states. Variants: k=1,2,3; k=1 with a mid-window
# preconditioner refresh at substep 8 (fresh exact inverse).
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, joblib
import jax.numpy as jnp
from uhc_tpu.config.config import EnvConfig
from uhc_tpu.physics import solver as S
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid
from uhc_tpu.smpl.convert import smpl_to_qpose

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
topo, model = load_mjcf_humanoid(XML)
model = model_to_dtype(model, jnp.float32)
cfg = EnvConfig(self_collision=True, meta_pd=True, residual_force=True)

clips = joblib.load("/root/repo/sample_data/gait_clips_ext.pkl")
qs = np.asarray(jax.device_get(smpl_to_qpose(
    clips["0-SYN_jog"]["pose_aa"], np.asarray(model.body_pos)[0],
    clips["0-SYN_jog"]["trans"])))
# dynamic states: consecutive frames mid-gait + fd velocities
idx = np.arange(40, 56)
qp = jnp.asarray(qs[idx], jnp.float32)
qv = jnp.asarray((qs[idx + 1] - qs[idx]) * 30.0, jnp.float32)[:, 1:]
# crude qvel: drop quat-dim mismatch by rebuilding: lin + zeros ang + joint fd
qv = jnp.concatenate([qv[:, :3] * 0, jnp.zeros((16, 3)),
                      (qs[idx + 1, 7:] - qs[idx, 7:]) * 30.0], axis=1
                     ).astype(jnp.float32)
B = qp.shape[0]
import uhc_tpu.envs.humanoid_im as H
nd, vf, meta = H.action_dims(topo, cfg)
rng = np.random.RandomState(0)
act = jnp.asarray(rng.randn(B, nd + vf + meta) * 0.05, jnp.float32)
tb = jnp.asarray(qs[idx + 1, 7:], jnp.float32)

results = {}
for name, iters in (("pcg1", 1), ("pcg2", 2), ("pcg3", 3), ("exact", 64)):
    sim = S.make_do_simulation(topo, cfg, pcg_iters=iters)
    qpo, qvo = sim(model, qp, qv, act, tb, 1.0)
    results[name] = (np.asarray(qpo), np.asarray(qvo))

ref = results["exact"]
for name in ("pcg1", "pcg2", "pcg3"):
    r = results[name]
    print(name, "qpos dev %.2e" % np.abs(r[0] - ref[0]).max(),
          "qvel dev %.2e" % np.abs(r[1] - ref[1]).max())
