"""uhc_tpu — a TPU-native Universal Humanoid Controller framework.

A ground-up re-design of the capabilities of ZhengyiLuo/UHC (physics-based
humanoid motion imitation with RL) for TPU hardware:

* the physics engine (MuJoCo in the reference) is a batched, jit-compiled
  JAX rigid-body engine (`uhc_tpu.physics`) — dense Jacobian-space dynamics
  that map onto the MXU, `vmap` over thousands of humanoids;
* rollouts, GAE and PPO run as one SPMD program (`uhc_tpu.learn`),
  sharded over a `jax.sharding.Mesh` instead of multiprocessing queues;
* the SMPL body-model layer (`uhc_tpu.smpl`) builds static model arrays
  host-side once, instead of round-tripping MJCF XML per episode.

Layer map mirrors /root/reference SURVEY.md §1 (L0..L9).
"""

__version__ = "0.1.0"
