"""Fused-kernel head/tail split + in-kernel self-collision parity
(interpret mode; the real-TPU numbers live in PERF.md via
tools/kernel_bench.py).

Slow tier: interpret-mode execution of the full control-step kernel is
minutes of host time.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import EnvConfig
from uhc_tpu.data.dataset import build_expert_library, load_motion_file
from uhc_tpu.envs import humanoid_im as H
from uhc_tpu.physics import solver as S
from uhc_tpu.physics.model import model_to_dtype
from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

XML = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
NEUTRAL = "/root/reference/sample_data/standing_neutral.pkl"


@pytest.mark.slow
def test_split_and_sc_parity_interpret():
    from uhc_tpu.physics.pallas_substep import make_fused_do_simulation

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)
    B = 16
    rng = jax.random.PRNGKey(0)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=3)
    q_ref, _ = sim(model, qp, qv, act, tb, 1.0)

    fused = make_fused_do_simulation(topo, cfg, model, interpret=True)
    spl = make_fused_do_simulation(topo, cfg, model, interpret=True,
                                   split=True, tail_tile=16)
    q1, _ = fused(qp, qv, act, tb, 1.0)
    q2, _ = spl(qp, qv, act, tb, 1.0)

    # one-program vs split must be bit-identical (same arithmetic order)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    # fused vs the XLA solver path: same physics incl. self-collision
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 1e-5


@pytest.mark.slow
def test_lane_kernel_parity_interpret():
    """Lane-major (v3) fused kernel vs the XLA solver path, interpret mode
    (physics/pallas_lane.py; envs in lanes, sub-tiled env-major solves)."""
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)
    B = 16
    rng = jax.random.PRNGKey(0)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=3)
    q_ref, v_ref = sim(model, qp, qv, act, tb, 1.0)

    lane = make_fused_do_simulation_lane(topo, cfg, model, env_tile=16,
                                         sub_tile=8, pcg_iters=3,
                                         interpret=True)
    q1, v1 = lane(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(v1 - v_ref))) < 1e-3

    # VPU-PCG variant (solves deferred out of the env-subtile loop and run
    # env-major over the full lane tile): same physics, only float
    # reassociation in the matvec reductions differs
    lane_v = make_fused_do_simulation_lane(topo, cfg, model, env_tile=16,
                                           sub_tile=8, pcg_iters=3,
                                           interpret=True, pcg_vpu=True)
    q2, v2 = lane_v(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q2 - q_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(v2 - v_ref))) < 1e-3


@pytest.mark.slow
def test_lane_kernel_big_tree_interpret():
    """Lane kernel on a >32-body tree (masterfoot, NP=160): pcg_vpu off,
    env-major per-sub-tile solves, A-staging scratch skipped. Parity vs
    the XLA solver path (the round-3 routing sends masterfoot/SMPL-H
    through this configuration)."""
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane
    from uhc_tpu.smpl.masterfoot import masterfoot_model

    topo24, model24 = load_mjcf_humanoid(XML)
    topo, model, _ = masterfoot_model(topo24, model24)
    model = model_to_dtype(model, jnp.float32)
    assert topo.nbody == 48

    seqs = load_motion_file(NEUTRAL)
    lib24, _ = build_expert_library(topo24, model24, seqs, max_len=4)
    # masterfoot qpos = 24-body qpos + zeros for the sole sub-bodies
    B = 8
    rng = jax.random.PRNGKey(1)
    pad = jnp.zeros((topo.nq - topo24.nq,))
    qp = jnp.tile(jnp.concatenate([lib24["qpos"][0, 0], pad])[None], (B, 1))
    qv = 0.03 * jax.random.normal(rng, (B, topo.nv))
    tb = qp[:, 7:]

    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=3)
    q_ref, v_ref = sim(model, qp, qv, act, tb, 1.0)

    lane = make_fused_do_simulation_lane(topo, cfg, model, env_tile=8,
                                         sub_tile=8, pcg_iters=3,
                                         interpret=True, pcg_vpu=False)
    q1, v1 = lane(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(v1 - v_ref))) < 1e-3

    # sub-tile VPU-PCG (the big-tree production routing): same physics,
    # only reduction order in the matvecs differs
    lane_s = make_fused_do_simulation_lane(topo, cfg, model, env_tile=8,
                                           sub_tile=8, pcg_iters=3,
                                           interpret=True, pcg_vpu=False,
                                           pcg_vpu_sub=True)
    q2, v2 = lane_s(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q2 - q_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(v2 - v_ref))) < 1e-3


@pytest.mark.slow
def test_lane_kernel_smplh_tree_interpret():
    """Lane kernel at the 52-body routing edge (SMPL-H, NP=160): same
    big-tree configuration as masterfoot (pcg_vpu off, env-major
    sub-tile solves). Parity vs the XLA solver."""
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane
    from uhc_tpu.smpl import smplh as SH

    topo24, model24 = load_mjcf_humanoid(XML)
    topo = SH.smplh_topology()
    model = model_to_dtype(SH.smplh_model(topo24, model24), jnp.float32)
    assert topo.nbody == 52

    B = 8
    rng = jax.random.PRNGKey(3)
    qp = jnp.zeros((B, topo.nq))
    qp = qp.at[:, 2].set(0.92).at[:, 3].set(1.0)
    qv = 0.03 * jax.random.normal(rng, (B, topo.nv))
    tb = qp[:, 7:]

    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=3)
    q_ref, v_ref = sim(model, qp, qv, act, tb, 1.0)

    lane = make_fused_do_simulation_lane(topo, cfg, model, env_tile=8,
                                         sub_tile=8, pcg_iters=3,
                                         interpret=True, pcg_vpu=False)
    q1, v1 = lane(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(v1 - v_ref))) < 1e-3


@pytest.mark.slow
def test_lane_kernel_schedule_variants_interpret():
    """New solve schedules (VERDICT r3 item 3 / PERF.md next-ceiling):
    asymmetric PCG-(pd,fd) iteration counts and the mid-window
    preconditioner refresh. Both must track the XLA reference within the
    same bound as the production schedule (accuracy study:
    tools/solver_variants.py)."""
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)
    B = 16
    rng = jax.random.PRNGKey(0)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=8)
    q_ref, v_ref = sim(model, qp, qv, act, tb, 1.0)

    # asymmetric (pd=1, fd=2), VPU-PCG path (the production layout)
    lane_a = make_fused_do_simulation_lane(topo, cfg, model, env_tile=16,
                                           sub_tile=8, pcg_iters=(1, 2),
                                           interpret=True, pcg_vpu=True)
    q1, v1 = lane_a(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 2e-3
    assert float(jnp.max(jnp.abs(v1 - v_ref))) < 2e-1

    # PCG-(1,1) + mid-window refresh at substep 8
    lane_r = make_fused_do_simulation_lane(topo, cfg, model, env_tile=16,
                                           sub_tile=8, pcg_iters=(1, 1),
                                           interpret=True, pcg_vpu=True,
                                           refresh_at=8)
    q2, v2 = lane_r(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q2 - q_ref))) < 2e-3
    assert float(jnp.max(jnp.abs(v2 - v_ref))) < 2e-1


@pytest.mark.slow
def test_lane_kernel_per_env_model_interpret():
    """Per-env (shape-library) models through the lane kernel vs the XLA
    solver on the SAME gathered models (pallas_lane per_env path; the
    shape-conditioned family, VERDICT r3 weak #6). Two shapes, envs
    alternating between them by seq_idx."""
    import dataclasses

    from uhc_tpu.physics.model import model_gather
    from uhc_tpu.physics.pallas_lane import (PE_MODEL_LEAVES,
                                             make_fused_do_simulation_lane)

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)

    # a second, uniformly-scaled shape (the model_from_betas s/s^3/s^5 law,
    # smpl/robot.py:60-69) + a slightly tighter knee range to exercise the
    # per-env jnt_range path
    s = 0.93
    jr2 = np.array(np.asarray(model.jnt_range), np.float32)
    jr2[:, 0] *= 0.9
    jr2[:, 1] *= 0.9
    m2 = dataclasses.replace(
        model,
        body_pos=model.body_pos * s, body_ipos=model.body_ipos * s,
        body_mass=model.body_mass * s**3,
        body_inertia=model.body_inertia * s**5,
        contact_point=model.contact_point * s,
        sc_point=model.sc_point * s, sc_radius=model.sc_radius * s,
        jnt_range=jnp.asarray(jr2))
    model_lib = dataclasses.replace(model, **{
        f: jnp.stack([getattr(model, f), getattr(m2, f)])
        for f in PE_MODEL_LEAVES})

    B = 16
    rng = jax.random.PRNGKey(0)
    seq_idx = jnp.asarray(np.arange(B) % 2, jnp.int32)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=3)
    m_envs = model_gather(model_lib, seq_idx)
    q_ref, v_ref = sim(m_envs, qp, qv, act, tb, 1.0)

    lane = make_fused_do_simulation_lane(topo, cfg, model_lib, env_tile=16,
                                         sub_tile=8, pcg_iters=3,
                                         interpret=True, pcg_vpu=True)
    q1, v1 = lane(qp, qv, act, tb, 1.0, seq_idx)
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(v1 - v_ref))) < 1e-3
    # the two shapes must actually integrate differently
    assert float(jnp.max(jnp.abs(q1[0] - q1[1]))) > 1e-6


@pytest.mark.slow
def test_lane_kernel_per_env_contact_scalars_interpret():
    """Per-env contact scalars (friction / penalty stiffness / damping —
    the domain-randomization axis, data.dataset.build_dr_library) through
    the lane kernel vs the XLA solver on the SAME gathered models. Envs
    alternate between nominal and a slippery/soft variant by seq_idx; the
    start pose is sunk 2 cm so ground contacts are live."""
    import dataclasses

    from uhc_tpu.physics.model import model_gather
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)

    model_lib = dataclasses.replace(
        model,
        friction=jnp.asarray([float(model.friction), 0.45]),
        contact_stiffness=jnp.asarray(
            [float(model.contact_stiffness),
             0.55 * float(model.contact_stiffness)]),
        contact_damping=jnp.asarray(
            [float(model.contact_damping),
             1.7 * float(model.contact_damping)]))

    B = 16
    rng = jax.random.PRNGKey(0)
    seq_idx = jnp.asarray(np.arange(B) % 2, jnp.int32)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qp = qp.at[:, 2].add(-0.02)          # active ground contacts
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=3)
    m_envs = model_gather(model_lib, seq_idx)
    q_ref, v_ref = sim(m_envs, qp, qv, act, tb, 1.0)

    lane = make_fused_do_simulation_lane(topo, cfg, model_lib, env_tile=16,
                                         sub_tile=8, pcg_iters=3,
                                         interpret=True, pcg_vpu=True)
    q1, v1 = lane(qp, qv, act, tb, 1.0, seq_idx)
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(v1 - v_ref))) < 1e-3
    # the two contact variants must actually integrate differently
    assert float(jnp.max(jnp.abs(q1[0] - q1[1]))) > 1e-6


def test_build_dr_library_shapes():
    """build_dr_library: variant-0 nominal, tiled expert features, batched
    contact/mass leaves, and lane-kernel-admissible leaf set."""
    from uhc_tpu.data.dataset import build_dr_library
    from uhc_tpu.physics.model import model_batch_axes
    from uhc_tpu.physics.pallas_lane import PE_MODEL_LEAVES

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, keys, model_lib = build_dr_library(topo, model, seqs,
                                            n_variants=4, max_len=6, seed=3)
    S = len(keys) // 4
    assert len(keys) == 4 * S and keys[S].endswith("@dr1")
    assert lib["qpos"].shape[0] == 4 * S
    np.testing.assert_array_equal(np.asarray(lib["qpos"][0]),
                                  np.asarray(lib["qpos"][S]))
    fr = np.asarray(model_lib.friction)
    assert fr.shape == (4 * S,)
    assert fr[0] == float(model.friction)          # variant 0 nominal
    assert len(set(np.round(fr, 6))) > 1           # variants differ
    assert np.all(fr >= float(model.friction) / 1.5 - 1e-6)
    assert np.all(fr <= float(model.friction) * 1.5 + 1e-6)
    ms = np.asarray(model_lib.body_mass)
    assert ms.shape == (4 * S, topo.nbody)
    np.testing.assert_allclose(ms[0], np.asarray(model.body_mass),
                               rtol=1e-6)
    # every batched leaf must be admissible on the lane per-env path
    import dataclasses as _dc
    axes = model_batch_axes(model_lib)
    batched = {f.name for f in _dc.fields(type(model_lib))
               if getattr(axes, f.name) == 0}
    assert batched <= set(PE_MODEL_LEAVES)


def test_production_routing_uses_asymmetric_pcg(monkeypatch):
    """make_env_step_batched's small-tree lane branch must request the
    asymmetric PD/FD PCG schedule (pd=1, fd=fused_pcg_iters) — the
    measured-best production config (482.3k vs 446.8k substeps/s,
    results/train_queue_r4e.log); big trees keep the symmetric count."""
    from uhc_tpu.physics import pallas_lane

    captured = {}

    def fake_factory(topo, cfg, model, **kw):
        captured.update(kw)
        return lambda *a, **k: (_ for _ in ()).throw(AssertionError)

    monkeypatch.setattr(pallas_lane, "make_fused_do_simulation_lane",
                        fake_factory)
    monkeypatch.setenv("UHC_TPU_LANE", "1")
    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    cfg = EnvConfig(self_collision=True)
    H.make_env_step_batched(topo, cfg, fused_model=model, fused_pcg_iters=2)
    assert captured["pcg_iters"] == (1, 2)
    assert captured["pcg_vpu"] is True


@pytest.mark.slow
def test_lane_kernel_cond_inv_interpret():
    """cond_inv=True (the pl.when-guarded exact-inverse pair — one compiled
    Cholesky regardless of refresh substeps, the fix for the REFRESH
    variant's remote-compile stall, PERF.md round-4e) must match the static
    schedule bit-for-bit without refresh, and track the XLA reference with
    refresh enabled."""
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)
    B = 16
    rng = jax.random.PRNGKey(0)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))

    # same schedule, static vs cond_inv: identical math -> tight bound
    mk = lambda **kw: make_fused_do_simulation_lane(
        topo, cfg, model, env_tile=16, sub_tile=8, pcg_iters=(1, 2),
        interpret=True, pcg_vpu=True, **kw)
    q_s, v_s = mk(cond_inv=False)(qp, qv, act, tb, 1.0)
    q_c, v_c = mk(cond_inv=True)(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q_c - q_s))) < 1e-6
    assert float(jnp.max(jnp.abs(v_c - v_s))) < 1e-4

    # cond_inv + refresh vs the exact XLA reference
    sim = S.make_do_simulation(topo, cfg, pcg_iters=8)
    q_ref, v_ref = sim(model, qp, qv, act, tb, 1.0)
    lane_r = make_fused_do_simulation_lane(topo, cfg, model, env_tile=16,
                                           sub_tile=8, pcg_iters=(1, 1),
                                           interpret=True, pcg_vpu=True,
                                           refresh_at=8, cond_inv=True)
    q_r, v_r = lane_r(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q_r - q_ref))) < 2e-3
    assert float(jnp.max(jnp.abs(v_r - v_ref))) < 2e-1


@pytest.mark.slow
def test_lane_kernel_meta_pd_joint_interpret():
    """meta_pd_joint (per-joint gain scaling, humanoid_im.py:1053-1064
    joint variant) through the lane kernel vs the XLA solver — the per-dof
    scales ride the kps/kds operand slots as (NP, EL) tiles."""
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)
    B = 16
    rng = jax.random.PRNGKey(0)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    cfg = EnvConfig(self_collision=True, meta_pd=False, meta_pd_joint=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    assert meta == 2 * nd
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))
    # non-trivial per-joint scales so the path is actually exercised
    act = act.at[:, nd + vf:].add(
        0.5 * jax.random.normal(jax.random.PRNGKey(7), (B, meta)))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=8)
    q_ref, v_ref = sim(model, qp, qv, act, tb, 1.0)

    lane = make_fused_do_simulation_lane(topo, cfg, model, env_tile=16,
                                         sub_tile=8, pcg_iters=3,
                                         interpret=True, pcg_vpu=True)
    q1, v1 = lane(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 2e-3
    assert float(jnp.max(jnp.abs(v1 - v_ref))) < 2e-1

    # the scales must matter: zeroed meta dims -> different trajectory
    act0 = act.at[:, nd + vf:].set(0.0)
    q2, _ = lane(qp, qv, act0, tb, 1.0)
    assert float(jnp.max(jnp.abs(q2 - q1))) > 1e-5


def test_meta_pd_joint_routing():
    """meta_pd_joint is fused-compatible on the lane kernel only."""
    cfg = EnvConfig(meta_pd=False, meta_pd_joint=True)
    assert not H.fused_compatible(cfg)
    assert not H.fused_compatible(cfg, lane=False)
    assert H.fused_compatible(cfg, lane=True)


@pytest.mark.slow
@pytest.mark.parametrize("gate", [None, "height", "ground"])
def test_lane_kernel_explicit_rfc_interpret(gate):
    """Explicit per-body RFC (engine.assemble:594-605, reference
    humanoid_im.py:1080-1132) through the lane kernel vs the XLA solver:
    the body-frame [cp|f|t] wrenches enter as a (9nb, EL) operand, are
    rotated by the current per-substep body orientation and projected
    in-kernel via dot_J6, with the optional height/ground contact gate."""
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)
    B = 16
    rng = jax.random.PRNGKey(0)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    # sink 2 cm so ground contacts are active (else the "ground" gate
    # correctly zeroes every wrench and the difference assert is vacuous)
    qp = qp.at[:, 2].add(-0.02)
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    cfg = EnvConfig(self_collision=True, residual_force=True,
                    residual_force_mode="explicit",
                    residual_force_scale=100.0,
                    residual_force_torque=True,
                    residual_contact_projection=True,
                    residual_contact_only=gate is not None,
                    residual_contact_only_ground=gate == "ground")
    nd, vf, meta = H.action_dims(topo, cfg)
    assert vf == 9 * topo.nbody
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))
    # non-trivial wrenches so the path is actually exercised
    act = act.at[:, nd:nd + vf].add(
        0.05 * jax.random.normal(jax.random.PRNGKey(3), (B, vf)))

    sim = S.make_do_simulation(topo, cfg, pcg_iters=8)
    q_ref, v_ref = sim(model, qp, qv, act, tb, 1.0)

    lane = make_fused_do_simulation_lane(topo, cfg, model, env_tile=16,
                                         sub_tile=8, pcg_iters=3,
                                         interpret=True, pcg_vpu=True)
    q1, v1 = lane(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q1 - q_ref))) < 2e-3
    assert float(jnp.max(jnp.abs(v1 - v_ref))) < 2e-1

    # the wrenches must matter: zeroed vf dims -> different trajectory
    act0 = act.at[:, nd:nd + vf].set(0.0)
    q2, _ = lane(qp, qv, act0, tb, 1.0)
    assert float(jnp.max(jnp.abs(q2 - q1))) > 1e-5


@pytest.mark.slow
def test_lane_kernel_merge_j6_interpret():
    """merge_j6=True (all of a substep's dot_J6 wrench projections — bias,
    ground contact, contact damping, self-collision, explicit RFC — in ONE
    masked-ancestor contraction) must match the per-call kernel to fp
    noise: column-independent matmul accumulation makes each group's
    result bit-identical, so any drift means the restructure broke data
    flow."""
    from uhc_tpu.physics.pallas_lane import make_fused_do_simulation_lane

    topo, model = load_mjcf_humanoid(XML)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(NEUTRAL)
    lib, _ = build_expert_library(topo, model, seqs, max_len=8)
    B = 16
    rng = jax.random.PRNGKey(0)
    qp = jnp.tile(lib["qpos"][0, 0][None], (B, 1))
    qp = qp.at[:, 2].add(-0.02)          # active ground contacts
    qv = 0.05 * jax.random.normal(rng, (B, topo.nv))
    tb = jnp.tile(lib["qpos"][0, 1, 7:][None], (B, 1))

    # 4 merged pairs: bias + contact + damping + self-collision
    cfg = EnvConfig(self_collision=True)
    nd, vf, meta = H.action_dims(topo, cfg)
    act = 0.02 * jax.random.normal(rng, (B, nd + vf + meta))
    mk = lambda c, **kw: make_fused_do_simulation_lane(
        topo, c, model, env_tile=16, sub_tile=8, pcg_iters=(1, 2),
        interpret=True, pcg_vpu=True, **kw)
    q_s, v_s = mk(cfg)(qp, qv, act, tb, 1.0)
    q_m, v_m = mk(cfg, merge_j6=True)(qp, qv, act, tb, 1.0)
    assert float(jnp.max(jnp.abs(q_m - q_s))) < 1e-6
    assert float(jnp.max(jnp.abs(v_m - v_s))) < 1e-4

    # 5 merged pairs: + explicit RFC (ground gate shares the contact pass)
    cfg5 = EnvConfig(self_collision=True, residual_force=True,
                     residual_force_mode="explicit",
                     residual_force_scale=100.0,
                     residual_force_torque=True,
                     residual_contact_projection=True,
                     residual_contact_only=True,
                     residual_contact_only_ground=True)
    nd5, vf5, meta5 = H.action_dims(topo, cfg5)
    act5 = 0.02 * jax.random.normal(rng, (B, nd5 + vf5 + meta5))
    act5 = act5.at[:, nd5:nd5 + vf5].add(
        0.05 * jax.random.normal(jax.random.PRNGKey(3), (B, vf5)))
    q_s5, v_s5 = mk(cfg5)(qp, qv, act5, tb, 1.0)
    q_m5, v_m5 = mk(cfg5, merge_j6=True)(qp, qv, act5, tb, 1.0)
    assert float(jnp.max(jnp.abs(q_m5 - q_s5))) < 1e-6
    assert float(jnp.max(jnp.abs(v_m5 - v_s5))) < 1e-4
