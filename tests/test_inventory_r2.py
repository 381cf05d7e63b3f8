"""Round-2 inventory sweep: transformer policy, metrics sink,
eval_imitation metric path, object-scene library track, window datasets."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uhc_tpu.config.config import Config
from uhc_tpu.learn import nets


@pytest.mark.slow
def test_transformer_policy():
    """uhc/models/tf_policy.py:11 PolicyTransformer twin: token-per-body
    encoder, per-token joint heads + pooled global head."""
    cfg = Config(actor_type="transformer", log_std=-2.3)
    nt, td = 23, 26
    obs_dim = 28 + nt * td
    act_dim = 75
    params, fn = nets.make_policy(cfg, obs_dim, act_dim,
                                  jax.random.PRNGKey(0),
                                  n_tokens=nt, token_dim=td)
    log_std = params.pop("log_std")
    assert log_std.shape == (act_dim,)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, obs_dim))
    y = fn(params, x)
    assert y.shape == (4, act_dim)
    assert bool(jnp.all(jnp.isfinite(y)))
    # gradients flow through attention + heads
    g = jax.grad(lambda p: jnp.sum(fn(p, x) ** 2))(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    # permuting token blocks changes per-token outputs (not collapsed)
    toks = x[:, 28:].reshape(4, nt, td)
    x2 = jnp.concatenate([x[:, :28],
                          toks[:, ::-1].reshape(4, -1)], axis=1)
    assert not np.allclose(np.asarray(fn(params, x)),
                           np.asarray(fn(params, x2)))


def test_metrics_sink(tmp_path):
    from uhc_tpu.utils.metrics_sink import MetricsSink

    sink = MetricsSink(str(tmp_path))
    sink.log(0, {"reward": 0.5, "terms": np.array([1.0, 2.0])})
    sink.log(1, {"reward": 0.7}, prefix="train")
    sink.close()
    rows = [json.loads(l) for l in open(os.path.join(tmp_path,
                                                     "metrics.jsonl"))]
    assert rows[0]["reward"] == 0.5 and rows[0]["terms"] == [1.0, 2.0]
    assert rows[1]["train/reward"] == 0.7
    assert sink.last("train/reward") == 0.7


def test_eval_imitation_cli(tmp_path):
    """Standalone metric eval of a dumped results pkl
    (scripts/eval_imitation.py twin)."""
    import joblib
    import subprocess
    import sys

    T, nb = 12, 24
    rng = np.random.RandomState(0)
    q = rng.randn(T, 76).astype(np.float32)
    j = rng.randn(T, nb, 3).astype(np.float32)
    res = {"seq_a": {"pred_qpos": q, "gt_qpos": q,
                     "pred_jpos": j, "gt_jpos": j,
                     "fail_safe": False, "percent": 1.0}}
    pkl = tmp_path / "res.pkl"
    joblib.dump(res, pkl)
    out_json = tmp_path / "out.json"
    r = subprocess.run(
        [sys.executable, "-m", "uhc_tpu.cli.eval_imitation",
         "--results", str(pkl), "--json", str(out_json)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(out_json))["summary"]
    assert summary["succ"] == 1.0 and summary["mpjpe"] < 1e-4
    assert summary["coverage"] == 1


@pytest.mark.slow
def test_obj_pose_library(humanoid_setup):
    """Object-scene track (dataset_smpl_obj.py): per-frame obj qpos stored
    in the expert library and gathered per frame."""
    from uhc_tpu.data.dataset import build_expert_library
    from uhc_tpu.envs import humanoid_im as H
    import joblib

    topo, model, cfg, _, _ = humanoid_setup
    neutral = joblib.load(
        "/root/reference/sample_data/standing_neutral.pkl")
    pose = np.asarray(neutral["pose_aa"])[:12]
    obj = np.tile(np.arange(7, dtype=np.float32), (12, 2))  # 2 objects
    obj += np.arange(12, dtype=np.float32)[:, None]
    seqs = {
        "with_obj": {"pose_aa": pose, "trans": None, "obj_pose": obj},
        "without": {"pose_aa": pose, "trans": None},
    }
    lib, keys = build_expert_library(topo, model, seqs)
    assert lib["obj_pose"].shape == (2, 12, 14)
    exp = H.expert_at(lib, jnp.asarray(0), jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(exp["obj_pose"]), obj[3])
    exp2 = H.expert_at(lib, jnp.asarray(1), jnp.asarray(3))
    assert np.all(np.asarray(exp2["obj_pose"]) == 0.0)


def test_window_sampler():
    from uhc_tpu.data.windows import WindowSampler, gather_windows

    lens = [30, 8, 50]
    ws = WindowSampler(lens, window=16, seed=0)
    sidx, start = ws.sample(64)
    assert set(np.unique(sidx)) <= {0, 2}          # seq 1 too short
    assert np.all(start + 16 <= np.asarray(lens)[sidx])
    allw = list(ws.iter_all())
    assert all(st + 16 <= lens[s] for s, st in allw)
    lib = {"qpos": jnp.arange(3 * 50 * 4).reshape(3, 50, 4).astype(jnp.float32)}
    out = gather_windows(lib, ["qpos"], sidx[:4], start[:4], 16)
    assert out["qpos"].shape == (4, 16, 4)
    np.testing.assert_allclose(
        np.asarray(out["qpos"][0, 0]),
        np.asarray(lib["qpos"][sidx[0], start[0]]))
