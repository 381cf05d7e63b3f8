"""Regression: iter_best.p must not be clobbered by a worse fresh run.

The reference keeps a best-coverage checkpoint (agent_copycat.py:216-236).
Round-3 bug: a legacy iter_best.p written before the ``coverage`` key
existed made `_read_best_coverage` return 0, so a fresh coverage-0 run
satisfied ``cov >= best`` and overwrote the epoch-699 succ=1.0 checkpoint.
The guard now (a) recovers legacy coverage from the eval_*.json history and
(b) requires a strict improvement unless this run already owns the best.
"""
import json
import os
import pickle

from uhc_tpu.learn.agent import CopycatAgent


class _Stub:
    """Carries only what `_read_best_coverage` / the guard logic touch."""
    _owns_best = CopycatAgent._owns_best
    _read_best_coverage = CopycatAgent._read_best_coverage

    def __init__(self, results_dir):
        self.results_dir = results_dir


def _write_best(tmp, extra=None):
    os.makedirs(os.path.join(tmp, "models"), exist_ok=True)
    state = {"policy_params": {}, "epoch": 699, **(extra or {})}
    with open(os.path.join(tmp, "models", "iter_best.p"), "wb") as f:
        pickle.dump(state, f)


def test_reads_coverage_key(tmp_path):
    _write_best(str(tmp_path), {"coverage": 1})
    assert _Stub(str(tmp_path))._read_best_coverage() == 1


def test_legacy_checkpoint_recovers_from_eval_json(tmp_path):
    # No coverage key in the pickle, but the eval history shows coverage=1.
    _write_best(str(tmp_path))
    with open(tmp_path / "eval_0600.json", "w") as f:
        json.dump({"succ": 1.0, "coverage": 1, "num_seqs": 1}, f)
    with open(tmp_path / "eval_0010.json", "w") as f:
        json.dump({"succ": 0.0, "coverage": 0, "num_seqs": 1}, f)
    assert _Stub(str(tmp_path))._read_best_coverage() == 1


def test_no_checkpoint_means_first_eval_writes(tmp_path):
    assert _Stub(str(tmp_path))._read_best_coverage() == -1


def test_fresh_run_cannot_tie_clobber(tmp_path):
    """A fresh run at equal coverage must NOT overwrite; only the run
    that owns the best may refresh it at equal coverage."""
    stub = _Stub(str(tmp_path))
    _write_best(str(tmp_path), {"coverage": 1})
    best = stub._read_best_coverage()
    cov = 1
    fresh_writes = cov > best or (cov == best and stub._owns_best)
    assert not fresh_writes
    # Once the run has written the best itself, equal coverage refreshes.
    stub._owns_best = True
    owner_writes = cov > best or (cov == best and stub._owns_best)
    assert owner_writes


def test_sampler_resume_across_library_sizes():
    """Warm-starting a larger clip library from a smaller run's checkpoint
    must not crash the hard-mining sampler (records padded/truncated)."""
    from uhc_tpu.data.sampling import FailureFrequencySampler
    small = FailureFrequencySampler(3)
    small.records[1].append(1.0)
    big = FailureFrequencySampler(5)
    big.load_state_dict(small.state_dict())
    assert len(big.records) == 5 and big.logits().shape == (5,)
    tiny = FailureFrequencySampler(2)
    tiny.load_state_dict(small.state_dict())
    assert len(tiny.records) == 2 and tiny.logits().shape == (2,)
