"""Fixed-length window datasets — DatasetAMASSBatch / DatasetAmassTraj
twins (uhc/data_loaders/dataset_amass_batch.py:32, dataset_amass_traj.py).

The reference wraps AMASS sequences in torch `data.Dataset`s of fixed-length
windows for supervised kinematic-net training. Here windows are integer
arithmetic over the stacked expert library: sampling returns (seq_idx,
start) pairs and `gather_windows` pulls (B, W, ...) batches from device
arrays in one gather — no per-item host loops, no collation.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp


class WindowSampler:
    """Uniformly samples fixed-length windows over a motion library
    (DatasetAMASSBatch.__getitem__ semantics: random seq, random start with
    the window fully inside the sequence)."""

    def __init__(self, lengths: Sequence[int], window: int, seed: int = 0):
        self.lengths = np.asarray(lengths, np.int64)
        self.window = int(window)
        self.valid = np.where(self.lengths >= self.window)[0]
        if len(self.valid) == 0:
            raise ValueError(
                f"no sequence is >= window={window} frames long")
        self.rng = np.random.RandomState(seed)

    def sample(self, batch: int):
        """-> (seq_idx (B,), start (B,)) numpy int arrays."""
        sidx = self.valid[self.rng.randint(0, len(self.valid), batch)]
        hi = np.maximum(self.lengths[sidx] - self.window, 1)
        start = (self.rng.rand(batch) * hi).astype(np.int64)
        return sidx, start

    def iter_all(self, stride: Optional[int] = None):
        """Deterministic sweep of all windows (DatasetAmassTraj.iter
        semantics); stride defaults to the window length."""
        stride = stride or self.window
        for s in self.valid:
            for st in range(0, int(self.lengths[s]) - self.window + 1,
                            stride):
                yield int(s), st


def gather_windows(lib: Dict[str, jnp.ndarray], keys: List[str],
                   seq_idx, start, window: int):
    """Gather (B, window, ...) batches from stacked (S, T, ...) library
    arrays in one vectorized take per key."""
    seq_idx = jnp.asarray(seq_idx)
    start = jnp.asarray(start)
    t = start[:, None] + jnp.arange(window)[None, :]       # (B, W)
    out = {}
    for k in keys:
        arr = lib[k]                                       # (S, T, ...)
        out[k] = arr[seq_idx[:, None], t]
    return out
