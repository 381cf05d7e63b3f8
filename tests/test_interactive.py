"""Interactive viewer — reference key-binding semantics, headless.

The playback logic is a pure state machine (`PlaybackState`) mirroring the
reference GLFW viewer (uhc/khrylib/rl/utils/visualizer.py:6 key_callback +
:75 show_animation; mjviewer.py:100 extras), so every binding is testable
without a window system; the matplotlib shell is exercised under Agg with
synthetic key events.
"""
import os

import numpy as np
import pytest

from uhc_tpu.utils.interactive import T_ARR, InteractiveViewer, PlaybackState


def test_key_map_matches_reference_semantics():
    s = PlaybackState(num_fr=10, num_takes=3)

    assert s.on_key(" ") and s.paused          # space pauses
    assert not s.tick() and s.fr == 0          # paused -> no advance
    s.on_key("space")
    assert not s.paused

    s.on_key("right"); s.on_key("right")
    assert s.fr == 2
    s.on_key("left")
    assert s.fr == 1
    s.on_key("e")
    assert s.fr == 9
    s.on_key("right")                           # clamped at the end
    assert s.fr == 9
    s.on_key("w")
    assert s.fr == 0
    s.on_key("left")                            # clamped at the start
    assert s.fr == 0

    # d/f cycle the T array exactly like the reference (start T=12)
    assert s.T == 12
    s.on_key("d")
    assert s.T == 15
    s.on_key("f"); s.on_key("f")
    assert s.T == 10
    for _ in range(len(T_ARR)):                 # full wrap returns home
        s.on_key("d")
    assert s.T == 10

    # q cycles takes and rewinds
    s.fr = 5
    s.on_key("q")
    assert s.take == 1 and s.fr == 0 and s.take_changed
    s.on_key("q"); s.take_changed = False
    s.on_key("q")
    assert s.take == 0                           # wraps around

    assert not s.on_key("z")                     # unhandled key
    assert s.on_key(None) is False


def test_tick_advance_reverse_and_repeat():
    s = PlaybackState(num_fr=4, num_takes=1, T=2)
    # advances every T ticks (show_animation t >= floor(T))
    assert not s.tick() and s.fr == 0
    assert s.tick() and s.fr == 1
    s.tick(); assert s.tick() and s.fr == 2
    s.tick(); s.tick()
    assert s.fr == 3
    # end without repeat: stays
    s.tick(); assert not s.tick() and s.fr == 3
    # repeat wraps to 0
    s.on_key("g")
    s.tick(); assert s.tick() and s.fr == 0
    # reverse walks backward and wraps under repeat
    s.on_key("s")
    s.tick(); assert s.tick() and s.fr == 3
    s.on_key("g")                                # repeat off
    s.fr = 1
    s.tick(); assert s.tick() and s.fr == 0
    s.tick(); assert not s.tick() and s.fr == 0  # start without repeat


def _takes(T=6, nb=24, n=2):
    rng = np.random.default_rng(0)
    out = {}
    for i in range(n):
        pred = rng.normal(size=(T + i, nb, 3)).astype(np.float32)
        out[f"take{i}"] = {"pred_jpos": pred, "gt_jpos": pred + 0.1}
    return out


def test_viewer_agg_smoke(tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg", force=True)

    v = InteractiveViewer(_takes(), out_dir=str(tmp_path), backend="Agg")

    class Ev:                                   # minimal KeyEvent stand-in
        def __init__(self, key):
            self.key = key

    v._on_key(Ev("right"))
    assert v.state.fr == 1
    v._on_key(Ev("q"))                          # next take re-sizes num_fr
    assert v.state.take == 1 and v.state.num_fr == 7
    v._on_key(Ev("t"))                          # screenshot lands on disk
    shots = list(tmp_path.glob("frame_take1_*.png"))
    assert len(shots) == 1 and shots[0].stat().st_size > 0
    # ticks render without error under Agg
    v.state.T = 1
    for _ in range(3):
        v.step()
    assert v.state.fr == 3                      # q rewound to 0, then 3 ticks
    assert "take1" in v.ax.get_title()
