"""Replay recorded rollout takes headlessly.

Equivalent of `uhc/utils/replay_data.py` (an interactive GLFW viewer that
cycles saved takes with key callbacks): consumes the per-sequence
trajectory pkl written by `uhc_tpu.cli.eval --dump`, lists the takes, and
renders pred-vs-gt skeleton animations for one take or all of them —
keyboard take-cycling becomes `--take/--all` on a headless host.

    python -m uhc_tpu.cli.replay --data eval_dump.pkl --list
    python -m uhc_tpu.cli.replay --data eval_dump.pkl --take 0-SYN_march \
        --out replay.gif
    python -m uhc_tpu.cli.replay --data eval_dump.pkl --all --out-dir vis/
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data", required=True,
                   help="trajectory pkl from uhc_tpu.cli.eval --dump")
    p.add_argument("--take", default=None, help="sequence key to replay")
    p.add_argument("--all", action="store_true",
                   help="render every take (reference key-cycling twin)")
    p.add_argument("--list", action="store_true", dest="list_takes",
                   help="print take keys and lengths, then exit")
    p.add_argument("--out", default="replay.gif")
    p.add_argument("--out-dir", default="replay_vis")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--dump-states", default=None, metavar="NPZ",
                   help="also write the take's raw arrays (pred/gt joint "
                        "positions, qpos if present) to an .npz for "
                        "notebook inspection — the headless 'pause and "
                        "poke' equivalent of the reference viewer")
    p.add_argument("--interactive", action="store_true",
                   help="open the interactive viewer (matplotlib window "
                        "with the reference Visualizer/MjViewer key map: "
                        "space pause, left/right step, s reverse, q next "
                        "take, w/e first/last, g loop, d/f speed, "
                        "t screenshot, v record). Needs a GUI matplotlib "
                        "backend; headless hosts use --all/--out instead")
    args = p.parse_args(argv)

    import joblib

    takes = joblib.load(args.data)
    if args.list_takes:
        for k, v in takes.items():
            print(f"{k}: {len(v['pred_jpos'])} frames, "
                  f"percent={v.get('percent', float('nan')):.2f}, "
                  f"fail_safe={v.get('fail_safe')}")
        return

    if args.interactive:
        from uhc_tpu.utils.interactive import InteractiveViewer

        viewer = InteractiveViewer(takes, fps=args.fps)
        viewer.show()
        return

    from uhc_tpu.utils.visualizer import render_comparison

    if args.all:
        os.makedirs(args.out_dir, exist_ok=True)
        ext = os.path.splitext(args.out)[1] or ".gif"
        for k, v in takes.items():
            out = os.path.join(args.out_dir, f"{k}{ext}")
            path = render_comparison(v["pred_jpos"], v.get("gt_jpos"),
                                     out_path=out, fps=args.fps,
                                     stride=args.stride)
            print(f"{k} -> {path}")
        return

    key = args.take if args.take is not None else next(iter(takes))
    if key not in takes:
        raise SystemExit(f"take {key!r} not in {sorted(takes)}")
    v = takes[key]
    if args.dump_states:
        import numpy as np
        np.savez(args.dump_states,
                 **{k2: np.asarray(v2) for k2, v2 in v.items()
                    if hasattr(v2, "__len__") and not isinstance(v2, str)})
        print(f"{key} states -> {args.dump_states}")
    path = render_comparison(v["pred_jpos"], v.get("gt_jpos"),
                             out_path=args.out, fps=args.fps,
                             stride=args.stride)
    print(f"{key} -> {path}")


if __name__ == "__main__":
    main()
