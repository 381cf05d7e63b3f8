"""Design-space morphology parameters — the Transform2Act lineage
(reference uhc/smpllib/smpl_robot.py:798-949 Body.get_params/set_params,
:1654-1707 Robot.get_params/set_params/get_gnn_edges, :1285
enforce_length_size).

The reference mutates lxml body nodes and re-exports XML per design; here a
design is *data*: `set_params` maps a normalized [-1, 1] vector to a new
`Model` pytree (pure, differentiable, vmap-able), so a population of
designs is a batched model library that runs through the SAME batched env
step as shape-conditioned training (physics.model.model_batch_axes) — no
recompilation per design, and design gradients flow through the physics if
wanted.

Parameter layout per body (in topology order), mirroring the reference
specs: optional offset components ("xyz"/"xz"/"xy"), optional bone length,
optional bone angle (atan2 of the offset's z/x, rotated in the x-z plane).
An optional leading beta block covers shape-conditioned design. Mapping
"clip" or "sin" squashes raw params exactly like Robot.map_params.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from uhc_tpu.physics.model import Model, Topology

_OFFSET_COMPS = {"xyz": (0, 1, 2), "xz": (0, 2), "xy": (0, 1)}


def _norm(x, lb, ub):
    return (x - lb) / (ub - lb) * 2.0 - 1.0


def _denorm(x, lb, ub):
    return (x + 1.0) * 0.5 * (ub - lb) + lb


class DesignSpace:
    """Normalized morphology parameter space over a Model.

    spec keys (all optional):
      "offset":   {"type": "xyz"|"xz"|"xy", "lb": float|list, "ub": ...}
      "bone_len": {"lb": float, "ub": float}
      "bone_ang": {"lb": float, "ub": float}
      "beta":     {"lb": float, "ub": float, "n": 10}
    matching cfg.robot_cfg["body_params"] semantics; `mapping` is
    Robot.param_mapping ("clip" | "sin" | "none").
    """

    def __init__(self, topo: Topology, spec: Dict[str, dict],
                 mapping: str = "clip", bodies: Optional[List[str]] = None):
        self.topo = topo
        self.spec = spec
        self.mapping = mapping
        names = list(topo.body_names)
        # non-root bodies participate (the root has no parent offset)
        self.body_idx = [names.index(b) for b in (bodies or names[1:])]
        self._layout = []        # (kind, body_idx or None, width)
        if "beta" in spec:
            self._layout.append(("beta", None, int(spec["beta"].get("n", 10))))
        for b in self.body_idx:
            if "offset" in spec:
                comps = _OFFSET_COMPS[spec["offset"].get("type", "xyz")]
                self._layout.append(("offset", b, len(comps)))
            if "bone_len" in spec:
                self._layout.append(("bone_len", b, 1))
            if "bone_ang" in spec:
                self._layout.append(("bone_ang", b, 1))
        self.n_params = sum(w for _, _, w in self._layout)

    def param_names(self) -> List[str]:
        out = []
        for kind, b, w in self._layout:
            if kind == "beta":
                out += [f"beta_{i}" for i in range(w)]
            elif kind == "offset":
                comps = _OFFSET_COMPS[self.spec["offset"].get("type", "xyz")]
                out += [f"{self.topo.body_names[b]}_offset_{'xyz'[c]}"
                        for c in comps]
            else:
                out.append(f"{self.topo.body_names[b]}_{kind}")
        return out

    def map_params(self, params):
        if self.mapping == "clip":
            return jnp.clip(params, -1.0, 1.0)
        if self.mapping == "sin":
            return jnp.sin(params * (0.5 * np.pi))
        return params

    # -- get ---------------------------------------------------------------
    def get_params(self, model: Model, beta=None):
        """Model -> normalized (n_params,) vector (Robot.get_params)."""
        bp = jnp.asarray(model.body_pos)
        out = []
        for kind, b, w in self._layout:
            if kind == "beta":
                s = self.spec["beta"]
                out.append(_norm(jnp.zeros(w) if beta is None
                                 else jnp.asarray(beta)[:w],
                                 s["lb"], s["ub"]))
            elif kind == "offset":
                s = self.spec["offset"]
                comps = np.asarray(_OFFSET_COMPS[s.get("type", "xyz")])
                out.append(_norm(bp[b][comps], jnp.asarray(s["lb"]),
                                 jnp.asarray(s["ub"])))
            elif kind == "bone_len":
                s = self.spec["bone_len"]
                out.append(_norm(jnp.linalg.norm(bp[b])[None],
                                 s["lb"], s["ub"]))
            else:  # bone_ang
                s = self.spec["bone_ang"]
                ang = jnp.arctan2(bp[b][2], bp[b][0])
                out.append(_norm(ang[None], s["lb"], s["ub"]))
        return jnp.concatenate(out)

    # -- set ---------------------------------------------------------------
    def set_params(self, model: Model, params) -> Model:
        """Normalized vector -> mutated Model (Robot.set_params + rebuild):
        bone offsets move/stretch/rotate; per-body geometry (COM, contact
        and self-collision proxies) and mass/inertia rescale with the
        length ratio (enforce_length_size analog: mass ~ s, inertia ~ s^2
        about the stretched axis is approximated isotropically s^2)."""
        params = self.map_params(jnp.asarray(params))
        bp = jnp.asarray(model.body_pos)
        new_bp = bp
        i = 0
        scale = jnp.ones(self.topo.nbody, bp.dtype)
        for kind, b, w in self._layout:
            chunk = params[i:i + w]
            i += w
            if kind == "beta":
                continue  # consumed by the caller's shape pipeline
            cur = new_bp[b]
            if kind == "offset":
                s = self.spec["offset"]
                comps = np.asarray(_OFFSET_COMPS[s.get("type", "xyz")])
                val = _denorm(chunk, jnp.asarray(s["lb"]),
                              jnp.asarray(s["ub"]))
                cur = cur.at[comps].set(val)
            elif kind == "bone_len":
                s = self.spec["bone_len"]
                length = _denorm(chunk[0], s["lb"], s["ub"])
                cur_len = jnp.maximum(jnp.linalg.norm(cur), 1e-6)
                cur = cur * (length / cur_len)
            else:  # bone_ang: rotate offset in the x-z plane
                s = self.spec["bone_ang"]
                ang = _denorm(chunk[0], s["lb"], s["ub"])
                r = jnp.sqrt(cur[0] ** 2 + cur[2] ** 2)
                cur = jnp.stack([r * jnp.cos(ang), cur[1],
                                 r * jnp.sin(ang)])
            ratio = (jnp.maximum(jnp.linalg.norm(cur), 1e-6)
                     / jnp.maximum(jnp.linalg.norm(bp[b]), 1e-6))
            scale = scale.at[b].set(ratio)
            new_bp = new_bp.at[b].set(cur)
        return dataclasses.replace(
            model,
            body_pos=new_bp,
            body_ipos=jnp.asarray(model.body_ipos) * scale[:, None],
            body_mass=jnp.asarray(model.body_mass) * scale,
            body_inertia=jnp.asarray(model.body_inertia)
            * scale[:, None] ** 2,
            contact_point=jnp.asarray(model.contact_point)
            * scale[:, None, None],
            sc_point=jnp.asarray(model.sc_point) * scale[:, None, None],
            sc_radius=jnp.asarray(model.sc_radius)
            * jnp.sqrt(scale))

    def rebuild(self, model: Model, params) -> Model:
        """Alias of set_params (Robot.rebuild applies the stored params)."""
        return self.set_params(model, params)


def gnn_edges(topo: Topology) -> np.ndarray:
    """(E, 2) parent edges in body order (Robot.get_gnn_edges)."""
    return np.asarray([[i, topo.parents[i]]
                       for i in range(1, topo.nbody)], np.int32)
