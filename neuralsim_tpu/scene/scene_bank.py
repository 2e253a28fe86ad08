"""Scene bank IO: create scenes from a dataset and cache scenario pickles.

TPU-native re-design of ``app/resources/scene_bank.py`` (reference, 223 LoC:
``create_scene_bank`` :162 — dataset -> scenario dicts -> Scenes + pickles to
exp_dir/scenarios/ for resume/worker loads; ``load_scene_bank`` :209;
scenario-string parsing "scene_id, start_frame, n_frames" :32 —
SURVEY.md §2.1, §3.4).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional, Tuple

from .scene import Scene


def parse_scene_spec(spec: str) -> Tuple[str, int, Optional[int]]:
    """'scene_id[, start_frame[, n_frames]]' -> (id, start, n or None)."""
    parts = [p.strip() for p in str(spec).split(",")]
    sid = parts[0]
    start = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    n = int(parts[2]) if len(parts) > 2 and parts[2] else None
    return sid, start, n


def _slice_scenario(sc: Dict[str, Any], start: int, n: Optional[int]) -> Dict:
    """Trim a scenario dict to [start, start+n) frames."""
    import numpy as np
    total = int(sc.get("metas", {}).get("num_frames", 0))
    if start == 0 and (n is None or n >= total):
        return sc
    n = min(n or (total - start), total - start)

    def cut(arr):
        a = np.asarray(arr)
        return a[start:start + n] if a.ndim and a.shape[0] >= start + n else a

    def cut_obs(o):
        o = dict(o)
        if "data" in o:
            o["data"] = {k: cut(v) for k, v in o["data"].items()}
            o["n_frames"] = n
        if "children" in o:
            o["children"] = {k: cut_obs(v) for k, v in o["children"].items()}
        return o

    def cut_obj(o):
        o = dict(o)
        segs = []
        for seg in o.get("segments", []):
            s0 = int(seg.get("start_frame", 0))
            sn = int(seg["n_frames"])
            lo = max(s0, start)
            hi = min(s0 + sn, start + n)
            if hi <= lo:
                continue
            segs.append({"start_frame": lo - start, "n_frames": hi - lo,
                         "data": {k: np.asarray(v)[lo - s0:hi - s0]
                                  for k, v in seg["data"].items()}})
        o["segments"] = segs
        return o

    out = dict(sc)
    out["metas"] = {**sc.get("metas", {}), "num_frames": n}
    out["observers"] = {k: cut_obs(v) for k, v in sc.get("observers", {}).items()}
    out["objects"] = {k: cut_obj(v) for k, v in sc.get("objects", {}).items()}
    return out


def create_scene_bank(dataset, scenebank_cfg: Dict[str, Any],
                      exp_dir: Optional[str] = None) -> List[Scene]:
    """Build Scenes per the config and cache scenario pickles under
    ``exp_dir/scenarios/`` (reference create_scene_bank)."""
    specs = scenebank_cfg.get("scenarios") or dataset.scene_ids()
    scenario_kw = dict(scenebank_cfg.get("scenario_cfg", {}))
    scenes: List[Scene] = []
    for spec in specs:
        sid, start, n = parse_scene_spec(spec)
        scenario = dataset.get_scenario(sid, **scenario_kw)
        scenario = _slice_scenario(scenario, start, n)
        if exp_dir:
            d = os.path.join(exp_dir, "scenarios")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{sid}.pkl"), "wb") as f:
                pickle.dump(scenario, f)
        scenes.append(Scene.load_from_scenario(scenario))
    return scenes


def load_scene_bank(exp_dir: str) -> List[Scene]:
    """Load cached scenario pickles (resume / worker path — reference
    load_scene_bank)."""
    d = os.path.join(exp_dir, "scenarios")
    scenes = []
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".pkl"):
            with open(os.path.join(d, fn), "rb") as f:
                scenes.append(Scene.load_from_scenario(pickle.load(f)))
    return scenes
