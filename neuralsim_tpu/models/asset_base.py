"""Asset base: assignment axis + model-id computation + lifecycle hooks.

TPU-native re-design of ``app/models/asset_base.py`` (reference:
``AssetAssignment`` OBJECT/SCENE/MULTI_OBJ/MULTI_OBJ_ONE_SCENE/MISC :21-28,
``AssetMixin`` lifecycle ``asset_compute_id / asset_populate /
asset_training_initialize`` :30-101 — SURVEY.md §2.2).

An *asset* is a static wrapper object binding a field model (NeuSField /
NeRFField / ...) to its role in the scene; parameters stay external pytrees
keyed by model_id in the AssetBank.
"""
from __future__ import annotations

import enum
from typing import Any, Dict, Optional

import jax


class AssetAssignment(enum.Enum):
    OBJECT = 0              # one model per (scene, object)
    SCENE = 1               # one model per scene (street, sky, distant)
    MULTI_OBJ_ONE_SCENE = 2 # one shared model for a category within a scene
    MULTI_OBJ = 3           # one shared model for a category across scenes
    MISC = 4                # free-floating (learnable params, embeddings)


class AssetModel:
    """Base asset: field + query config + lifecycle hooks."""

    assignment: AssetAssignment = AssetAssignment.OBJECT

    def __init__(self, model_params: Optional[Dict] = None,
                 asset_params: Optional[Dict] = None):
        self.model_params = dict(model_params or {})
        self.asset_params = dict(asset_params or {})
        self.field = None           # set by populate
        self.query_cfg: Dict = {}
        self.accel = None           # optional OccGridEma

    # -- identity (reference asset_compute_id, asset_base.py:30-101) ---------
    @classmethod
    def compute_id(cls, class_name: str, scene_id: Optional[str] = None,
                   obj_id: Optional[str] = None) -> str:
        a = cls.assignment
        if a == AssetAssignment.OBJECT:
            return f"{class_name}#{scene_id}#{obj_id}"
        if a in (AssetAssignment.SCENE, AssetAssignment.MULTI_OBJ_ONE_SCENE):
            return f"{class_name}#{scene_id}"
        return class_name

    # -- lifecycle -------------------------------------------------------------
    def populate(self, scene=None, obj_ids=None) -> None:
        """Build the concrete field from scene/object statistics (reference
        ``asset_populate`` — e.g. street AABB from camera frusta)."""
        raise NotImplementedError

    def init(self, key) -> Dict[str, Any]:
        return self.field.init(key)

    def training_initialize(self, params, key, **kw):
        """Optional geometry pretraining (reference
        ``asset_training_initialize`` — SDF capsule/road-surface pretrain,
        neus.py:198-236). Returns possibly-updated params."""
        return params

    @property
    def training_cfg(self) -> Dict:
        return dict(self.asset_params.get("training_cfg", {}))
