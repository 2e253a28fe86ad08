"""AssetBank: builds and owns all asset models + their parameter pytrees.

TPU-native re-design of ``app/resources/asset_bank.py`` (reference:
``create_asset_bank`` dispatching on AssetAssignment :109-242, per-model
optimizers :36,56-76, flat per-model state dict :245-263, lifecycle fan-outs
:279-316 — SURVEY.md §1 key idea 2, §2.1).

Config schema (mirroring the reference's ``assetbank_cfg``)::

    {class_name: {model_class: "neuralsim_tpu.models.assets.LoTDNeuSStreet",
                  model_params: {...}, asset_params: {training_cfg: {...}}}}

Params live OUTSIDE the bank as one ``{model_id: pytree}`` dict so the whole
bank trains under a single optax multi-transform and checkpoints as one tree.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax

from ..models.asset_base import AssetAssignment, AssetModel
from ..utils.misc import import_str


class AssetBank:
    def __init__(self):
        self.assets: Dict[str, AssetModel] = {}          # model_id -> asset
        self.class_of: Dict[str, str] = {}               # model_id -> class_name
        # drawable binding: (scene_id, obj_id) -> model_id
        self.binding: Dict[tuple, str] = {}

    # -- construction ----------------------------------------------------------
    @classmethod
    def create(cls, assetbank_cfg: Dict[str, Dict], scene_bank: List,
               ) -> "AssetBank":
        """Instantiate every configured asset for every scene/object it
        applies to (reference create_asset_bank, asset_bank.py:109-242)."""
        bank = cls()
        for class_name, cfg in assetbank_cfg.items():
            model_cls = cfg["model_class"]
            if isinstance(model_cls, str):
                model_cls = import_str(model_cls)
            mp = cfg.get("model_params", {})
            ap = cfg.get("asset_params", {})
            a = model_cls.assignment
            for scene in scene_bank:
                if a == AssetAssignment.OBJECT:
                    for oid in scene.drawable_ids():
                        if scene.drawables[oid].class_name != class_name:
                            continue
                        asset = model_cls(mp, ap)
                        asset.populate(scene, [oid])
                        mid = model_cls.compute_id(class_name, scene.id, oid)
                        bank._register(mid, class_name, asset)
                        bank.binding[(scene.id, oid)] = mid
                elif a in (AssetAssignment.SCENE, AssetAssignment.MISC):
                    asset = model_cls(mp, ap)
                    asset.populate(scene, None)
                    mid = model_cls.compute_id(class_name, scene.id)
                    bank._register(mid, class_name, asset)
                    bank.binding[(scene.id, class_name)] = mid
                elif a == AssetAssignment.MULTI_OBJ_ONE_SCENE:
                    oids = [oid for oid in scene.drawable_ids()
                            if scene.drawables[oid].class_name == class_name]
                    if not oids:
                        continue
                    asset = model_cls(mp, ap)
                    asset.populate(scene, oids)
                    mid = model_cls.compute_id(class_name, scene.id)
                    bank._register(mid, class_name, asset)
                    for oid in oids:
                        bank.binding[(scene.id, oid)] = mid
                elif a == AssetAssignment.MULTI_OBJ:
                    # one shared model across all scenes; populate with union
                    mid = model_cls.compute_id(class_name)
                    if mid not in bank.assets:
                        asset = model_cls(mp, ap)
                        all_oids = [oid for sc in scene_bank
                                    for oid in sc.drawable_ids()
                                    if sc.drawables[oid].class_name == class_name]
                        asset.populate(scene_bank[0], all_oids)
                        bank._register(mid, class_name, asset)
                    for oid in scene.drawable_ids():
                        if scene.drawables[oid].class_name == class_name:
                            bank.binding[(scene.id, oid)] = mid
        return bank

    def _register(self, model_id: str, class_name: str, asset: AssetModel):
        self.assets[model_id] = asset
        self.class_of[model_id] = class_name

    # -- params ----------------------------------------------------------------
    def init_params(self, key) -> Dict[str, Any]:
        keys = jax.random.split(key, max(len(self.assets), 1))
        return {mid: a.init(k) for (mid, a), k in zip(self.assets.items(), keys)}

    def training_initialize(self, params: Dict[str, Any], key) -> Dict[str, Any]:
        """Run per-asset geometry pretraining (reference
        trainer.training_initialize -> asset_training_initialize)."""
        out = dict(params)
        for i, (mid, a) in enumerate(self.assets.items()):
            out[mid] = a.training_initialize(out[mid], jax.random.fold_in(key, i))
        return out

    def training_cfgs(self) -> Dict[str, Dict]:
        """{model_id: optimizer hyperparams} for optax multi-transform."""
        return {mid: a.training_cfg for mid, a in self.assets.items()
                if a.training_cfg}

    # -- lookup ----------------------------------------------------------------
    def model_for(self, scene_id: str, obj_or_class: str) -> Optional[str]:
        return self.binding.get((scene_id, obj_or_class))

    def asset_for(self, scene_id: str, obj_or_class: str) -> Optional[AssetModel]:
        mid = self.model_for(scene_id, obj_or_class)
        return self.assets.get(mid) if mid else None

    def ids(self) -> List[str]:
        return list(self.assets.keys())
