"""Custom autonomous-driving dataset (bring-your-own-data path).

Functional equivalent of the reference's
``dataio/autonomous_driving/custom/custom_autodrive_dataset.py`` (617 LoC):
a universal-scenario-format scene directory —

    root/<seq>/
        scenario.pt                      images/<cam>/<frame:08d>.jpg
        lidars/<lidar>/<frame:08d>.npz   masks/<cam>/<frame:08d>.npz
        depths/<cam>/...                 normals/<cam>/...

— which is exactly the layout ``WaymoDataset`` already reads; what the
custom reader adds is a selectable *semantic-mask taxonomy* (cityscapes
trainIds from SegFormer, or ADE20k from e.g. OneFormer) driving the derived
sky / human / vehicle / dynamic / road masks. Class-name lists mirror the
reference's taxonomy tables (custom_autodrive_dataset.py:80-147).
"""
from __future__ import annotations

from typing import List

import numpy as np

from .waymo import WaymoDataset

CITYSCAPES_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]

ADE20K_CLASSES = [
    "wall", "building", "sky", "floor", "tree", "ceiling", "road", "bed ",
    "windowpane", "grass", "cabinet", "sidewalk", "person", "earth",
    "door", "table", "mountain", "plant", "curtain", "chair", "car",
    "water", "painting", "sofa", "shelf", "house", "sea", "mirror", "rug",
    "field", "armchair", "seat", "fence", "desk", "rock", "wardrobe",
    "lamp", "bathtub", "railing", "cushion", "base", "box", "column",
    "signboard", "chest of drawers", "counter", "sand", "sink",
    "skyscraper", "fireplace", "refrigerator", "grandstand", "path",
    "stairs", "runway", "case", "pool table", "pillow", "screen door",
    "stairway", "river", "bridge", "bookcase", "blind", "coffee table",
    "toilet", "flower", "book", "hill", "bench", "countertop", "stove",
    "palm", "kitchen island", "computer", "swivel chair", "boat", "bar",
    "arcade machine", "hovel", "bus", "towel", "light", "truck", "tower",
    "chandelier", "awning", "streetlight", "booth", "television receiver",
    "airplane", "dirt track", "apparel", "pole", "land", "bannister",
    "escalator", "ottoman", "bottle", "buffet", "poster", "stage", "van",
    "ship", "fountain", "conveyer belt", "canopy", "washer", "plaything",
    "swimming pool", "stool", "barrel", "basket", "waterfall", "tent",
    "bag", "minibike", "cradle", "oven", "ball", "food", "step", "tank",
    "trade name", "microwave", "pot", "animal", "bicycle", "lake",
    "dishwasher", "screen", "blanket", "sculpture", "hood", "sconce",
    "vase", "traffic light", "tray", "ashcan", "fan", "pier", "crt screen",
    "plate", "monitor", "bulletin board", "shower", "radiator", "glass",
    "clock", "flag",
]

TAXONOMIES = {
    "cityscapes": {
        "classes": CITYSCAPES_CLASSES,
        "sky": ["sky"],
        "human": ["person", "rider"],
        "vehicle": ["car", "truck", "bus"],
        "dynamic": ["person", "rider", "car", "truck", "bus", "train",
                    "motorcycle", "bicycle"],
        "road": ["road"],
    },
    "ade20k": {
        "classes": ADE20K_CLASSES,
        "sky": ["sky"],
        "human": ["person"],
        "vehicle": ["car", "bus", "truck", "van"],
        "dynamic": ["person", "car", "bus", "truck", "van", "boat",
                    "airplane", "ship", "minibike", "animal", "bicycle"],
        "road": ["road"],
    },
}


def _ids(tax: dict, kinds: List[str]) -> tuple:
    names = tax["classes"]
    out = []
    for kind in kinds:
        out += [i for i, n in enumerate(names) if n.strip() in tax[kind]]
    return tuple(sorted(set(out)))


class CustomAutoDriveDataset(WaymoDataset):
    """WaymoDataset layout + selectable mask taxonomy (the reference's
    custom AD reader). ``mask_taxonomy``: 'cityscapes' | 'ade20k'."""

    def __init__(self, root: str, *, mask_taxonomy: str = "cityscapes", **kw):
        super().__init__(root, **kw)
        if mask_taxonomy not in TAXONOMIES:
            raise ValueError(f"mask_taxonomy={mask_taxonomy!r}; "
                             f"expected one of {sorted(TAXONOMIES)}")
        self.mask_taxonomy = mask_taxonomy
        tax = TAXONOMIES[mask_taxonomy]
        self._kind_ids = {k: _ids(tax, [k])
                          for k in ("sky", "human", "vehicle", "dynamic",
                                    "road")}

    def get_occupancy_mask(self, scene_id, cam_id, frame_index):
        sem = self._load_semantic(scene_id, cam_id, frame_index)
        if sem is None:
            return None
        return (~np.isin(sem, self._kind_ids["sky"])).astype(np.float32)

    def get_semantic_mask(self, scene_id, cam_id, frame_index, kind="all"):
        sem = self._load_semantic(scene_id, cam_id, frame_index)
        if sem is None or kind == "all":
            return sem
        return np.isin(sem, self._kind_ids[kind])

    def get_road_mask(self, scene_id, cam_id, frame_index):
        """Road-surface mask for RoadNormalLoss (semantic_road_classes)."""
        return self.get_semantic_mask(scene_id, cam_id, frame_index, "road")
