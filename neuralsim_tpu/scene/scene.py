"""Scene: the node-graph container with frame slicing and world transforms.

TPU-native re-design of ``app/resources/scenes.py`` (reference ``Scene``:
slice_at :167, interp_at :200, load_from_scenario :321, registries
drawables/observers/all_nodes :126-140, convert_rays_in_node(s) :631,686 —
SURVEY.md §2.1 and §1 key idea 1).

Design: nodes live in topological (parent-before-child) order; a frozen scene
is a dict of stacked arrays {world_transform [n_nodes(,B),4,4], scale, valid}
computed by one static loop over nodes — jit/vmap-safe, supports batched
(vector) frame indices for joint frame-pixel sampling (reference
scenes.py:665-670).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..maths.transforms import apply_rotation, apply_transform, compose_transforms, inverse_transform
from ..utils.misc import IDListedDict
from .nodes import SceneNode


class FrozenScene:
    """A scene frozen at one (or a batch of) frame index/timestamp.

    Holds per-node sliced data + propagated world transforms. All arrays
    share leading batch dims with the slicing index.
    """

    def __init__(self, scene: "Scene", node_data: List[Dict[str, Any]]):
        self.scene = scene
        self.node_data = node_data  # indexed by node.index
        self.world: List[jnp.ndarray] = []
        self._propagate()

    def _propagate(self):
        """Root-to-leaf world transform composition (reference
        ``SceneNode.update``, nodes.py:71-107)."""
        for node in self.scene.nodes_topo:
            local = self.node_data[node.index]["transform"]
            if node.parent_index < 0:
                world = local
            else:
                world = compose_transforms(self.world[node.parent_index], local)
            self.world.append(world)

    # -- accessors -----------------------------------------------------------
    def world_transform(self, node_id: str) -> jnp.ndarray:
        return self.world[self.scene.nodes[node_id].index]

    def data(self, node_id: str) -> Dict[str, Any]:
        return self.node_data[self.scene.nodes[node_id].index]

    def valid(self, node_id: str) -> jnp.ndarray:
        return self.node_data[self.scene.nodes[node_id].index]["valid"]

    # -- ray conversion --------------------------------------------------------
    def rays_to_node(self, node_id: str, rays_o: jnp.ndarray, rays_d: jnp.ndarray):
        """World rays -> node-local rays, dividing by node scale so the
        model sees its canonical unit frame (reference
        ``Scene.convert_rays_in_node``, scenes.py:631)."""
        idx = self.scene.nodes[node_id].index
        w2n = inverse_transform(self.world[idx])
        scale = self.node_data[idx]["scale"]
        o = apply_transform(w2n, rays_o) / scale
        d = apply_rotation(w2n, rays_d) / scale
        dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
        return o, d / jnp.clip(dn, 1e-9), dn[..., 0]

    def rays_from_node(self, node_id: str, rays_o, rays_d):
        idx = self.scene.nodes[node_id].index
        n2w = self.world[idx]
        scale = self.node_data[idx]["scale"]
        o = apply_transform(n2w, rays_o * scale)
        d = apply_rotation(n2w, rays_d * scale)
        return o, d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)


class Scene:
    """Scene-graph container parsed from the universal scenario format."""

    def __init__(self, scene_id: str = "scene", metas: Optional[Dict] = None):
        self.id = scene_id
        self.metas = metas or {}
        self.nodes: IDListedDict[SceneNode] = IDListedDict()
        self.nodes_topo: List[SceneNode] = []
        self.observers: IDListedDict[SceneNode] = IDListedDict()
        self.drawables: IDListedDict[SceneNode] = IDListedDict()
        self.n_frames: int = 0
        # per-drawable bound model ids (set by load_assets)
        self.model_of: Dict[str, str] = {}

    # -- construction ----------------------------------------------------------
    def add_node(self, node: SceneNode) -> SceneNode:
        self.nodes[node.id] = node
        return node

    def finalize(self):
        """Topo-sort nodes, assign indices, build registries."""
        order: List[SceneNode] = []
        seen = set()

        def visit(n: SceneNode):
            if n.id in seen:
                return
            if n.parent and n.parent in self.nodes:
                visit(self.nodes[n.parent])
            seen.add(n.id)
            order.append(n)

        for n in self.nodes.values():
            visit(n)
        self.nodes_topo = order
        for i, n in enumerate(order):
            n.index = i
            n.parent_index = self.nodes[n.parent].index \
                if (n.parent and n.parent in self.nodes) else -1
        observer_classes = {"Camera", "RaysLidar", "Lidar", "OrthoCamera",
                            "PanoramaCamera"}
        for n in order:
            if n.class_name in observer_classes:
                self.observers[n.id] = n
            elif n.class_name not in ("EgoVehicle", "node", "World"):
                self.drawables[n.id] = n
        return self

    @classmethod
    def load_from_scenario(cls, scenario: Dict) -> "Scene":
        """Build the node tree from a scenario dict (SURVEY.md App. A.4;
        reference Scene.load_from_scenario, scenes.py:321)."""
        metas = scenario.get("metas", {})
        sc = cls(scenario.get("scene_id", "scene"), metas)
        T = int(metas.get("num_frames", 0))

        def add_group(group: Dict, default_parent=None):
            for nid, odict in group.items():
                parent = odict.get("parent", default_parent)
                node = SceneNode.from_odict(nid, odict, T, parent)
                sc.add_node(node)
                # nested children (e.g. cameras under EgoVehicle)
                for cid, codict in odict.get("children", {}).items():
                    child = SceneNode.from_odict(cid, codict, T, nid)
                    sc.add_node(child)

        add_group(scenario.get("observers", {}))
        add_group(scenario.get("objects", {}))
        sc.n_frames = T
        return sc.finalize()

    # -- slicing ---------------------------------------------------------------
    def slice_at(self, fi, pose_deltas=None) -> FrozenScene:
        """Freeze at integer frame index/indices (reference scenes.py:167;
        batched indices supported for joint frame-pixel sampling).

        ``pose_deltas``: optional {node_id: {dquat [T,3], dtrans [T,3]}}
        LearnableParams tree — deltas are gathered at ``fi`` and applied to
        the node's local transform INSIDE the (jitted) slice so pose
        gradients flow to the refinement parameters (reference
        RotationQuaternionRefinedAdd/TranslationRefinedAdd semantics,
        learnable_params.py:98-112)."""
        data = []
        fi_arr = jnp.asarray(fi)
        for n in self.nodes_topo:
            d = n.slice_at(fi)
            if pose_deltas and n.id in pose_deltas:
                d = self._apply_node_deltas(d, pose_deltas[n.id], fi_arr)
            data.append(d)
        return FrozenScene(self, data)

    @staticmethod
    def _apply_node_deltas(d: Dict, pd: Dict, fi_arr) -> Dict:
        """Apply a LearnableParams node entry (any of dquat/dtrans/dintr)
        to one node's sliced frame data, gathered at the slicing index."""
        from ..models.assets import LearnableParams
        d = dict(d)
        if "dquat" in pd:
            d["transform"] = LearnableParams.apply_delta(
                d["transform"], pd["dquat"][fi_arr], pd["dtrans"][fi_arr])
        if "dintr" in pd and "intr" in d:
            d["intr"] = LearnableParams.apply_intr_delta(
                d["intr"], pd["dintr"][fi_arr])
        return d

    def _default_ts_table(self) -> jnp.ndarray:
        """Scene-level timestamp table for nodes without their own
        ``global_ts`` (e.g. annotated objects whose scenarios only carry
        per-frame transforms): borrow the first observer's table so a
        continuous SECONDS timestamp interpolates every node on the same
        clock. Falling back to frame INDICES per node silently froze moving
        objects near their first pose whenever sensors carried real
        second-unit timestamps (r4 ts-interp A/B: vehicles 22 dB)."""
        for n in self.nodes_topo:
            t = n.frame_data.get("global_ts")
            if t is not None:
                return jnp.asarray(t, jnp.float32)
        return jnp.arange(self.n_frames, dtype=jnp.float32)

    def interp_at(self, ts, pose_deltas=None) -> FrozenScene:
        """Freeze at continuous timestamp(s) (reference scenes.py:200;
        timestamp mode ``use_ts_interp``, scenes.py:53-83). ``pose_deltas``
        entries are gathered at each node's nearest-below keyframe
        (piecewise-constant over the frame grid)."""
        data = []
        default_table = self._default_ts_table()
        for n in self.nodes_topo:
            d = n.interp_at(ts, default_table=default_table)
            if pose_deltas and n.id in pose_deltas:
                table = n.frame_data.get("global_ts")
                if table is None:
                    table = default_table
                lo = jnp.clip(
                    jnp.searchsorted(table, jnp.asarray(ts, jnp.float32),
                                     side="right") - 1, 0, n.n_frames - 1)
                d = self._apply_node_deltas(d, pose_deltas[n.id], lo)
            data.append(d)
        return FrozenScene(self, data)

    def sensor_ts(self, node_id: str, fidx, dts=None) -> jnp.ndarray:
        """Per-frame global timestamps of a sensor node at (batched) frame
        indices, plus optional LearnableParams ``dts`` refinement (reference
        refine_sensor_ts, learnable_params.py:148-160: holistic offset [1]
        or per-frame deltas [T])."""
        n = self.nodes[node_id]
        table = n.frame_data.get("global_ts")
        if table is None:
            table = jnp.arange(n.n_frames, dtype=jnp.float32)
        ts = table[jnp.asarray(fidx)]
        if dts is not None:
            delta = dts[0] if dts.shape[0] == 1 else dts[jnp.asarray(fidx)]
            ts = ts + delta
        return ts

    # -- convenience -----------------------------------------------------------
    def get_observer(self, oid: str) -> SceneNode:
        return self.observers[oid]

    def drawable_ids(self) -> List[str]:
        return list(self.drawables.keys())

    def observer_ids(self) -> List[str]:
        return list(self.observers.keys())
