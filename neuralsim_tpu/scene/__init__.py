"""Scene graph & resources (TPU re-design of app/resources/ — SURVEY.md §2.1)."""
from .nodes import SceneNode
from .scene import Scene, FrozenScene
from .asset_bank import AssetBank
from .scene_bank import create_scene_bank, load_scene_bank, parse_scene_spec
