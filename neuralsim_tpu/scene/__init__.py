"""Scene graph & resources (TPU re-design of app/resources/ — SURVEY.md §2.1)."""
from .nodes import SceneNode
from .scene import Scene, FrozenScene
from .asset_bank import AssetBank
