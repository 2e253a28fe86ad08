"""Asset models (TPU re-design of app/models/ — SURVEY.md §2.2)."""
from .asset_base import AssetAssignment, AssetModel
from .assets import (DummyBox, ImageEmbeddings, LearnableParams, LoTDNeRFDistant,
                     LoTDNeRFObj, LoTDNeRFStreet, LoTDNeuSObj, LoTDNeuSStreet,
                     MLPNeuSObj, MLPNeuSStreet, NeRFDistant, PureColorSkyAsset,
                     SimpleSkyAsset, pretrain_sdf)
