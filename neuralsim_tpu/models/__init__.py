"""Asset models (TPU re-design of app/models/ — SURVEY.md §2.2)."""
from .asset_base import AssetAssignment, AssetModel
from .assets import (ADDynamicGenerativePermutoConcatNeuSObj,
                     ADGenerativePermutoConcatNeuSObj,
                     DynamicPermutoConcatNeuSObj, DummyBox,
                     EmerNerfStreet, EmerNerfStreetOnlyDynamic, ImageEmbeddings, LearnableParams, LoTDNeRFDistant,
                     LoTDNeRFObj, LoTDNeRFStreet, LoTDNeuSObj, LoTDNeuSStreet,
                     MLPNeuSObj, MLPNeuSStreet, NeRFDistant, PermutoNeuSObj,
                     PureColorSkyAsset,
                     SimpleSkyAsset, pretrain_sdf)
