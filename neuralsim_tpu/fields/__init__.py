"""Field models: NeuS SDF fields, NeRF density fields, distant background, sky.

TPU-native re-design of nr3d_lib.models.fields* (SURVEY.md §2.9)."""
from .neus import NeuSField, neus_alpha_from_sdf
from .nerf import NeRFField, NeRFDistantField
from .sky import SimpleSky, PureColorSky
from .spatial import AABBSpace, BatchedAABBSpace
from .conditional import (ConditionalPermutoNeuSField,
                          DynamicGenerativePermutoConcatNeuSField,
                          DynamicPermutoConcatNeuSField,
                          GenerativePermutoConcatNeuSField, PermutoNeuSField)
from .embeddings import Embedding, SeqEmbedding
