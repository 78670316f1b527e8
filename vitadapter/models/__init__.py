from vitadapter.models.vit import Block, TIMMVisionTransformer
from vitadapter.models.adapter import (
    SpatialPriorModule,
    Injector,
    Extractor,
    InteractionBlock,
    deform_inputs,
)
from vitadapter.models.vit_adapter import ViTAdapter
