"""Registry-style model construction from config dicts.

Parity target: the reference's string-typed registry construction
(`@BACKBONES.register_module()` etc., SURVEY §5.6) — configs say
`dict(type='ViTAdapter', ...)` and the builder resolves classes.
"""

from typing import Any, Dict

import jax.numpy as jnp

from vitadapter.heads.mask2former import Mask2FormerHead
from vitadapter.heads.upernet import FCNHead, UPerHead
from vitadapter.models.mask2former_segmentor import EncoderDecoderMask2Former
from vitadapter.models.segmentor import EncoderDecoder
from vitadapter.det.cascade import CascadeRCNN
from vitadapter.det.dino_detector import DINO
from vitadapter.det.grounding_dino import GroundingDINO
from vitadapter.det.mask_rcnn import MaskRCNN
from vitadapter.det.single_stage import ATSS
from vitadapter.det.sparse_rcnn import SparseRCNN
from vitadapter.heads.maskformer import MaskFormerHead
from vitadapter.models.baselines import BEiTBaseline, ViTBaseline
from vitadapter.models.beit import BEiT
from vitadapter.models.beit_adapter import BEiTAdapter
from vitadapter.models.uniperceiver import UnifiedBertEncoder
from vitadapter.models.uniperceiver_adapter import UniPerceiverAdapter
from vitadapter.models.vit import TIMMVisionTransformer
from vitadapter.models.vit_adapter import ViTAdapter

REGISTRY: Dict[str, Any] = {
    # backbones
    "ViTAdapter": ViTAdapter,
    "BEiT": BEiT,
    "BEiTAdapter": BEiTAdapter,
    "UniPerceiverAdapter": UniPerceiverAdapter,
    "UnifiedBertEncoder": UnifiedBertEncoder,
    "TIMMVisionTransformer": TIMMVisionTransformer,
    "ViTBaseline": ViTBaseline,
    "BEiTBaseline": BEiTBaseline,
    # segmentation
    "UPerHead": UPerHead,
    "FCNHead": FCNHead,
    "Mask2FormerHead": Mask2FormerHead,
    "MaskFormerHead": MaskFormerHead,
    "EncoderDecoder": EncoderDecoder,
    "EncoderDecoderMask2Former": EncoderDecoderMask2Former,
    # detection / grounding
    "MaskRCNN": MaskRCNN,
    "CascadeRCNN": CascadeRCNN,
    "ATSS": ATSS,
    "SparseRCNN": SparseRCNN,
    "DINO": DINO,
    "GroundingDINO": GroundingDINO,
}

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def register(name: str, cls) -> None:
    REGISTRY[name] = cls


def build(cfg: Dict[str, Any]):
    """Recursively build from {'type': Name, **kwargs}; nested dicts with a
    'type' key become submodules; lists are converted to tuples (flax modules
    must be hashable-field dataclasses)."""
    if not isinstance(cfg, dict) or "type" not in cfg:
        return cfg
    cfg = dict(cfg)
    name = cfg.pop("type")
    if name not in REGISTRY:
        raise KeyError(f"unknown component type {name!r}; "
                       f"known: {sorted(REGISTRY)}")
    kwargs = {}
    for k, v in cfg.items():
        if isinstance(v, dict) and "type" in v:
            v = build(v)
        elif isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        elif k == "dtype" and isinstance(v, str):
            v = DTYPES[v]
        kwargs[k] = v
    return REGISTRY[name](**kwargs)


def build_model(model_cfg: Dict[str, Any]):
    return build(model_cfg)
