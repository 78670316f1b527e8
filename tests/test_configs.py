"""Every shipped config must parse and construct its model."""

import glob
import os

import pytest

from vitadapter.builder import build_model
from vitadapter.utils.config import Config

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(ROOT, "*", "*.py"))
    if "_base_" not in p)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p)
                                               for p in CONFIGS])
def test_config_builds(path):
    cfg = Config.fromfile(path)
    assert "model" in cfg
    model = build_model(dict(cfg.model))
    assert model is not None
    assert "data" in cfg and "dataset_type" in cfg.data


def test_cfg_options_override():
    cfg = Config.fromfile(CONFIGS[0])
    cfg.merge_from_options({"model.backbone.depth": 2,
                            "optimizer.lr": "0.01"})
    assert cfg.model["backbone"]["depth"] == 2
    assert cfg.optimizer["lr"] == 0.01


def test_base_inheritance_and_delete():
    path = os.path.join(ROOT, "cityscapes",
                        "mask2former_beit_adapter_large_896_80k_cityscapes_ss.py")
    cfg = Config.fromfile(path)
    # per-dataset model base (reference `mask2former_beit_cityscapes.py`
    # chain): 19 classes, 100 queries, 1024-dim head
    assert cfg.model["decode_head"]["num_classes"] == 19
    assert cfg.model["decode_head"]["num_queries"] == 100
    assert cfg.model["decode_head"]["feat_channels"] == 1024
    # inherited from the shared mask2former_beit model base
    assert cfg.model["backbone"]["type"] == "BEiTAdapter"
    assert cfg.data["dataset_type"] == "CityscapesDataset"
