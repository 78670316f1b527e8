"""Detection training step under the 8-device data-parallel mesh.

Complements test_multichip_m2f (segmentation flagship): the det family's
train loop — RPN/RoI sampling, fixed-budget NMS-free target assignment,
box/mask losses — compiled over the mesh via `run_det_training`
(counterpart of the reference's DDP-wrapped `train_detector`).
"""

import jax
import numpy as np

from vitadapter.train.det_loop import run_det_training
from vitadapter.utils.config import Config


def _cfg(model_type):
    model = {
        "type": model_type,
        "num_classes": 4,
        # tiny static budgets: the default 1000-proposal graph compiles for
        # many minutes on the CPU mesh
        "num_proposals_test": 64,
        "num_proposals_train": 64,
        "num_roi_samples": 32,
        "max_dets": 10,
        "backbone": {
            "type": "ViTAdapter", "patch_size": 16, "embed_dim": 48,
            "depth": 4, "num_heads": 4, "deform_num_heads": 4,
            "conv_inplane": 16,
            "interaction_indexes": [[0, 0], [1, 1], [2, 2], [3, 3]],
        },
    }
    return Config({
        "model": model,
        "data": {"dataset_type": "CocoDataset", "crop_size": [64, 64],
                 "samples_per_chip": 1, "max_instances": 4},
        "runner": {"max_iters": 2},
        "optimizer": {"lr": 1e-4, "weight_decay": 0.05},
        "log_config": {"interval": 1},
        "checkpoint_config": {"interval": 1000},
    })


def test_mask_rcnn_trains_on_mesh(tmp_path):
    assert len(jax.devices()) == 8
    lines = []
    run_det_training(_cfg("MaskRCNN"), str(tmp_path), synthetic=True,
                     log_fn=lines.append)
    out = "\n".join(lines)
    assert "iter 2/2" in out, out
    losses = [float(l.split("loss=")[1].split()[0])
              for l in lines if "loss=" in l]
    assert losses and all(np.isfinite(l) for l in losses), out
