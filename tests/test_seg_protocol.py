"""Seg test-protocol parity vs a full torch composite (VERDICT r3 #1).

The reference evaluates every segmentation row on images keep-ratio resized
to the test `img_scale` (then ResizeToMultiple(32)), slide-infers at that
scale, resizes logits back to `ori_shape` BEFORE softmax/unflip, and
averages per-aug probabilities
(`segmentation/configs/_base_/datasets/ade20k.py:23-27`,
`segmentation/test.py:131-136`,
`mmseg_custom/models/segmentors/encoder_decoder_mask2former.py:156-253`).

This test mirrors that pipeline in plain torch (torch_ref backbone + torch
UperNet + F.interpolate + the exact mmseg slide grid + flip-softmax-average)
and asserts the jax `run_eval` path produces the IDENTICAL per-image
confusion matrix on odd-sized non-square images, including an image smaller
than the crop in one dimension.
"""

import math

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import vitadapter.train.loop as loop_mod
from vitadapter.data.metrics import miou_from_confusion
from vitadapter.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from vitadapter.models import seg_protocol as SP
from vitadapter.utils.checkpoint import (convert_upernet_heads,
                                         convert_vit_adapter_backbone)
from vitadapter.utils.config import Config

from test_torch_parity import randomize
from torch_ref import FCNHeadT, UPerHeadT, ViTAdapterT

K = 5
CROP = (64, 64)
STRIDE = (48, 48)
IMG_SCALE = (128, 96)  # (long, short)


# ---------------------------------------------------------------------------
# protocol building blocks
# ---------------------------------------------------------------------------

def test_rescale_size_mmcv_parity():
    # mmcv.rescale_size: f = min(long/max, short/min), int(x*f + 0.5)
    assert SP.rescale_size(512, 683, (2048, 512)) == (512, 683)
    # ADE-style: 400x600 -> short side to 512 under (2048, 512)
    f = min(2048 / 600, 512 / 400)
    assert SP.rescale_size(400, 600, (2048, 512)) == (
        int(400 * f + 0.5), int(600 * f + 0.5))
    # long-edge cap binds for panoramas
    f = min(2048 / 4000, 512 / 500)
    assert SP.rescale_size(500, 4000, (2048, 512)) == (
        int(500 * f + 0.5), int(4000 * f + 0.5))
    assert SP.to_multiple(41, 64, 32) == (64, 64)
    assert SP.to_multiple(96, 97, 32) == (96, 128)


def test_resize_np_matches_torch_interpolate():
    rng = np.random.RandomState(0)
    x = rng.randn(37, 53, 3).astype(np.float32)
    got = SP.resize_np(x, (64, 41))
    ref = F.interpolate(torch.from_numpy(x.transpose(2, 0, 1))[None],
                        size=(64, 41), mode="bilinear",
                        align_corners=False)[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_slide_grid_reference_formula():
    # mirrors slide_inference:156-199 start offsets (incl. end clamping)
    for size, crop, stride in [(512, 512, 341), (683, 512, 341),
                               (1024, 512, 341), (520, 512, 341),
                               (96, 64, 48), (200, 64, 48), (30, 64, 48)]:
        ce = min(crop, size)
        n = max(size - ce + stride - 1, 0) // stride + 1
        ref = sorted({max(min(i * stride + ce, size) - ce, 0)
                      for i in range(n)})
        assert SP.slide_grid(size, ce, stride) == ref, (size, crop, stride)


# ---------------------------------------------------------------------------
# torch composite: the mmseg eval pipeline end to end
# ---------------------------------------------------------------------------

def _torch_encode_decode(backbone, head, x):
    feats = backbone(x)
    logits = head(feats)
    return F.interpolate(logits, size=x.shape[2:], mode="bilinear",
                         align_corners=False)


def _torch_slide(backbone, head, img, crop, stride, num_classes):
    """Verbatim port of the reference slide_inference grid + count_mat."""
    h_stride, w_stride = stride
    h_crop, w_crop = crop
    B, _, h_img, w_img = img.shape
    h_crop, w_crop = min(h_crop, h_img), min(w_crop, w_img)
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    preds = img.new_zeros((B, num_classes, h_img, w_img))
    count = img.new_zeros((B, 1, h_img, w_img))
    for hi in range(h_grids):
        for wi in range(w_grids):
            y1 = min(hi * h_stride, h_img - h_crop)
            x1 = min(wi * w_stride, w_img - w_crop)
            y2, x2 = y1 + h_crop, x1 + w_crop
            logit = _torch_encode_decode(backbone, head,
                                         img[:, :, y1:y2, x1:x2])
            preds[:, :, y1:y2, x1:x2] += logit
            count[:, :, y1:y2, x1:x2] += 1
    assert (count > 0).all()
    return preds / count


def torch_protocol_eval(backbone, head, dataset, img_scale, ratios, flip,
                        crop, stride, num_classes):
    """mmseg MultiScaleFlipAug + inference(rescale=True) + aug_test average."""
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    cm = np.zeros((num_classes, num_classes), np.int64)
    for i in range(len(dataset)):
        img_np, seg = dataset.load(i)
        ho, wo = seg.shape
        img = torch.from_numpy(
            np.ascontiguousarray(img_np, np.float32).transpose(2, 0, 1))[None]
        acc = torch.zeros((1, num_classes, ho, wo))
        n_aug = 0
        for r in ratios:
            canvas = (int(img_scale[0] * r), int(img_scale[1] * r))
            f = min(max(canvas) / max(ho, wo), min(canvas) / min(ho, wo))
            h1, w1 = int(ho * f + 0.5), int(wo * f + 0.5)
            x = F.interpolate(img, size=(h1, w1), mode="bilinear",
                              align_corners=False)
            h2 = int(math.ceil(h1 / 32)) * 32
            w2 = int(math.ceil(w1 / 32)) * 32
            x = F.interpolate(x, size=(h2, w2), mode="bilinear",
                              align_corners=False)
            for fl in ((False, True) if flip else (False,)):
                xi = torch.flip(x, dims=(3,)) if fl else x
                xin = (xi - mean) / std
                with torch.no_grad():
                    logits = _torch_slide(backbone, head, xin, crop, stride,
                                          num_classes)
                    logits = F.interpolate(logits, size=(ho, wo),
                                           mode="bilinear",
                                           align_corners=False)
                p = torch.softmax(logits, dim=1)
                if fl:
                    p = torch.flip(p, dims=(3,))
                acc += p
                n_aug += 1
        pred = (acc / n_aug).argmax(1)[0].numpy()
        valid = seg != 255
        idx = num_classes * seg[valid].astype(np.int64) + pred[valid]
        cm += np.bincount(idx, minlength=num_classes ** 2).reshape(
            num_classes, num_classes)
    return cm


# ---------------------------------------------------------------------------
# the end-to-end assertion
# ---------------------------------------------------------------------------

class OddSizeDS:
    """Odd non-square sizes, incl. one image smaller than the crop in H
    after the keep-ratio resize (the reference's small-patch branch)."""

    def __init__(self):
        rng = np.random.RandomState(3)
        sizes = [(97, 151), (151, 97), (85, 85), (30, 200)]
        self.items = [
            (rng.randint(0, 255, (h, w, 3)).astype(np.uint8),
             rng.randint(0, K, (h, w)).astype(np.int32))
            for h, w in sizes]
        # exercise the 255-ignore path
        self.items[0][1][:5, :7] = 255

    def __len__(self):
        return len(self.items)

    def load(self, i):
        return self.items[i]


def _build_models():
    tm = ViTAdapterT(embed_dim=48, depth=2, num_heads=4, pretrain_size=64,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1)))
    th = UPerHeadT(48, 32, K)
    randomize(tm, 21)
    randomize(th, 22)
    tm.eval()
    th.eval()

    bb_params, bb_stats = convert_vit_adapter_backbone(tm.state_dict())
    sd = {"decode_head." + k: v for k, v in th.state_dict().items()}
    hp, hs = convert_upernet_heads(sd)
    variables = {
        "params": {"backbone": bb_params, "decode_head": hp["decode_head"]},
        "batch_stats": {"backbone": bb_stats,
                        "decode_head": hs["decode_head"]},
    }
    cfg = Config({
        "model": {
            "type": "EncoderDecoder",
            "backbone": {
                "type": "ViTAdapter", "patch_size": 16, "embed_dim": 48,
                "depth": 2, "num_heads": 4, "deform_num_heads": 6,
                "conv_inplane": 16, "pretrain_size": 64,
                "interaction_indexes": [[0, 0], [1, 1]],
            },
            "decode_head": {"type": "UPerHead", "num_classes": K,
                            "channels": 32},
        },
        "data": {"scale": list(IMG_SCALE)},
        "test_cfg": {"mode": "slide", "crop_size": list(CROP),
                     "stride": list(STRIDE)},
        "aug_test": {"img_ratios": [0.75, 1.0], "flip": True},
    })
    return tm, th, variables, cfg


@pytest.mark.parametrize("aug", [False, True])
def test_protocol_parity_torch_composite(aug):
    tm, th, variables, cfg = _build_models()
    ds = OddSizeDS()

    cm_ref = torch_protocol_eval(
        tm, th, ds, IMG_SCALE,
        ratios=(0.75, 1.0) if aug else (1.0,), flip=aug,
        crop=CROP, stride=STRIDE, num_classes=K)

    lines = []
    seen_cm = {}
    orig = loop_mod.miou_from_confusion

    def spy(cm):
        seen_cm["cm"] = cm.copy()
        return orig(cm)

    loop_mod.miou_from_confusion = spy
    try:
        metrics = loop_mod.run_eval(cfg, variables, ds, aug_test=aug,
                                    log_fn=lines.append)
    finally:
        loop_mod.miou_from_confusion = orig

    ref_metrics = miou_from_confusion(cm_ref)
    np.testing.assert_array_equal(
        seen_cm["cm"], cm_ref,
        err_msg=f"jax mIoU {metrics['mIoU']:.6f} vs "
                f"torch {ref_metrics['mIoU']:.6f}")


# ---------------------------------------------------------------------------
# Mask2Former full chain: the flagship family's published-number path
# (VERDICT r4 missing #1) — torch M2F head -> semantic fuse
# (`mask2former_head.py:557-579` einsum('bqc,bqhw->bchw') of softmax[...,:-1]
# with sigmoid masks) -> encode_decode resize -> slide/TTA protocol
# (`encoder_decoder_mask2former.py:156-285`) vs the jax `run_eval` on the
# same odd-sized images, asserting identical confusion matrices.
# ---------------------------------------------------------------------------

class _M2FSemanticT(torch.nn.Module):
    """Torch composite of `forward_test`'s semantic fuse: per-class maps at
    mask-feature resolution; `_torch_encode_decode` then resizes to the crop
    (reference `encoder_decoder_mask2former.py:70-80` encode_decode)."""

    def __init__(self, head):
        super().__init__()
        self.head = head

    def forward(self, feats):
        cls_list, mask_list = self.head(feats)
        prob = torch.softmax(cls_list[-1], dim=-1)[..., :-1]
        mask = mask_list[-1].sigmoid()
        return torch.einsum("bqc,bqhw->bchw", prob, mask)


def _build_m2f_models():
    from vitadapter.utils.checkpoint import convert_mask2former_head

    from torch_ref import Mask2FormerHeadT

    C, Q, heads = 64, 5, 4
    tm = ViTAdapterT(embed_dim=48, depth=2, num_heads=4, pretrain_size=64,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1)))
    th = Mask2FormerHeadT([48, 48, 48, 48], C, num_classes=K, num_queries=Q,
                          heads=heads, dec_ffn=96, enc_ffn=96,
                          enc_heads=heads)
    randomize(tm, 31)
    randomize(th, 32)
    tm.eval()
    th.eval()

    bb_params, bb_stats = convert_vit_adapter_backbone(tm.state_dict())
    sd = {"decode_head." + k: v for k, v in th.state_dict().items()}
    head_params, _ = convert_mask2former_head(sd)
    variables = {
        "params": {"backbone": bb_params, "decode_head": head_params},
        "batch_stats": {"backbone": bb_stats},
    }
    cfg = Config({
        "model": {
            "type": "EncoderDecoderMask2Former",
            "backbone": {
                "type": "ViTAdapter", "patch_size": 16, "embed_dim": 48,
                "depth": 2, "num_heads": 4, "deform_num_heads": 6,
                "conv_inplane": 16, "pretrain_size": 64,
                "interaction_indexes": [[0, 0], [1, 1]],
            },
            "decode_head": {
                "type": "Mask2FormerHead", "num_classes": K,
                "num_queries": Q, "feat_channels": C, "out_channels": C,
                "num_heads": heads, "decoder_ffn_dim": 96,
                "pixel_encoder_ffn_dim": 96, "pixel_encoder_heads": heads,
            },
        },
        "data": {"scale": list(IMG_SCALE)},
        "test_cfg": {"mode": "slide", "crop_size": list(CROP),
                     "stride": list(STRIDE)},
        "aug_test": {"img_ratios": [0.75, 1.0], "flip": True},
    })
    return tm, _M2FSemanticT(th), variables, cfg


@pytest.mark.parametrize("aug", [False, True])
def test_mask2former_protocol_parity_torch_composite(aug):
    tm, th, variables, cfg = _build_m2f_models()
    ds = OddSizeDS()

    cm_ref = torch_protocol_eval(
        tm, th, ds, IMG_SCALE,
        ratios=(0.75, 1.0) if aug else (1.0,), flip=aug,
        crop=CROP, stride=STRIDE, num_classes=K)

    seen_cm = {}
    orig = loop_mod.miou_from_confusion

    def spy(cm):
        seen_cm["cm"] = cm.copy()
        return orig(cm)

    loop_mod.miou_from_confusion = spy
    try:
        metrics = loop_mod.run_eval(cfg, variables, ds, aug_test=aug,
                                    log_fn=lambda *_: None)
    finally:
        loop_mod.miou_from_confusion = orig

    ref_metrics = miou_from_confusion(cm_ref)
    np.testing.assert_array_equal(
        seen_cm["cm"], cm_ref,
        err_msg=f"jax mIoU {metrics['mIoU']:.6f} vs "
                f"torch {ref_metrics['mIoU']:.6f}")
