"""One-chain end-to-end torch parity (VERDICT r3 next #2).

Composes the per-module torch oracles into single tests per flagship det
family, asserting FINAL PREDICTIONS (decoded box set / mask crops / the
grounding TTA vote box), not just activations — this catches glue bugs
(normalization constants, flatten orders, score thresholds, resize order)
that module-level parity tests cannot.

Reference contracts:
  * Mask R-CNN test path — mmdet `TwoStageDetector.simple_test`:
    RPN `get_bboxes` (per-level top-k -> delta decode -> NMS 0.7/1000),
    `StandardRoIHead.simple_test` (RoIAlign -> Shared2FC head ->
    `multiclass_nms` 0.05/0.5/100 -> FCNMaskHead on kept boxes).
  * GroundingDINO TTA — reference
    `wsdm2023/mmdet_custom/models/detectors/grounding_dino.py:229-263`
    (per-scale top-100 boxes, score += mean IoU, argmax single box) through
    the full `run_grounding_eval` protocol (keep-ratio resize, canvas pad,
    refer flip, unflip/unscale).

The torch/numpy oracle here REIMPLEMENTS every decode stage (anchors,
delta2bbox, greedy NMS, RoIAlign sampling, multiclass NMS, the DINO decode
and the vote) independently of the jax code under test; only pure host-side
data plumbing (PIL resize, tokenizer stub) is shared.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_torch_parity import randomize

# ---------------------------------------------------------------------------
# numpy oracle primitives (mmdet semantics, independent reimplementation)
# ---------------------------------------------------------------------------


def anchors_np(feat_hw, stride, scales=(8,), ratios=(0.5, 1.0, 2.0)):
    """mmdet AnchorGenerator: ratio-major/scale-fastest base anchors centered
    at grid*stride (center_offset 0)."""
    base = []
    for r in ratios:
        hr = math.sqrt(r)
        wr = 1.0 / hr
        for s in scales:
            ws, hs = stride * s * wr, stride * s * hr
            base.append([-ws / 2, -hs / 2, ws / 2, hs / 2])
    base = np.asarray(base, np.float32)
    H, W = feat_hw
    xs = np.arange(W, dtype=np.float32)[None, :, None] * stride
    ys = np.arange(H, dtype=np.float32)[:, None, None] * stride
    shift = np.stack(np.broadcast_arrays(xs, ys, xs, ys), -1)
    return (shift[:, :, :, None, :] + base[None, None, None]).reshape(-1, 4)


def delta2bbox_np(rois, deltas, stds, max_hw=None, wh_ratio_clip=16 / 1000):
    s = np.asarray(stds, np.float32)
    dx, dy = deltas[..., 0] * s[0], deltas[..., 1] * s[1]
    mr = abs(math.log(wh_ratio_clip))
    dw = np.clip(deltas[..., 2] * s[2], -mr, mr)
    dh = np.clip(deltas[..., 3] * s[3], -mr, mr)
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    gw, gh = pw * np.exp(dw), ph * np.exp(dh)
    gx, gy = px + pw * dx, py + ph * dy
    out = np.stack([gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], -1)
    if max_hw is not None:
        h, w = max_hw
        out[..., 0::2] = np.clip(out[..., 0::2], 0, w)
        out[..., 1::2] = np.clip(out[..., 1::2], 0, h)
    return out


def iou_np(a, b):
    w = np.maximum(np.minimum(a[:, None, 2], b[None, :, 2])
                   - np.maximum(a[:, None, 0], b[None, :, 0]), 0)
    h = np.maximum(np.minimum(a[:, None, 3], b[None, :, 3])
                   - np.maximum(a[:, None, 1], b[None, :, 1]), 0)
    inter = w * h
    area = lambda x: np.maximum(x[:, 2] - x[:, 0], 0) * np.maximum(
        x[:, 3] - x[:, 1], 0)
    union = area(a)[:, None] + area(b)[None] - inter
    return inter / np.maximum(union, 1e-6)


def nms_np(boxes, scores, iou_thr):
    """Greedy NMS; returns kept indices in descending-score order."""
    order = np.argsort(-scores, kind="stable")
    keep, supp = [], np.zeros(len(boxes), bool)
    iou = iou_np(boxes, boxes)
    for i in order:
        if supp[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        supp |= iou[i] > iou_thr
        supp[i] = True  # self, already kept
    return np.asarray(keep, np.int64)


def roi_align_np(feat_hwc, rois, out_size, spatial_scale, S=2):
    """Mirror of the framework's RoIAlign contract (aligned=True, fixed
    S x S samples per bin) — independent gather implementation."""
    H, W, C = feat_hwc.shape
    R = len(rois)
    boxes = rois * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = np.maximum(x2 - x1, 1e-6)
    bh = np.maximum(y2 - y1, 1e-6)
    idx = np.arange(out_size * S, dtype=np.float32) + 0.5
    xs = x1[:, None] + idx * (bw[:, None] / (out_size * S)) - 0.5
    ys = y1[:, None] + idx * (bh[:, None] / (out_size * S)) - 0.5
    out = np.zeros((R, out_size * S, out_size * S, C), np.float32)
    x0 = np.floor(xs)
    y0 = np.floor(ys)
    lx, ly = xs - x0, ys - y0
    for dy, wy in ((0, 1 - ly), (1, ly)):
        for dx, wx in ((0, 1 - lx), (1, lx)):
            xi = (x0 + dx).astype(np.int64)
            yi = (y0 + dy).astype(np.int64)
            vx = (xi >= 0) & (xi < W)
            vy = (yi >= 0) & (yi < H)
            xi, yi = np.clip(xi, 0, W - 1), np.clip(yi, 0, H - 1)
            g = feat_hwc[yi[:, :, None], xi[:, None, :]]
            w = (wy * vy)[:, :, None] * (wx * vx)[:, None, :]
            out += g * w[..., None]
    return out.reshape(R, out_size, S, out_size, S, C).mean(axis=(2, 4))


def multi_level_roi_align_np(feats, rois, out_size, strides, finest=56):
    scale = np.sqrt(np.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0))
    lvl = np.clip(np.floor(np.log2(scale / finest + 1e-6)), 0,
                  len(feats) - 1).astype(np.int64)
    out = None
    for li, (f, s) in enumerate(zip(feats, strides)):
        r = roi_align_np(f, rois, out_size, 1.0 / s)
        if out is None:
            out = np.zeros_like(r)
        out[lvl == li] = r[lvl == li]
    return out


# ---------------------------------------------------------------------------
# Mask R-CNN: torch/numpy oracle end-to-end vs jax simple_test
# ---------------------------------------------------------------------------

RPN_STDS = (1.0, 1.0, 1.0, 1.0)
RCNN_STDS = (0.1, 0.1, 0.2, 0.2)


def _oracle_mask_rcnn(tb, full, img_nchw, K, num_props=1000, max_dets=100):
    """Full mmdet-semantics test path in torch/numpy. Returns per-image
    (boxes, scores, labels, mask_crops)."""
    strides = (4, 8, 16, 32, 64)
    with torch.no_grad():
        feats = tb(img_nchw)                                 # 4 NCHW maps
        neck, rpn, roi = full.neck, full.rpn_head, full.roi_head
        lats = [neck.lateral_convs[i].conv(feats[i]) for i in range(4)]
        for i in (3, 2, 1):  # mmdet FPN: nearest top-down
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode="nearest")
        outs = [neck.fpn_convs[i].conv(lats[i]) for i in range(4)]
        outs.append(F.max_pool2d(outs[-1], 1, 2))
        cls_o, reg_o = [], []
        for f in outs:
            x = torch.relu(rpn.rpn_conv(f))
            cls_o.append(rpn.rpn_cls(x))
            reg_o.append(rpn.rpn_reg(x))

    B = img_nchw.shape[0]
    Him, Wim = img_nchw.shape[-2:]
    feats_np = [f.permute(0, 2, 3, 1).numpy() for f in outs]
    results = []
    results_feats = feats_np
    for b in range(B):
        lvl_boxes, lvl_scores = [], []
        for c, r, stride in zip(cls_o, reg_o, strides):
            hw = c.shape[-2:]
            anc = anchors_np(hw, stride)
            sc = c[b].permute(1, 2, 0).reshape(-1).numpy()
            dl = r[b].permute(1, 2, 0).reshape(-1, 4).numpy()
            k = min(1000, len(sc))
            top = np.argsort(-sc, kind="stable")[:k]
            lvl_boxes.append(delta2bbox_np(anc[top], dl[top], RPN_STDS,
                                           (Him, Wim)))
            lvl_scores.append(sc[top])
        boxes = np.concatenate(lvl_boxes)
        scores = 1 / (1 + np.exp(-np.concatenate(lvl_scores)))
        ok = ((boxes[:, 2] - boxes[:, 0]) > 0) & \
             ((boxes[:, 3] - boxes[:, 1]) > 0)
        keep = nms_np(boxes, np.where(ok, scores, -np.inf), 0.7)[:num_props]
        props = boxes[keep]

        roi_feats = multi_level_roi_align_np(
            [f[b] for f in feats_np[:4]], props, 7, strides[:4])
        with torch.no_grad():
            h = torch.from_numpy(
                roi_feats.transpose(0, 3, 1, 2).copy()).flatten(1)
            for fc in roi.bbox_head.shared_fcs:
                h = torch.relu(fc(h))
            cls_logits = roi.bbox_head.fc_cls(h).numpy()
            deltas = roi.bbox_head.fc_reg(h).numpy().reshape(-1, K, 4)
        probs = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
        probs = (probs / probs.sum(-1, keepdims=True))[:, :K]
        dec = delta2bbox_np(np.repeat(props[:, None], K, 1), deltas,
                            RCNN_STDS, (Him, Wim))
        flat_b = dec.reshape(-1, 4)
        flat_s = probs.reshape(-1)
        flat_l = np.tile(np.arange(K), len(props))
        ok = flat_s > 0.05
        # mirror of the static pre-NMS top-k budget
        pre = min(2048, len(flat_s))
        top = np.argsort(-np.where(ok, flat_s, -np.inf), kind="stable")[:pre]
        top = top[np.where(ok, flat_s, -np.inf)[top] > -np.inf]
        fb, fs, fl = flat_b[top], flat_s[top], flat_l[top]
        # class-offset NMS == per-class NMS; merged order is score order
        off = fl[:, None].astype(np.float32) * (fb.max() + 1.0)
        keep = nms_np(fb + off, fs, 0.5)[:max_dets]
        db, ds, dl_ = fb[keep], fs[keep], fl[keep]

        results.append((db, ds, dl_))
    return results, results_feats


def _oracle_mask_branch(roi, feats_b, boxes, labels, strides=(4, 8, 16, 32)):
    """FCN mask branch on given boxes (isolates the mask-branch glue from
    box-decode fp noise: evaluated on the jax-decoded boxes)."""
    mask_feats = multi_level_roi_align_np(feats_b, boxes, 14, strides)
    with torch.no_grad():
        y = torch.from_numpy(mask_feats.transpose(0, 3, 1, 2).copy())
        for cm in roi.mask_head.convs:
            y = torch.relu(cm.conv(y))
        y = torch.relu(roi.mask_head.upsample(y))
        logits = roi.mask_head.conv_logits(y).numpy()  # (D, K, 28, 28)
    sel = logits[np.arange(len(boxes)), labels]
    return np.where(sel >= 0, 1 / (1 + np.exp(-np.abs(sel))),
                    np.exp(-np.abs(sel)) / (1 + np.exp(-np.abs(sel))))


def test_mask_rcnn_e2e_decoded_boxes_and_masks():
    """Random torch state_dict -> converter -> jax MaskRCNN.simple_test vs
    the torch/numpy oracle running the full mmdet test path: identical
    decoded box set, scores, labels, and 28^2 mask crops."""
    from test_torch_parity import (_mmdet_bbox_head, _mmdet_mask_head,
                                   _ConvM)
    from torch_ref import ViTAdapterT
    from vitadapter.det.mask_rcnn import MaskRCNN
    from vitadapter.models.vit_adapter import ViTAdapter
    from vitadapter.utils.checkpoint import convert_detector_checkpoint

    dim, C, K, fc = 48, 64, 7, 1024  # fc: Shared2FCBBoxHead default fc_dim
    tb = ViTAdapterT(embed_dim=dim, depth=4, num_heads=4, pretrain_size=224,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tb, 91)
    tb.eval()

    neck = torch.nn.Module()
    neck.lateral_convs = torch.nn.ModuleList(
        [_ConvM(dim, C, 1) for _ in range(4)])
    neck.fpn_convs = torch.nn.ModuleList(
        [_ConvM(C, C, 3) for _ in range(4)])
    rpn = torch.nn.Module()
    rpn.rpn_conv = torch.nn.Conv2d(C, C, 3, 1, 1)
    rpn.rpn_cls = torch.nn.Conv2d(C, 3, 1)
    rpn.rpn_reg = torch.nn.Conv2d(C, 12, 1)
    roi = torch.nn.Module()
    roi.bbox_head = _mmdet_bbox_head(C, fc, K)
    roi.mask_head = _mmdet_mask_head(C, K)
    full = torch.nn.Module()
    full.neck, full.rpn_head, full.roi_head = neck, rpn, roi
    randomize(full, 92)
    full.eval()

    sd = {"backbone." + k: v for k, v in tb.state_dict().items()}
    sd.update(full.state_dict())
    variables = convert_detector_checkpoint({"state_dict": sd})

    model = MaskRCNN(
        backbone=ViTAdapter(
            patch_size=16, embed_dim=dim, depth=4, num_heads=4,
            deform_num_heads=6, conv_inplane=16, pretrain_size=224,
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3))),
        num_classes=K, fpn_channels=C)

    rng = np.random.RandomState(7)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    out = jax.jit(model.apply)(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, jnp.asarray(img))
    out = {k: np.asarray(v) for k, v in out.items()}

    oracle, feats_np = _oracle_mask_rcnn(
        tb, full, torch.from_numpy(img.transpose(0, 3, 1, 2)), K)

    for b, (ob, osc, ol) in enumerate(oracle):
        valid = np.isfinite(out["scores"][b])
        n = int(valid.sum())
        assert n == len(ob), (b, n, len(ob))
        np.testing.assert_allclose(out["scores"][b][:n], osc,
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_array_equal(out["labels"][b][:n], ol)
        # fp32 accumulation noise is amplified by exp() in the delta
        # decode; 0.2 px on a 64 px canvas still pins the protocol
        np.testing.assert_allclose(out["boxes"][b][:n], ob,
                                   rtol=2e-2, atol=0.2)
        om = _oracle_mask_branch(full.roi_head,
                                 [f[b] for f in feats_np[:4]],
                                 out["boxes"][b][:n], ol)
        np.testing.assert_allclose(out["masks"][b][:n], om,
                                   rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# GroundingDINO: torch oracle through the full run_grounding_eval TTA vote
# ---------------------------------------------------------------------------


class _StubTok:
    """Deterministic word-hash tokenizer (stands in for CLIP BPE; the BPE
    itself has its own parity tests)."""

    def tokenize_refer(self, text, max_len):
        ids = np.zeros(max_len, np.int32)
        mask = np.zeros(max_len, np.int32)
        words = text.lower().split()[: max_len - 2]
        ids[0] = 1
        for i, w in enumerate(words):
            ids[i + 1] = 2 + (hash(w) % 90)
        ids[len(words) + 1] = 2
        mask[: len(words) + 2] = 1
        return ids, mask


class _FakeGroundDS:
    def __init__(self):
        r = np.random.RandomState(3)
        self.items = []
        for i, (h, w) in enumerate([(53, 71), (80, 48), (64, 64)]):
            img = r.randint(0, 256, (h, w, 3), np.uint8)
            q = ["the box left of the tree", "a right thing",
                 "middle object"][i]
            box = np.asarray([w * 0.2, h * 0.3, w * 0.7, h * 0.8],
                             np.float32)
            self.items.append((img, {"question": q, "boxes": [box]}))

    def __len__(self):
        return len(self.items)

    def load(self, i):
        return self.items[i]


def _flip_refer_np(q):
    out = []
    for w in q.split():
        lw = w.lower()
        out.append("right" if lw == "left" else
                   "left" if lw == "right" else w)
    return " ".join(out)


def test_grounding_dino_e2e_tta_vote(monkeypatch):
    """Random torch state_dict -> converter -> full `run_grounding_eval`
    --aug-test protocol (keep-ratio resize, canvas pad, refer flip, unflip/
    unscale, mean-IoU vote) vs the torch composite reimplementing every
    stage: identical final single boxes per image and identical metrics."""
    from torch_ref import ConvGNT, DinoTransformerT, UniPerceiverAdapterT
    from vitadapter.data import transforms as T
    from vitadapter.data.grounding import grounding_metrics
    import vitadapter.data.grounding as grounding_mod
    from vitadapter.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
    from vitadapter.train.det_loop import run_grounding_eval, test_canvas
    from vitadapter.utils.checkpoint import convert_grounding_dino_checkpoint
    from vitadapter.utils.config import Config

    dim, C, Q, K = 48, 64, 12, 1
    tb = UniPerceiverAdapterT(dim=dim, depth=4, heads=4, vocab=100,
                              conv_inplane=16, deform_num_heads=4)
    th = DinoTransformerT(C=C, heads=4, num_enc=2, num_dec=3, ffn_dim=96,
                          num_queries=Q, num_classes=K)
    randomize(tb, 61)
    randomize(th, 62)
    tb.eval()
    th.eval()

    class NeckT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = torch.nn.ModuleList(
                [ConvGNT(dim, C, 1) for _ in range(3)])
            self.extra_convs = torch.nn.ModuleList([ConvGNT(dim, C, 3)])

    tn = NeckT()
    randomize(tn, 63)
    tn.eval()
    sd = {"backbone." + k: v for k, v in tb.state_dict().items()}
    sd.update({"neck." + k: v for k, v in tn.state_dict().items()})
    sd.update({"bbox_head." + k: v for k, v in th.state_dict().items()})
    sd["bbox_head.label_embedding.weight"] = 0.1 * torch.randn(K, C)
    variables = convert_grounding_dino_checkpoint({"state_dict": sd})

    cfg = Config(dict(
        model=dict(
            type="GroundingDINO",
            backbone=dict(
                type="UniPerceiverAdapter", patch_size=16, embed_dim=dim,
                depth=4, num_heads=4, vocab_size=100, conv_inplane=16,
                deform_num_heads=4, out_indices=[1, 2, 3],
                interaction_indexes=[[0, 0], [1, 1], [2, 2], [3, 3]]),
            num_classes=K, num_queries=Q, embed_dim=C, num_heads=4,
            ffn_dim=96, num_encoder_layers=2, num_decoder_layers=3),
        data=dict(max_sent_len=8),
        test_cfg=dict(img_scale=(96, 64)),
        tta=dict(scales=[[96, 64], [128, 96]], flip=True),
    ))
    ds = _FakeGroundDS()
    tok = _StubTok()

    captured = {}

    def capture_metrics(preds, gts):
        captured["preds"] = [np.asarray(p) for p in preds]
        return grounding_metrics(preds, gts)

    monkeypatch.setattr(grounding_mod, "grounding_metrics", capture_metrics)
    metrics = run_grounding_eval(cfg, variables, ds, aug_test=True,
                                 log_fn=lambda *_: None, tokenizer=tok)
    assert "mIoU" in metrics and np.isfinite(metrics["mIoU"])

    # ---- torch composite of the identical protocol ----
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    scales = [(96, 64), (128, 96)]
    for i in range(len(ds)):
        img, t = ds.load(i)
        question = t["question"]
        per_aug = []
        for scale in scales:
            im2, _ = T.resize_keep_ratio(img, None, scale)
            rh, rw = im2.shape[:2]
            land, port = test_canvas(scale)
            ch, cw = land if rw >= rh else port
            for fl in (False, True):
                q = _flip_refer_np(question) if fl else question
                ids, r_mask = tok.tokenize_refer(q, 8)
                x = np.zeros((ch, cw, 3), np.float32)
                x[:rh, :rw] = im2[:, ::-1] if fl else im2
                xn = (x - mean) / std
                with torch.no_grad():
                    feats = tb(torch.from_numpy(
                        xn.transpose(2, 0, 1)[None].copy()),
                        torch.from_numpy(ids[None].astype(np.int64)),
                        torch.from_numpy(r_mask[None].astype(np.int64)))
                    feats = feats[1:]
                    mapped = [tn.convs[j](feats[j]) for j in range(3)]
                    ex = tn.extra_convs[0]
                    y = F.conv2d(feats[-1], ex.conv.weight, stride=2,
                                 padding=1)
                    mapped.append(ex.gn(y))
                    out = th(mapped)
                cls = out["cls"][-1][0].numpy()       # (Q, K)
                box = out["boxes"][-1][0].numpy()     # (Q, 4) cxcywh norm
                scores = 1 / (1 + np.exp(-cls.reshape(-1)))
                order = np.argsort(-scores, kind="stable")[:100]
                q_idx = order // K
                bxy = box[q_idx]
                xy = np.stack([bxy[:, 0] - bxy[:, 2] / 2,
                               bxy[:, 1] - bxy[:, 3] / 2,
                               bxy[:, 0] + bxy[:, 2] / 2,
                               bxy[:, 1] + bxy[:, 3] / 2], -1)
                boxes = xy * np.asarray([cw, ch, cw, ch], np.float32)
                if fl:
                    boxes = np.stack([rw - boxes[:, 2], boxes[:, 1],
                                      rw - boxes[:, 0], boxes[:, 3]], -1)
                sy, sx = img.shape[0] / rh, img.shape[1] / rw
                boxes = boxes * np.asarray([sx, sy, sx, sy], np.float32)
                per_aug.append((boxes, scores[order]))
        allb = np.concatenate([b for b, _ in per_aug])
        alls = np.concatenate([s for _, s in per_aug])
        vote = alls + iou_np(allb, allb).mean(1)
        best = allb[int(np.argmax(vote))]
        np.testing.assert_allclose(captured["preds"][i], best,
                                   rtol=1e-3, atol=5e-3,
                                   err_msg=f"image {i}")


# ---------------------------------------------------------------------------
# Cascade / HTC++: torch/numpy oracle of the 3-stage test-time decode
# (VERDICT r4 missing #3). Reference contract: mmdet CascadeRoIHead
# simple_test as configured by htc++_beit_adapter_large_fpn_3x_coco.py —
# stage-refined rois, stage-AVERAGED softmax scores, class-agnostic final
# decode, multiclass NMS, and the per-stage mask heads with HTC information
# flow averaged at test time
# (`detection/mmdet_custom/models/detectors/htc_aug.py:148-241`).
# ---------------------------------------------------------------------------

CASCADE_STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
                      (1 / 30, 1 / 30, 1 / 15, 1 / 15))


def _oracle_cascade(tb, full, img_nchw, K, num_props, max_dets):
    """mmdet cascade test path in torch/numpy: returns per-image
    (boxes, scores, labels) plus the FPN feature maps for the mask branch."""
    strides = (4, 8, 16, 32, 64)
    with torch.no_grad():
        feats = tb(img_nchw)
        neck, rpn = full.neck, full.rpn_head
        lats = [neck.lateral_convs[i].conv(feats[i]) for i in range(4)]
        for i in (3, 2, 1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode="nearest")
        outs = [neck.fpn_convs[i].conv(lats[i]) for i in range(4)]
        outs.append(F.max_pool2d(outs[-1], 1, 2))
        cls_o, reg_o = [], []
        for f in outs:
            x = torch.relu(rpn.rpn_conv(f))
            cls_o.append(rpn.rpn_cls(x))
            reg_o.append(rpn.rpn_reg(x))

    B = img_nchw.shape[0]
    Him, Wim = img_nchw.shape[-2:]
    feats_np = [f.permute(0, 2, 3, 1).numpy() for f in outs]
    results = []
    for b in range(B):
        lvl_boxes, lvl_scores = [], []
        for c, r, stride in zip(cls_o, reg_o, strides):
            anc = anchors_np(c.shape[-2:], stride)
            sc = c[b].permute(1, 2, 0).reshape(-1).numpy()
            dl = r[b].permute(1, 2, 0).reshape(-1, 4).numpy()
            top = np.argsort(-sc, kind="stable")[:min(1000, len(sc))]
            lvl_boxes.append(delta2bbox_np(anc[top], dl[top], RPN_STDS,
                                           (Him, Wim)))
            lvl_scores.append(sc[top])
        boxes = np.concatenate(lvl_boxes)
        scores = 1 / (1 + np.exp(-np.concatenate(lvl_scores)))
        ok = ((boxes[:, 2] - boxes[:, 0]) > 0) & \
             ((boxes[:, 3] - boxes[:, 1]) > 0)
        keep = nms_np(boxes, np.where(ok, scores, -np.inf), 0.7)[:num_props]
        rois = boxes[keep]

        # --- 3-stage cascade: refine rois, average the per-stage softmax ---
        ms_probs = []
        for s in range(3):
            rf = multi_level_roi_align_np(
                [f[b] for f in feats_np[:4]], rois, 7, strides[:4])
            with torch.no_grad():
                h = torch.from_numpy(
                    rf.transpose(0, 3, 1, 2).copy()).flatten(1)
                for fc in full.roi_head.bbox_head[s].shared_fcs:
                    h = torch.relu(fc(h))
                cls_logits = full.roi_head.bbox_head[s].fc_cls(h).numpy()
                deltas = full.roi_head.bbox_head[s].fc_reg(h).numpy()
            e = np.exp(cls_logits - cls_logits.max(-1, keepdims=True))
            ms_probs.append(e / e.sum(-1, keepdims=True))
            if s < 2:
                rois = delta2bbox_np(rois, deltas, CASCADE_STAGE_STDS[s],
                                     (Him, Wim))
        mean_probs = sum(ms_probs) / 3.0
        final = delta2bbox_np(rois, deltas, CASCADE_STAGE_STDS[2],
                              (Him, Wim))

        flat_s = np.repeat(mean_probs[:, :K], 1, 0).reshape(-1)  # (R*K,)
        flat_b = np.repeat(final, K, axis=0)
        flat_l = np.tile(np.arange(K), len(final))
        ok = flat_s > 0.05
        pre = min(2048, len(flat_s))
        top = np.argsort(-np.where(ok, flat_s, -np.inf), kind="stable")[:pre]
        top = top[np.where(ok, flat_s, -np.inf)[top] > -np.inf]
        fb, fs, fl = flat_b[top], flat_s[top], flat_l[top]
        off = fl[:, None].astype(np.float32) * (fb.max() + 1.0)
        keep = nms_np(fb + off, fs, 0.5)[:max_dets]
        results.append((fb[keep], fs[keep], fl[keep]))
    return results, feats_np


def _oracle_cascade_masks(roi, feats_b, boxes, labels):
    """3 info-flow mask heads averaged (mmdet HTC test): each stage's tower
    input adds conv_res_feat(prev stage's pre-upsample features)."""
    mf = multi_level_roi_align_np(feats_b, boxes, 14, (4, 8, 16, 32))
    x0 = torch.from_numpy(mf.transpose(0, 3, 1, 2).copy())
    acc = None
    prev = None
    with torch.no_grad():
        for s in range(3):
            head = roi.mask_head[s]
            x = x0
            if prev is not None:
                x = x + head.conv_res_feat.conv(prev)
            for cm in head.convs:
                x = torch.relu(cm.conv(x))
            prev = x
            y = torch.relu(head.upsample(x))
            logits = head.conv_logits(y)
            acc = logits if acc is None else acc + logits
    sel = (acc / 3.0).numpy()[np.arange(len(boxes)), labels]
    return np.where(sel >= 0, 1 / (1 + np.exp(-np.abs(sel))),
                    np.exp(-np.abs(sel)) / (1 + np.exp(-np.abs(sel))))


def test_cascade_htc_e2e_decoded_boxes_and_masks():
    """Random torch state_dict -> converter -> jax CascadeRCNN.simple_test
    vs the torch/numpy cascade oracle: identical decoded box set, stage-
    averaged scores, labels, and stage-averaged info-flow mask crops."""
    from test_torch_parity import (_mmdet_bbox_head, _mmdet_mask_head,
                                   _ConvM, randomize)
    from torch_ref import ViTAdapterT
    from vitadapter.det.cascade import CascadeRCNN
    from vitadapter.models.vit_adapter import ViTAdapter
    from vitadapter.utils.checkpoint import convert_detector_checkpoint

    dim, C, K, fc = 48, 64, 7, 1024
    tb = ViTAdapterT(embed_dim=dim, depth=4, num_heads=4, pretrain_size=224,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tb, 95)
    tb.eval()

    neck = torch.nn.Module()
    neck.lateral_convs = torch.nn.ModuleList(
        [_ConvM(dim, C, 1) for _ in range(4)])
    neck.fpn_convs = torch.nn.ModuleList(
        [_ConvM(C, C, 3) for _ in range(4)])
    rpn = torch.nn.Module()
    rpn.rpn_conv = torch.nn.Conv2d(C, C, 3, 1, 1)
    rpn.rpn_cls = torch.nn.Conv2d(C, 3, 1)
    rpn.rpn_reg = torch.nn.Conv2d(C, 12, 1)
    roi = torch.nn.Module()
    roi.bbox_head = torch.nn.ModuleList(
        [_mmdet_bbox_head(C, fc, K, agnostic=True) for _ in range(3)])
    roi.mask_head = torch.nn.ModuleList(
        [_mmdet_mask_head(C, K, info_flow=True) for _ in range(3)])
    full = torch.nn.Module()
    full.neck, full.rpn_head, full.roi_head = neck, rpn, roi
    randomize(full, 96)
    full.eval()

    sd = {"backbone." + k: v for k, v in tb.state_dict().items()}
    sd.update(full.state_dict())
    variables = convert_detector_checkpoint({"state_dict": sd})

    model = CascadeRCNN(
        backbone=ViTAdapter(
            patch_size=16, embed_dim=dim, depth=4, num_heads=4,
            deform_num_heads=6, conv_inplane=16, pretrain_size=224,
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3))),
        num_classes=K, fpn_channels=C, num_proposals=64, max_dets=10)

    rng = np.random.RandomState(11)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    out = jax.jit(model.apply)(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, jnp.asarray(img))
    out = {k: np.asarray(v) for k, v in out.items()}

    oracle, feats_np = _oracle_cascade(
        tb, full, torch.from_numpy(img.transpose(0, 3, 1, 2)), K,
        num_props=64, max_dets=10)

    for b, (ob, osc, ol) in enumerate(oracle):
        valid = np.isfinite(out["scores"][b])
        n = int(valid.sum())
        assert n == len(ob), (b, n, len(ob))
        np.testing.assert_allclose(out["scores"][b][:n], osc,
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_array_equal(out["labels"][b][:n], ol)
        np.testing.assert_allclose(out["boxes"][b][:n], ob,
                                   rtol=2e-2, atol=0.25)
        om = _oracle_cascade_masks(full.roi_head,
                                   [f[b] for f in feats_np[:4]],
                                   out["boxes"][b][:n], ol)
        np.testing.assert_allclose(out["masks"][b][:n], om,
                                   rtol=1e-3, atol=2e-3)
