"""Full-model numerical parity vs a pure-torch mini-reference.

The strongest offline quality evidence available (no released weights, no
mmcv/timm in the image): build the backbone in plain torch
(tests/torch_ref.py), draw a random state_dict, convert it with
`vitadapter.utils.checkpoint`, and assert fp32 activation parity of the full
4-scale pyramid. Any drift in a module's math or in the converter becomes a
hard test failure instead of an invisible mIoU loss.

Covers reference contracts:
  * `ViTAdapter.forward` (detection/mmdet_custom/models/backbones/
    vit_adapter.py:90-132) incl. windowed attention + ResBottleneckBlock
  * `BEiTAdapter.forward` (segmentation/.../beit_adapter.py:20-137) incl.
    cls-token threading and per-interaction add_vit_feature
  * MSDA == grid_sample oracle (ops/functions/ms_deform_attn_func.py:49-71)
  * rel-pos geometric resampling (detection/mmcv_custom/checkpoint.py:396-445)
"""

import jax
import numpy as np
import pytest
import torch

from vitadapter.models.beit_adapter import BEiTAdapter
from vitadapter.models.vit_adapter import ViTAdapter
from vitadapter.utils.checkpoint import (
    convert_beit_backbone,
    convert_vit_adapter_backbone,
    resample_rel_pos_table,
)

from torch_ref import BEiTAdapterT, ViTAdapterT

torch.manual_seed(0)


def randomize(model: torch.nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    for name, p in model.named_parameters():
        if p.ndim == 1 and (".weight" in name or "gamma" in name):
            # norm scales / layer-scale gammas: near 1 keeps signals healthy
            p.data = 1.0 + 0.1 * torch.randn(p.shape, generator=g)
        else:
            p.data = 0.1 * torch.randn(p.shape, generator=g)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data = 0.3 * torch.randn(m.running_mean.shape,
                                                    generator=g)
            m.running_var.data = 0.5 + torch.rand(m.running_var.shape,
                                                  generator=g)


def tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def assert_full_coverage(converted, initialized):
    """Converted tree must cover the flax init tree exactly (keys + shapes)."""
    got = tree_paths(converted)
    want = tree_paths(initialized)
    assert set(got) == set(want), (
        f"missing: {sorted(set(want) - set(got))[:5]} "
        f"extra: {sorted(set(got) - set(want))[:5]}")
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def check_pyramid(feats_jax, feats_torch, rtol=2e-4, atol=2e-4):
    for lvl, (fj, ft) in enumerate(zip(feats_jax, feats_torch)):
        ft = ft.detach().numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(fj), ft, rtol=rtol, atol=atol,
                                   err_msg=f"pyramid level {lvl}")


def run_vit_adapter(torch_model, flax_model, x_np):
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    params, stats = convert_vit_adapter_backbone(torch_model.state_dict())
    init = jax.jit(flax_model.init)(jax.random.PRNGKey(0), x_np[:1])
    assert_full_coverage(params, init["params"])
    assert_full_coverage(stats, init["batch_stats"])
    feats = jax.jit(flax_model.apply)(
        {"params": params, "batch_stats": stats}, x_np)
    return feats, ref


def test_vit_adapter_full_model_parity():
    """Global attention + layer scale, pos embed resampled 14 -> 4."""
    tm = ViTAdapterT(embed_dim=48, depth=4, num_heads=4, pretrain_size=224,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tm, 1)
    fm = ViTAdapter(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                    deform_num_heads=6, conv_inplane=16, pretrain_size=224,
                    interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    x = np.random.RandomState(11).randn(2, 64, 64, 3).astype(np.float32)
    feats, ref = run_vit_adapter(tm, fm, x)
    check_pyramid(feats, ref)


def test_vit_adapter_windowed_residual_parity():
    """Windowed attention (unfold/fold oracle vs reshape partitioning, with
    padding: ws=3 over a 4x4 grid) + ViTDet ResBottleneckBlock."""
    wa = (True, False, True, False)
    ws = (3, 14, 3, 14)
    tm = ViTAdapterT(embed_dim=48, depth=4, num_heads=4, pretrain_size=64,
                     conv_inplane=16, deform_num_heads=6, window_attn=wa,
                     window_size=ws, residual_indices=(1,),
                     interaction_indexes=((0, 1), (2, 3)))
    randomize(tm, 2)
    fm = ViTAdapter(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                    deform_num_heads=6, conv_inplane=16, pretrain_size=64,
                    window_attn=wa, window_size=ws, residual_indices=(1,),
                    interaction_indexes=((0, 1), (2, 3)))
    x = np.random.RandomState(12).randn(1, 64, 64, 3).astype(np.float32)
    feats, ref = run_vit_adapter(tm, fm, x)
    check_pyramid(feats, ref)


def _beit_pair(img_size, seed, init_values=0.1):
    tm = BEiTAdapterT(img_size=img_size, embed_dim=48, depth=4, num_heads=4,
                      init_values=init_values, conv_inplane=16,
                      deform_num_heads=6, deform_ratio=0.5,
                      interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tm, seed)
    fm = BEiTAdapter(img_size=img_size, patch_size=16, embed_dim=48, depth=4,
                     num_heads=4, init_values=init_values, conv_inplane=16,
                     deform_num_heads=6, deform_ratio=0.5,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    return tm, fm


def test_beit_adapter_full_model_parity():
    """BEiT trunk (q/v bias, rel-pos tables, cls token rides the blocks) +
    adapter, per-interaction add_vit_feature (seg variant)."""
    tm, fm = _beit_pair(64, 3)
    tm.eval()
    x = np.random.RandomState(13).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    params, stats = convert_beit_backbone(tm.state_dict())
    init = jax.jit(fm.init)(jax.random.PRNGKey(0), x[:1])
    assert_full_coverage(params, init["params"])
    assert_full_coverage(stats, init["batch_stats"])
    feats = jax.jit(fm.apply)({"params": params, "batch_stats": stats}, x)
    check_pyramid(feats, ref)


def _resample_table_independent(table: np.ndarray, src_g: int,
                                dst_g: int) -> np.ndarray:
    """Independent implementation of the geometric rel-pos resampling
    (reference checkpoint.py:396-445): brentq for the progression ratio, and
    a two-pass not-a-knot CubicSpline instead of RectBivariateSpline."""
    from scipy.interpolate import CubicSpline
    from scipy.optimize import brentq

    src = 2 * src_g - 1
    dst = 2 * dst_g - 1
    body, extra = table[: src * src], table[src * src:]
    n = src // 2
    target = dst // 2.0
    q = brentq(lambda r: sum(r ** i for i in range(1, n + 1)) - target,
               1.0000001, 10.0)
    dis = np.cumsum([q ** i for i in range(1, n + 1)])
    x = np.concatenate([-dis[::-1], [0.0], dis])
    dx = np.arange(-(dst // 2), dst // 2 + 0.1, 1.0)
    heads = table.shape[1]
    out = np.zeros((dst * dst, heads), np.float32)
    for h in range(heads):
        z = body[:, h].reshape(src, src).astype(np.float64)
        rows = CubicSpline(x, z, axis=0)(dx)          # (dst, src)
        out[:, h] = CubicSpline(x, rows, axis=1)(dx).reshape(-1)
    return np.concatenate([out, extra], axis=0)


def test_beit_rel_pos_resample_parity():
    """Tables pretrained at grid 4, model at grid 6: converter resampling vs
    an independent spline implementation, end to end through the model."""
    tm, fm = _beit_pair(96, 4)
    # give the source model grid-4 tables (as a 64px-pretrained ckpt would)
    src_idx = None
    sd = {}
    for k, v in tm.state_dict().items():
        if k.endswith("relative_position_bias_table"):
            g = torch.Generator().manual_seed(hash(k) % (2 ** 31))
            sd[k] = 0.1 * torch.randn((2 * 4 - 1) ** 2 + 3, v.shape[1],
                                      generator=g)
        else:
            sd[k] = v
    params, stats = convert_beit_backbone(sd, target_grid=6)

    # torch model at grid 6 with independently-resampled tables
    for i, blk in enumerate(tm.blocks):
        table = sd[f"blocks.{i}.attn.relative_position_bias_table"].numpy()
        res = _resample_table_independent(table, 4, 6)
        conv = params["beit"][f"blocks_{i}"]["attn"][
            "relative_position_bias_table"]
        np.testing.assert_allclose(conv, res, rtol=1e-5, atol=1e-6)
        blk.attn.relative_position_bias_table.data = torch.from_numpy(res)
    tm.eval()
    x = np.random.RandomState(14).randn(1, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats = jax.jit(fm.apply)({"params": params, "batch_stats": stats}, x)
    check_pyramid(feats, ref)


def test_resample_rel_pos_table_identity():
    t = np.random.RandomState(0).randn((2 * 5 - 1) ** 2 + 3, 4).astype(
        np.float32)
    np.testing.assert_array_equal(resample_rel_pos_table(t, 5, 5), t)


def test_mask2former_head_full_parity():
    """Full Mask2Former head (pixel decoder + masked-attention decoder):
    pure-torch mini-reference (mmseg key scheme), random weights through
    `convert_mask2former_head`, all 10 per-layer cls/mask outputs match.

    Covers `mask2former_head.py:404-525` (level-cycled memories, per-layer
    forward_head, all-masked reset) and `msdeformattn_pixel_decoder.py:
    16-267` (input ConvGN + 6-layer deformable encoder + FPN tail)."""
    from vitadapter.heads.mask2former import Mask2FormerHead
    from vitadapter.utils.checkpoint import convert_mask2former_head

    from torch_ref import Mask2FormerHeadT

    C, Q, K, heads = 64, 5, 7, 4
    tm = Mask2FormerHeadT([48, 48, 48, 48], C, num_classes=K,
                          num_queries=Q, heads=heads, dec_ffn=96,
                          enc_ffn=96, enc_heads=heads)
    randomize(tm, 23)
    tm.eval()
    rng = np.random.RandomState(3)
    feats_np = [rng.randn(2, r, r, 48).astype(np.float32)
                for r in (16, 8, 4, 2)]
    with torch.no_grad():
        cls_t, mask_t = tm([torch.from_numpy(f.transpose(0, 3, 1, 2))
                            for f in feats_np])

    sd = {"decode_head." + k: v for k, v in tm.state_dict().items()}
    params, _ = convert_mask2former_head(sd)
    fm = Mask2FormerHead(num_classes=K, num_queries=Q, feat_channels=C,
                         out_channels=C, num_heads=heads,
                         decoder_ffn_dim=96, pixel_encoder_ffn_dim=96,
                         pixel_encoder_heads=heads)
    feats = [np.asarray(f) for f in feats_np]
    init = jax.jit(fm.init)(jax.random.PRNGKey(0), feats)
    assert_full_coverage(params, init["params"])
    cls_j, mask_j = jax.jit(fm.apply)({"params": params}, feats)

    assert len(cls_j) == len(cls_t) == 10
    for i in range(len(cls_j)):
        np.testing.assert_allclose(
            np.asarray(cls_j[i]), cls_t[i].numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"cls layer {i}")
        np.testing.assert_allclose(
            np.asarray(mask_j[i]), mask_t[i].numpy(), rtol=2e-4, atol=3e-4,
            err_msg=f"mask layer {i}")
    # guard against a knife-edge attention-mask threshold for this seed:
    # the nearest thresholded logit to 0 must clear fp32 cross-impl noise
    margins = []
    for i, m in enumerate(mask_t[:-1]):
        # memories are strides 32/16/8 of the 64px image -> (2,2),(4,4),(8,8)
        size = [(2, 2), (4, 4), (8, 8)][i % 3]
        am = torch.nn.functional.interpolate(
            m, size=size, mode="bilinear", align_corners=False)
        margins.append(float(am.abs().min()))
    assert min(margins) > 1e-5, margins


def test_uniperceiver_adapter_full_parity():
    """Full UniPerceiver-Adapter (joint img/text trunk incl. one windowed
    layer, text threading through every interaction span, grounding
    cross-attention stack): torch mini-reference -> converter -> flax, full
    4-scale pyramid parity.

    Note: the reference's windowed layer replicates text window-major while
    `window_partition` is batch-major — mismatched pairing for B>1 (a
    reference quirk with no effect at B=1); both implementations here pair
    each window with its own image's text."""
    from vitadapter.models.uniperceiver_adapter import UniPerceiverAdapter
    from vitadapter.utils.checkpoint import convert_uniperceiver_backbone

    from torch_ref import UniPerceiverAdapterT

    tm = UniPerceiverAdapterT(
        dim=48, depth=4, heads=4, vocab=100, conv_inplane=16,
        deform_num_heads=4, num_cross_attn=2,
        window_attn=[False, True, False, False], window_size=2)
    randomize(tm, 31)
    # zero-init gammas make the trunk a no-op; give them signal
    g = torch.Generator().manual_seed(99)
    for name, p in tm.named_parameters():
        if "gamma_" in name:
            p.data = 0.5 + 0.1 * torch.randn(p.shape, generator=g)
    tm.eval()

    rng = np.random.RandomState(7)
    x_np = rng.randn(2, 64, 64, 3).astype(np.float32)
    ids_np = rng.randint(0, 100, (2, 6)).astype(np.int32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
                 torch.from_numpy(ids_np).long())

    params, stats = convert_uniperceiver_backbone(tm.state_dict())
    fm = UniPerceiverAdapter(
        patch_size=16, embed_dim=48, depth=4, num_heads=4, vocab_size=100,
        conv_inplane=16, deform_num_heads=4, num_grounding_blocks=2,
        window_attn=(False, True, False, False), window_size=2,
        interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    init = jax.jit(lambda k, x, i: fm.init(k, x, i))(
        jax.random.PRNGKey(0), x_np[:1], ids_np[:1])
    assert_full_coverage(params, init["params"])
    assert_full_coverage(stats, init["batch_stats"])
    feats = jax.jit(fm.apply)(
        {"params": params, "batch_stats": stats}, x_np, ids_np)
    check_pyramid(feats, ref)


def test_dino_transformer_full_parity():
    """DINO two-stage deformable transformer: encoder, proposal generation
    with the (0.01, 0.99) validity masking, top-k query init, and the
    look-forward-twice decoder (normed prediction branches, y-first sine
    query pos): torch mini-reference -> convert_dino_head -> flax, all
    per-layer cls/box outputs and encoder outputs match."""
    from vitadapter.det.dino import DinoTransformer
    from vitadapter.utils.checkpoint import convert_dino_head

    from torch_ref import DinoTransformerT

    C, K, Q = 48, 5, 12
    tm = DinoTransformerT(C=C, heads=4, num_enc=2, num_dec=3, ffn_dim=96,
                          num_queries=Q, num_classes=K)
    randomize(tm, 41)
    tm.eval()
    rng = np.random.RandomState(17)
    feats_np = [rng.randn(2, r, r, C).astype(np.float32)
                for r in (8, 4, 2, 1)]
    with torch.no_grad():
        ref = tm([torch.from_numpy(f.transpose(0, 3, 1, 2))
                  for f in feats_np])

    sd = {"bbox_head." + k: v for k, v in tm.state_dict().items()}
    params = convert_dino_head(sd)
    fm = DinoTransformer(embed_dim=C, num_heads=4, num_encoder_layers=2,
                         num_decoder_layers=3, ffn_dim=96, num_queries=Q,
                         num_classes=K)
    feats = [np.asarray(f) for f in feats_np]
    init = jax.jit(fm.init)(jax.random.PRNGKey(0),
                            [f[:1] for f in feats])
    assert_full_coverage(params, init["params"])
    out = jax.jit(fm.apply)({"params": params}, feats)

    np.testing.assert_allclose(np.asarray(out["enc_cls"]),
                               ref["enc_cls"].numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["enc_boxes"]),
                               ref["enc_boxes"].numpy(), rtol=2e-4,
                               atol=2e-4)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out["cls"][i]), ref["cls"][i].numpy(),
            rtol=2e-4, atol=3e-4, err_msg=f"cls layer {i}")
        np.testing.assert_allclose(
            np.asarray(out["boxes"][i]), ref["boxes"][i].numpy(),
            rtol=2e-4, atol=3e-4, err_msg=f"boxes layer {i}")


def test_upernet_fcn_heads_full_parity():
    """UperNet decode head (PSP pyramid with torch AdaptiveAvgPool2d
    semantics, FPN top-down fusion) + FCN auxiliary head: torch
    mini-reference -> convert_upernet_heads -> flax logits parity."""
    from vitadapter.heads.upernet import FCNHead, UPerHead
    from vitadapter.utils.checkpoint import convert_upernet_heads

    from torch_ref import FCNHeadT, UPerHeadT

    Cin, ch, K = 48, 32, 7
    tu = UPerHeadT(Cin, ch, K)
    tf = FCNHeadT(Cin, 24, K)
    randomize(tu, 51)
    randomize(tf, 52)
    tu.eval()
    tf.eval()
    rng = np.random.RandomState(19)
    feats_np = [rng.randn(2, r, r, Cin).astype(np.float32)
                for r in (16, 8, 4, 2)]
    feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np]
    with torch.no_grad():
        ref_main = tu(feats_t)
        ref_aux = tf(feats_t[2])

    sd = {"decode_head." + k: v for k, v in tu.state_dict().items()}
    sd.update({"auxiliary_head." + k: v for k, v in tf.state_dict().items()})
    params, stats = convert_upernet_heads(sd)

    fu = UPerHead(num_classes=K, channels=ch)
    ff = FCNHead(num_classes=K, channels=24)
    feats = [np.asarray(f) for f in feats_np]
    init_u = jax.jit(fu.init)(jax.random.PRNGKey(0), feats)
    assert_full_coverage(params["decode_head"], init_u["params"])
    assert_full_coverage(stats["decode_head"], init_u["batch_stats"])
    out_main = jax.jit(fu.apply)(
        {"params": params["decode_head"],
         "batch_stats": stats["decode_head"]}, feats)
    init_f = jax.jit(ff.init)(jax.random.PRNGKey(0), feats[2])
    assert_full_coverage(params["auxiliary_head"], init_f["params"])
    out_aux = jax.jit(ff.apply)(
        {"params": params["auxiliary_head"],
         "batch_stats": stats["auxiliary_head"]}, feats[2])

    np.testing.assert_allclose(
        np.asarray(out_main), ref_main.numpy().transpose(0, 2, 3, 1),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_aux), ref_aux.numpy().transpose(0, 2, 3, 1),
        rtol=2e-4, atol=2e-4)


def test_maskformer_head_full_parity():
    """MaskFormer head (TransformerEncoder pixel decoder with nearest-mode
    FPN, self-attention-first DETR decoder): torch mini-reference ->
    convert_maskformer_head -> flax, all per-layer cls/mask outputs match."""
    from vitadapter.heads.maskformer import MaskFormerHead
    from vitadapter.utils.checkpoint import convert_maskformer_head

    from torch_ref import MaskFormerHeadT

    C, Q, K = 64, 5, 7
    tm = MaskFormerHeadT([C, C, C, C], C, num_classes=K, num_queries=Q,
                         num_dec=3, heads=4, dec_ffn=96, enc_layers=2,
                         enc_ffn=96)
    randomize(tm, 61)
    tm.eval()
    rng = np.random.RandomState(23)
    feats_np = [rng.randn(2, r, r, C).astype(np.float32)
                for r in (16, 8, 4, 2)]
    with torch.no_grad():
        cls_t, mask_t = tm([torch.from_numpy(f.transpose(0, 3, 1, 2))
                            for f in feats_np])

    sd = {"decode_head." + k: v for k, v in tm.state_dict().items()}
    params = convert_maskformer_head(sd)
    fm = MaskFormerHead(num_classes=K, num_queries=Q, feat_channels=C,
                        out_channels=C, num_decoder_layers=3, num_heads=4,
                        decoder_ffn_dim=96, use_encoder_decoder=True,
                        pixel_encoder_layers=2, pixel_encoder_ffn_dim=96)
    feats = [np.asarray(f) for f in feats_np]
    init = jax.jit(fm.init)(jax.random.PRNGKey(0), feats)
    assert_full_coverage(params, init["params"])
    cls_j, mask_j = jax.jit(fm.apply)({"params": params}, feats)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(cls_j[i]), cls_t[i].numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"cls layer {i}")
        np.testing.assert_allclose(
            np.asarray(mask_j[i]), mask_t[i].numpy(), rtol=2e-4, atol=3e-4,
            err_msg=f"mask layer {i}")


def test_grounding_dino_checkpoint_roundtrip():
    """Full wsdm2023 GroundingDINO .pth conversion: UniPerceiver backbone +
    ChannelMapper neck + DINO head keys assembled torch-side, converted with
    convert_grounding_dino_checkpoint, covering the flax detector's full
    init tree; converted model runs finite eval forward."""
    import jax.numpy as jnp

    from vitadapter.det.grounding_dino import GroundingDINO
    from vitadapter.models.uniperceiver_adapter import UniPerceiverAdapter
    from vitadapter.utils.checkpoint import convert_grounding_dino_checkpoint

    from torch_ref import ConvGNT, DinoTransformerT, UniPerceiverAdapterT

    dim, C, Q, K = 48, 64, 12, 1
    tb = UniPerceiverAdapterT(dim=dim, depth=4, heads=4, vocab=100,
                              conv_inplane=16, deform_num_heads=4)
    th = DinoTransformerT(C=C, heads=4, num_enc=2, num_dec=3, ffn_dim=96,
                          num_queries=Q, num_classes=K)
    randomize(tb, 71)
    randomize(th, 72)

    class NeckT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = torch.nn.ModuleList(
                [ConvGNT(dim, C, 1) for _ in range(3)])
            # mmdet ChannelMapper: the first extra conv reads the RAW last
            # input feature, not the mapped one
            self.extra_convs = torch.nn.ModuleList([ConvGNT(dim, C, 3)])

    tn = NeckT()
    randomize(tn, 73)
    sd = {}
    sd.update({"backbone." + k: v for k, v in tb.state_dict().items()})
    sd.update({"neck." + k: v for k, v in tn.state_dict().items()})
    sd.update({"bbox_head." + k: v for k, v in th.state_dict().items()})
    sd["bbox_head.label_embedding.weight"] = 0.1 * torch.randn(K, C)

    variables = convert_grounding_dino_checkpoint({"state_dict": sd})

    model = GroundingDINO(
        backbone=UniPerceiverAdapter(
            patch_size=16, embed_dim=dim, depth=4, num_heads=4,
            vocab_size=100, conv_inplane=16, deform_num_heads=4,
            out_indices=(1, 2, 3),
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3))),
        num_classes=K, num_queries=Q, embed_dim=C, num_heads=4, ffn_dim=96,
        num_encoder_layers=2, num_decoder_layers=3)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    ids = jnp.zeros((1, 6), jnp.int32)
    init = jax.jit(lambda k, x, i: model.init(k, x, i))(
        jax.random.PRNGKey(0), img, ids)
    assert_full_coverage(variables["params"], init["params"])
    assert_full_coverage(variables["batch_stats"], init["batch_stats"])

    out = jax.jit(model.apply)(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, img, ids)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


class _ConvM(torch.nn.Module):
    """mmdet ConvModule without norm: just `.conv` (+act outside)."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride, k // 2)


def _mmdet_bbox_head(C=256, fc=64, K=7, agnostic=False):
    m = torch.nn.Module()
    m.shared_fcs = torch.nn.ModuleList(
        [torch.nn.Linear(C * 49, fc), torch.nn.Linear(fc, fc)])
    m.fc_cls = torch.nn.Linear(fc, K + 1)
    m.fc_reg = torch.nn.Linear(fc, 4 if agnostic else 4 * K)
    return m


def _mmdet_mask_head(C=256, K=7, info_flow=False):
    m = torch.nn.Module()
    m.convs = torch.nn.ModuleList([_ConvM(C, C, 3) for _ in range(4)])
    if info_flow:
        m.conv_res_feat = _ConvM(C, C, 1)
    m.upsample = torch.nn.ConvTranspose2d(C, C, 2, 2)
    m.conv_logits = torch.nn.Conv2d(C, K, 1)
    return m


def test_mask_rcnn_checkpoint_roundtrip():
    """Mask R-CNN .pth conversion: ViT-Adapter backbone + FPN + RPN + RoI
    heads; full init-tree coverage AND numeric parity of the layout-
    sensitive heads (channel-first fc flatten, transposed-conv flip)."""
    import jax.numpy as jnp

    from vitadapter.det.mask_rcnn import MaskRCNN
    from vitadapter.det.roi_heads import FCNMaskHead, Shared2FCBBoxHead
    from vitadapter.models.vit_adapter import ViTAdapter
    from vitadapter.utils.checkpoint import convert_detector_checkpoint

    from torch_ref import ViTAdapterT

    dim, C, K, fc = 48, 64, 7, 1024
    tb = ViTAdapterT(embed_dim=dim, depth=4, num_heads=4, pretrain_size=224,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tb, 81)

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
    randomize(full, 82)

    sd = {"backbone." + k: v for k, v in tb.state_dict().items()}
    sd.update(full.state_dict())
    variables = convert_detector_checkpoint({"state_dict": sd})

    model = MaskRCNN(
        backbone=ViTAdapter(
            patch_size=16, embed_dim=dim, depth=4, num_heads=4,
            deform_num_heads=6, conv_inplane=16, pretrain_size=224,
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3))),
        num_classes=K, fpn_channels=C)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(0), img)
    assert_full_coverage(variables["params"], init["params"])
    assert_full_coverage(variables["batch_stats"], init["batch_stats"])

    # numeric parity of the layout-sensitive RoI heads
    roi_np = np.random.RandomState(5).randn(3, 7, 7, C).astype(np.float32)
    x_t = torch.from_numpy(roi_np.transpose(0, 3, 1, 2)).flatten(1)
    with torch.no_grad():
        h = x_t
        for fc_l in roi.bbox_head.shared_fcs:
            h = torch.relu(fc_l(h))
        cls_t = roi.bbox_head.fc_cls(h)
        reg_t = roi.bbox_head.fc_reg(h)
    bh = Shared2FCBBoxHead(num_classes=K, fc_dim=fc)
    cls_j, reg_j = bh.apply({"params": variables["params"]["bbox_head"]},
                            jnp.asarray(roi_np))
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(reg_j).reshape(3, -1),
                               reg_t.numpy(), rtol=2e-4, atol=2e-4)

    m_np = np.random.RandomState(6).randn(3, 14, 14, C).astype(np.float32)
    with torch.no_grad():
        y = torch.from_numpy(m_np.transpose(0, 3, 1, 2))
        for cm in roi.mask_head.convs:
            y = torch.relu(cm.conv(y))
        y = torch.relu(roi.mask_head.upsample(y))
        logits_t = roi.mask_head.conv_logits(y)
    mh = FCNMaskHead(num_classes=K, channels=C)
    logits_j = mh.apply({"params": variables["params"]["mask_head"]},
                        jnp.asarray(m_np))
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy().transpose(0, 2, 3, 1),
        rtol=2e-4, atol=2e-4)


def test_htc_checkpoint_roundtrip():
    """HTC++ .pth conversion: cascade stages, mask info flow, semantic
    branch, ExtraAttention pre-neck — full init-tree coverage."""
    import jax.numpy as jnp

    from vitadapter.det.cascade import CascadeRCNN
    from vitadapter.models.vit_adapter import ViTAdapter
    from vitadapter.utils.checkpoint import convert_detector_checkpoint

    from torch_ref import MlpT, ViTAdapterT

    dim, C, K, fc = 48, 64, 7, 1024
    tb = ViTAdapterT(embed_dim=dim, depth=4, num_heads=4, pretrain_size=224,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tb, 83)

    ea = torch.nn.Module()
    ea.norm1 = torch.nn.LayerNorm(dim)
    ea.attn = torch.nn.Module()
    ea.attn.qkv = torch.nn.Linear(dim, 3 * dim)
    ea.attn.proj = torch.nn.Linear(dim, dim)
    ea.norm2 = torch.nn.LayerNorm(dim)
    ea.ffn = MlpT(dim, int(dim * 4.0))
    ea.final_norm = torch.nn.LayerNorm(dim)
    fpn = torch.nn.Module()
    fpn.lateral_convs = torch.nn.ModuleList(
        [_ConvM(dim, C, 1) for _ in range(4)])
    fpn.fpn_convs = torch.nn.ModuleList(
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
    sem = torch.nn.Module()
    sem.lateral_convs = torch.nn.ModuleList(
        [_ConvM(C, C, 1) for _ in range(4)])
    sem.convs = torch.nn.ModuleList([_ConvM(C, C, 3) for _ in range(4)])
    sem.conv_embedding = _ConvM(C, C, 1)
    sem.conv_logits = torch.nn.Conv2d(C, 11, 1)
    roi.semantic_head = sem
    full = torch.nn.Module()
    full.neck = torch.nn.ModuleList([ea, fpn])
    full.rpn_head, full.roi_head = rpn, roi
    randomize(full, 84)

    sd = {"backbone." + k: v for k, v in tb.state_dict().items()}
    sd.update(full.state_dict())
    variables = convert_detector_checkpoint({"state_dict": sd})

    model = CascadeRCNN(
        backbone=ViTAdapter(
            patch_size=16, embed_dim=dim, depth=4, num_heads=4,
            deform_num_heads=6, conv_inplane=16, pretrain_size=224,
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3))),
        num_classes=K, fpn_channels=C, use_extra_attention=True,
        with_semantic=True, num_semantic_classes=11)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(0), img)
    assert_full_coverage(variables["params"], init["params"])
    assert_full_coverage(variables["batch_stats"], init["batch_stats"])


def test_segmentor_checkpoint_routing_maskformer_and_panoptic():
    """convert_segmentor_checkpoint routes by key scheme: MaskFormer heads
    (no level_encoding) and mmdet panoptic_head-prefixed Mask2Former."""
    from vitadapter.utils.checkpoint import convert_segmentor_checkpoint

    from torch_ref import MaskFormerHeadT, ViTAdapterT

    tb = ViTAdapterT(embed_dim=48, depth=4, num_heads=4, pretrain_size=224,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tb, 91)
    tm = MaskFormerHeadT([48] * 4, 64, num_classes=7, num_queries=5,
                         num_dec=3, heads=4, dec_ffn=96, enc_layers=2,
                         enc_ffn=96)
    randomize(tm, 92)
    sd = {"backbone." + k: v for k, v in tb.state_dict().items()}
    sd.update({"decode_head." + k: v for k, v in tm.state_dict().items()})
    v = convert_segmentor_checkpoint({"state_dict": sd})
    assert "post_norm" in v["params"]["decode_head"]
    assert "encoder_in_proj" in v["params"]["decode_head"]["pixel_decoder"]

    # panoptic_head prefix (mmdet COCO-panoptic Mask2Former)
    from torch_ref import Mask2FormerHeadT

    t2 = Mask2FormerHeadT([48, 48, 48, 48], 64, num_classes=7,
                          num_queries=5, heads=4, dec_ffn=96, enc_ffn=96,
                          enc_heads=4)
    randomize(t2, 93)
    sd2 = {"backbone." + k: v2 for k, v2 in tb.state_dict().items()}
    sd2.update({"panoptic_head." + k: v2 for k, v2 in t2.state_dict().items()})
    v2 = convert_segmentor_checkpoint({"state_dict": sd2})
    assert "level_encoding" in v2["params"]["decode_head"]["pixel_decoder"]


def test_atss_checkpoint_roundtrip():
    """ATSS .pth conversion: start_level-1 FPN with on_output extra convs,
    GN towers, scales — full init-tree coverage."""
    import jax.numpy as jnp

    from vitadapter.det.single_stage import ATSS
    from vitadapter.models.vit_adapter import ViTAdapter
    from vitadapter.utils.checkpoint import convert_detector_checkpoint

    from torch_ref import ViTAdapterT

    dim, C, K = 48, 64, 7
    tb = ViTAdapterT(embed_dim=dim, depth=4, num_heads=4, pretrain_size=224,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tb, 95)

    class TowerM(torch.nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.conv = torch.nn.Conv2d(cin, C, 3, 1, 1)
            self.gn = torch.nn.GroupNorm(32, C)

    class ScaleM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.scale = torch.nn.Parameter(torch.ones(()))

    full = torch.nn.Module()
    neck = torch.nn.Module()
    # start_level=1: 3 laterals; on_output extras = fpn_convs 3 and 4
    neck.lateral_convs = torch.nn.ModuleList(
        [_ConvM(dim, C, 1) for _ in range(3)])
    neck.fpn_convs = torch.nn.ModuleList(
        [_ConvM(C, C, 3) for _ in range(3)]
        + [_ConvM(C, C, 3, stride=2) for _ in range(2)])
    head = torch.nn.Module()
    head.cls_convs = torch.nn.ModuleList([TowerM(C) for _ in range(4)])
    head.reg_convs = torch.nn.ModuleList([TowerM(C) for _ in range(4)])
    head.atss_cls = torch.nn.Conv2d(C, K, 3, 1, 1)
    head.atss_reg = torch.nn.Conv2d(C, 4, 3, 1, 1)
    head.atss_centerness = torch.nn.Conv2d(C, 1, 3, 1, 1)
    head.scales = torch.nn.ModuleList([ScaleM() for _ in range(5)])
    full.neck, full.bbox_head = neck, head
    randomize(full, 96)

    sd = {"backbone." + k: v for k, v in tb.state_dict().items()}
    sd.update(full.state_dict())
    variables = convert_detector_checkpoint({"state_dict": sd})

    model = ATSS(
        backbone=ViTAdapter(
            patch_size=16, embed_dim=dim, depth=4, num_heads=4,
            deform_num_heads=6, conv_inplane=16, pretrain_size=224,
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3))),
        num_classes=K, fpn_channels=C)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(0), img)
    assert_full_coverage(variables["params"], init["params"])
    assert_full_coverage(variables["batch_stats"], init["batch_stats"])


def test_sparse_rcnn_checkpoint_roundtrip():
    """Sparse R-CNN .pth conversion: EmbeddingRPNHead proposals + 6 DII
    stages (attention, DynamicConv, towers) — full init-tree coverage."""
    import jax.numpy as jnp

    from vitadapter.det.sparse_rcnn import SparseRCNN
    from vitadapter.models.vit_adapter import ViTAdapter
    from vitadapter.utils.checkpoint import convert_detector_checkpoint

    from torch_ref import ViTAdapterT

    dim, C, K, NP = 48, 64, 7, 10
    tb = ViTAdapterT(embed_dim=dim, depth=4, num_heads=4, pretrain_size=224,
                     conv_inplane=16, deform_num_heads=6,
                     interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    randomize(tb, 97)

    class DIIT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.attention = torch.nn.Module()
            self.attention.attn = torch.nn.MultiheadAttention(C, 4)
            self.attention_norm = torch.nn.LayerNorm(C)
            ic = torch.nn.Module()
            ic.dynamic_layer = torch.nn.Linear(C, C * 64 * 2)
            ic.norm_in = torch.nn.LayerNorm(64)
            ic.norm_out = torch.nn.LayerNorm(C)
            ic.fc_layer = torch.nn.Linear(49 * C, C)
            ic.fc_norm = torch.nn.LayerNorm(C)
            self.instance_interactive_conv = ic
            self.instance_interactive_conv_norm = torch.nn.LayerNorm(C)
            self.ffn = torch.nn.Module()
            self.ffn.layers = torch.nn.Sequential(
                torch.nn.Sequential(torch.nn.Linear(C, 2048),
                                    torch.nn.ReLU()),
                torch.nn.Linear(2048, C))
            self.ffn_norm = torch.nn.LayerNorm(C)
            self.cls_fcs = torch.nn.ModuleList(
                [torch.nn.Linear(C, C, bias=False), torch.nn.LayerNorm(C),
                 torch.nn.ReLU()])
            self.reg_fcs = torch.nn.ModuleList(sum(
                [[torch.nn.Linear(C, C, bias=False), torch.nn.LayerNorm(C),
                  torch.nn.ReLU()] for _ in range(3)], []))
            self.fc_cls = torch.nn.Linear(C, K)
            self.fc_reg = torch.nn.Linear(C, 4)

    full = torch.nn.Module()
    full.rpn_head = torch.nn.Module()
    full.rpn_head.init_proposal_features = torch.nn.Embedding(NP, C)
    full.rpn_head.init_proposal_bboxes = torch.nn.Embedding(NP, 4)
    neck = torch.nn.Module()
    neck.lateral_convs = torch.nn.ModuleList(
        [_ConvM(dim, C, 1) for _ in range(4)])
    neck.fpn_convs = torch.nn.ModuleList(
        [_ConvM(C, C, 3) for _ in range(4)])
    full.neck = neck
    full.roi_head = torch.nn.Module()
    full.roi_head.bbox_head = torch.nn.ModuleList(
        [DIIT() for _ in range(2)])
    randomize(full, 98)

    sd = {"backbone." + k: v for k, v in tb.state_dict().items()}
    sd.update(full.state_dict())
    variables = convert_detector_checkpoint({"state_dict": sd})

    model = SparseRCNN(
        backbone=ViTAdapter(
            patch_size=16, embed_dim=dim, depth=4, num_heads=4,
            deform_num_heads=6, conv_inplane=16, pretrain_size=224,
            interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3))),
        num_classes=K, num_proposals=NP, num_stages=2, channels=C)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(0), img)
    assert_full_coverage(variables["params"], init["params"])
    assert_full_coverage(variables["batch_stats"], init["batch_stats"])
