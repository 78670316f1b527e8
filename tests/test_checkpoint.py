"""Checkpoint converter tests.

(1) Layout rules verified numerically against torch ops.
(2) Structural: a synthetic reference-named state_dict converts into exactly
    the variable tree our models expect (tree structure + shapes match init).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from flax import linen as nn

from vitadapter.utils import checkpoint as ckpt


def test_linear_layout():
    w = torch.randn(8, 5)
    b = torch.randn(8)
    x = torch.randn(3, 5)
    ref = F.linear(x, w, b).numpy()
    ours = np.asarray(x.numpy() @ ckpt.linear(w) + b.numpy())
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_conv_layout():
    w = torch.randn(6, 3, 3, 3)
    x = torch.randn(2, 3, 8, 8)
    ref = F.conv2d(x, w, padding=1).permute(0, 2, 3, 1).numpy()
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ckpt.conv(w)), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_depthwise_conv_layout():
    C = 4
    w = torch.randn(C, 1, 3, 3)
    x = torch.randn(1, C, 6, 6)
    ref = F.conv2d(x, w, padding=1, groups=C).permute(0, 2, 3, 1).numpy()
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ckpt.dwconv(w)), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose_layout():
    """torch ConvTranspose2d(k=2, s=2) == flax ConvTranspose with converted w."""
    tin, tout = 5, 7
    w = torch.randn(tin, tout, 2, 2)
    b = torch.randn(tout)
    x = torch.randn(2, tin, 4, 6)
    ref = F.conv_transpose2d(x, w, b, stride=2).permute(0, 2, 3, 1).numpy()

    mod = nn.ConvTranspose(tout, (2, 2), strides=(2, 2))
    vars_ = {"params": {"kernel": jnp.asarray(ckpt.conv_transpose(w)),
                        "bias": jnp.asarray(b.numpy())}}
    ours = mod.apply(vars_, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def _inverse_backbone(variables, prefix="backbone."):
    """Build a reference-named torch state_dict from our variable tree.

    This is the inverse of convert_vit_adapter_backbone's documented mapping —
    used to check converter/model structural agreement offline (real-name
    fidelity is validated against released checkpoints when available).
    """
    sd = {}
    params = variables["params"]
    stats = variables["batch_stats"]

    def inv_dense(node, name):
        sd[name + ".weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            sd[name + ".bias"] = np.asarray(node["bias"])

    def inv_conv(node, name, tf="conv"):
        k = np.asarray(node["kernel"])
        if tf == "conv":
            sd[name + ".weight"] = k.transpose(3, 2, 0, 1)
        elif tf == "dw":
            sd[name + ".weight"] = k.transpose(3, 2, 0, 1)
        elif tf == "convT":
            sd[name + ".weight"] = k[::-1, ::-1].transpose(2, 3, 0, 1).copy()
        if "bias" in node:
            sd[name + ".bias"] = np.asarray(node["bias"])

    def inv_ln(node, name):
        sd[name + ".weight"] = np.asarray(node["scale"])
        sd[name + ".bias"] = np.asarray(node["bias"])

    def inv_bn(pnode, snode, name):
        sd[name + ".weight"] = np.asarray(pnode["scale"])
        sd[name + ".bias"] = np.asarray(pnode["bias"])
        sd[name + ".running_mean"] = np.asarray(snode["mean"])
        sd[name + ".running_var"] = np.asarray(snode["var"])

    def inv_msda(node, name):
        for n in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            inv_dense(node[n], f"{name}.{n}")

    def inv_extractor(node, name):
        inv_ln(node["query_norm"], name + ".query_norm")
        inv_ln(node["feat_norm"], name + ".feat_norm")
        inv_msda(node["attn"], name + ".attn")
        if "ffn" in node:
            inv_ln(node["ffn_norm"], name + ".ffn_norm")
            inv_dense(node["ffn"]["fc1"], name + ".ffn.fc1")
            inv_dense(node["ffn"]["fc2"], name + ".ffn.fc2")
            inv_conv(node["ffn"]["dwconv"]["dwconv"], name + ".ffn.dwconv.dwconv",
                     "dw")

    p = prefix
    sd[p + "pos_embed"] = np.asarray(params["vit"]["pos_embed"])
    inv_conv(params["vit"]["patch_embed"]["proj"], p + "patch_embed.proj")
    i = 0
    while f"blocks_{i}" in params["vit"]:
        blk = params["vit"][f"blocks_{i}"]
        name = f"{p}blocks.{i}"
        inv_ln(blk["norm1"], name + ".norm1")
        inv_ln(blk["norm2"], name + ".norm2")
        inv_dense(blk["attn"]["qkv"], name + ".attn.qkv")
        inv_dense(blk["attn"]["proj"], name + ".attn.proj")
        inv_dense(blk["mlp"]["fc1"], name + ".mlp.fc1")
        inv_dense(blk["mlp"]["fc2"], name + ".mlp.fc2")
        if "gamma1" in blk:
            sd[name + ".gamma1"] = np.asarray(blk["gamma1"])
            sd[name + ".gamma2"] = np.asarray(blk["gamma2"])
        i += 1
    sd[p + "level_embed"] = np.asarray(params["level_embed"])
    spm_p, spm_s = params["spm"], stats["spm"]
    for t_idx, nm in {0: "stem1", 3: "stem2", 6: "stem3"}.items():
        inv_conv(spm_p[f"{nm}_conv"], f"{p}spm.stem.{t_idx}")
        inv_bn(spm_p[f"{nm}_bn"], spm_s[f"{nm}_bn"], f"{p}spm.stem.{t_idx+1}")
    for c in (2, 3, 4):
        inv_conv(spm_p[f"conv{c}_conv"], f"{p}spm.conv{c}.0")
        inv_bn(spm_p[f"conv{c}_bn"], spm_s[f"conv{c}_bn"], f"{p}spm.conv{c}.1")
    for f in (1, 2, 3, 4):
        inv_conv(spm_p[f"fc{f}"], f"{p}spm.fc{f}")
    i = 0
    while f"interactions_{i}" in params:
        node = params[f"interactions_{i}"]
        name = f"{p}interactions.{i}"
        inv_ln(node["injector"]["query_norm"], name + ".injector.query_norm")
        inv_ln(node["injector"]["feat_norm"], name + ".injector.feat_norm")
        inv_msda(node["injector"]["attn"], name + ".injector.attn")
        sd[name + ".injector.gamma"] = np.asarray(node["injector"]["gamma"])
        inv_extractor(node["extractor"], name + ".extractor")
        for j in (0, 1):
            if f"extra_extractors_{j}" in node:
                inv_extractor(node[f"extra_extractors_{j}"],
                              name + f".extra_extractors.{j}")
        i += 1
    inv_conv(params["up"], p + "up", "convT")
    for n in (1, 2, 3, 4):
        inv_bn(params[f"norm{n}"], stats[f"norm{n}"], f"{p}norm{n}")
    return sd


def test_backbone_convert_structure_roundtrip():
    from vitadapter.models.vit_adapter import ViTAdapter

    model = ViTAdapter(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                       deform_num_heads=4, conv_inplane=16,
                       interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    sd = _inverse_backbone(variables)
    params, stats = ckpt.convert_vit_adapter_backbone(sd, prefix="backbone.")

    got = jax.tree_util.tree_map(np.shape, params)
    want = jax.tree_util.tree_map(
        np.shape, jax.tree_util.tree_map(np.asarray, variables["params"]))
    assert got == want
    # converted values run through the model
    out = model.apply({"params": params,
                       "batch_stats": stats}, x)
    assert out[0].shape == (1, 8, 8, 48)
    # numerically identical to original params (roundtrip is lossless)
    orig = model.apply(variables, x)
    for a, b in zip(out, orig):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_unwrap_state_dict_roots_and_prefixes():
    inner = {"module.pos_embed": 1, "encoder.blocks.0.w": 2}
    assert ckpt.unwrap_state_dict({"state_dict": inner}) == {
        "pos_embed": 1, "blocks.0.w": 2}
    assert ckpt.unwrap_state_dict({"model": inner})["pos_embed"] == 1
