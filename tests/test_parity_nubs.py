"""Small parity components: HybridEmbed CNN stem and the paraphrase tool.

Reference counterparts: `detection/mmdet_custom/models/backbones/base/
beit.py:270` (HybridEmbed) and `wsdm2023/tools/paraphrase.py` (offline
paraphrase cache generator).
"""

import csv
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.layers.patch_embed import HybridEmbed
from vitadapter.models.beit import BEiT


class _TinyStem(nn.Module):
    """4x-downsampling conv stand-in for the CNN backbone."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(12, (3, 3), strides=(2, 2), padding="SAME")(x)
        return x


def test_hybrid_embed_tokens():
    m = HybridEmbed(backbone=_TinyStem(), embed_dim=32)
    x = jnp.zeros((2, 32, 48, 3))
    (tokens, Hp, Wp), _ = jax.jit(m.init_with_output,
                                  static_argnums=())(jax.random.PRNGKey(0), x)
    assert (Hp, Wp) == (8, 12)
    assert tokens.shape == (2, 8 * 12, 32)


def test_beit_with_hybrid_stem():
    model = BEiT(img_size=64, patch_size=16, embed_dim=32, depth=2,
                 num_heads=4, hybrid_backbone=_TinyStem(),
                 use_rel_pos_bias=False, use_cls_token=False)
    x = jnp.zeros((1, 64, 64, 3))
    out, variables = jax.jit(model.init_with_output)(jax.random.PRNGKey(0), x)
    # 4x stem -> 16x16 token grid at 64px (vs 4x4 with the 16-patch conv)
    assert out.shape == (1, 256, 32)
    assert "proj" in variables["params"]["patch_embed"]


def test_paraphrase_tool_rule_fallback(tmp_path):
    from vitadapter.data.grounding import ParaphraseCache

    rows = [{"image": "d/a.jpg", "question": "What is the red car?"},
            {"image": "d/b.jpg", "question": "the left dog"}]
    csv_path = tmp_path / "in.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "question"])
        w.writeheader()
        w.writerows(rows)
    out_path = tmp_path / "cache.json"
    subprocess.run(
        [sys.executable, "tools/paraphrase.py", str(csv_path), str(out_path)],
        check=True, capture_output=True)
    with open(out_path) as f:
        cache = json.load(f)
    assert set(cache) == {"what is the red car", "the left dog"}
    assert all(isinstance(v, list) and v for v in cache.values())
    # generated cache plugs straight into the train-time consumer
    pc = ParaphraseCache(str(out_path))
    rng = np.random.RandomState(0)
    alt = pc.maybe_paraphrase(rng, "what is the red car", prob=1.0)
    assert alt in cache["what is the red car"]
