from vitadapter.layers.drop import DropPath
from vitadapter.layers.mlp import Mlp
from vitadapter.layers.norm import LayerNorm2d, BatchNorm
from vitadapter.layers.attention import Attention, WindowedAttention
from vitadapter.layers.patch_embed import PatchEmbed
