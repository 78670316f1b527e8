from vitadapter.ops.attention_pallas import fused_mha
from vitadapter.ops.msda import (
    ms_deform_attn,
    msda_reference,
    MSDeformAttn,
)
