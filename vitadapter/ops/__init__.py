from vitadapter.ops.msda import (
    ms_deform_attn,
    msda_reference,
    MSDeformAttn,
)
