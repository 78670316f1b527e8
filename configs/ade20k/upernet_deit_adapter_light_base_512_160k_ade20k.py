# UperNet + "light" DeiT-Adapter-B: ONE interaction block over the whole
# trunk, no ConvFFN in the extractors, deform_ratio 0.5.
# Counterpart of reference `upernet_deit_adapter_light_base_512_160k_ade20k.py`.
_base_ = ["./upernet_vit_adapter_tiny_512_160k_ade20k.py"]
pretrained = "pretrained/deit_base_patch16_224-b5f2ef4d.pth"
model = dict(backbone=dict(
    embed_dim=768, num_heads=12, drop_path_rate=0.3, deform_num_heads=12,
    deform_ratio=0.5, with_cffn=False, interaction_indexes=[[0, 11]]))
optimizer = dict(lr=6e-5)
