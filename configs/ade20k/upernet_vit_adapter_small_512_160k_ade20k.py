# UperNet + ViT-Adapter-Small on ADE20K (counterpart of the reference
# upernet_deit_adapter_small config).
_base_ = ["./upernet_vit_adapter_tiny_512_160k_ade20k.py"]
model = dict(
    backbone=dict(embed_dim=384, num_heads=6, drop_path_rate=0.2),
    auxiliary_head=dict(num_classes=150))
