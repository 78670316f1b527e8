# UperNet + ViT-Adapter-Base on ADE20K (counterpart of the reference
# upernet_deit_adapter_base config).
_base_ = ["./upernet_vit_adapter_tiny_512_160k_ade20k.py"]
model = dict(
    backbone=dict(embed_dim=768, num_heads=12, drop_path_rate=0.3),
    auxiliary_head=dict(num_classes=150))
