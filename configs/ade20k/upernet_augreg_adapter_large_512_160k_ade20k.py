# UperNet + AugReg-Adapter-L on ADE20K 512x512, 160k iters.
# Counterpart of reference `upernet_augreg_adapter_large_512_160k_ade20k.py`
# (ViT-L 384px AugReg pretrain, 4x6-block interactions, with_cp).
_base_ = ["./upernet_vit_adapter_tiny_512_160k_ade20k.py"]
pretrained = ("pretrained/L_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.1"
              "-sd_0.1--imagenet2012-steps_20k-lr_0.01-res_384.pth")
model = dict(
    backbone=dict(
        dtype="float32",  # ref trains AugReg-L without fp16
        img_size=384, pretrain_size=384, embed_dim=1024, depth=24,
        num_heads=16, drop_path_rate=0.4, deform_num_heads=16,
        deform_ratio=0.5, with_cp=True,
        interaction_indexes=[[0, 5], [6, 11], [12, 17], [18, 23]]),
    decode_head=dict(channels=1024),
)
optimizer = dict(lr=2e-5, weight_decay=0.05)
