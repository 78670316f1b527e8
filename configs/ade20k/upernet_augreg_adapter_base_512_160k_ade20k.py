# UperNet + AugReg-Adapter-B on ADE20K 512x512, 160k iters.
# Counterpart of reference `upernet_augreg_adapter_base_512_160k_ade20k.py`
# (384px AugReg pretrain, deform_ratio 0.5, lr 2e-5).
_base_ = ["./upernet_vit_adapter_tiny_512_160k_ade20k.py"]
pretrained = ("pretrained/B_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.0"
              "-sd_0.0--imagenet2012-steps_20k-lr_0.01-res_384.pth")
model = dict(backbone=dict(
    img_size=384, pretrain_size=384, embed_dim=768, num_heads=12,
    drop_path_rate=0.3, deform_num_heads=12, deform_ratio=0.5))
optimizer = dict(lr=2e-5)
