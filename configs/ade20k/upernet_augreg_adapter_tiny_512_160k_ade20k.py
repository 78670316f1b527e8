# UperNet + AugReg-Adapter-T on ADE20K 512x512, 160k iters.
# Counterpart of reference `upernet_augreg_adapter_tiny_512_160k_ade20k.py`
# (same arch as the DeiT-T variant; AugReg-i21k pretrain).
_base_ = ["./upernet_vit_adapter_tiny_512_160k_ade20k.py"]
pretrained = ("pretrained/Ti_16-i21k-300ep-lr_0.001-aug_none-wd_0.03-do_0.0"
              "-sd_0.0--imagenet2012-steps_20k-lr_0.03-res_384.pth")
model = dict(backbone=dict(img_size=384, pretrain_size=384))
