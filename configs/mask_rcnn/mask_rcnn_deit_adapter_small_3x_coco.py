# Mask R-CNN + ViT-Adapter-S with the ChannelMapperWithPooling neck instead
# of FPN. Counterpart of reference `mask_rcnn_deit_adapter_small_3x_coco.py`
# (only diff vs the fpn variant: neck type).
_base_ = ["./mask_rcnn_deit_adapter_small_fpn_3x_coco.py"]
model = dict(neck_type="channel_mapper")
