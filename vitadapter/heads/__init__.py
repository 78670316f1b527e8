from vitadapter.heads.upernet import UPerHead, FCNHead
