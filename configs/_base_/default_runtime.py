# Shared runtime defaults (counterpart of the reference
# `configs/_base_/default_runtime.py` in each sub-repo).
log_config = dict(interval=50)
checkpoint_config = dict(interval=1, max_keep_ckpts=3)
