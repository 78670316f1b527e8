"""resize_2d must reproduce torch F.interpolate(align_corners=False) exactly."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vitadapter.utils.resize import resize_2d


@pytest.mark.parametrize("method", ["bilinear", "bicubic"])
@pytest.mark.parametrize("hw_in,hw_out", [
    ((14, 14), (32, 32)),   # pos-embed upsample
    ((14, 14), (7, 9)),     # downsample, non-square
    ((8, 12), (16, 24)),    # 2x upsample
    ((16, 16), (8, 8)),     # 0.5x downsample
    ((5, 7), (11, 3)),      # odd sizes
])
def test_resize_matches_torch(method, hw_in, hw_out):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *hw_in, 5).astype(np.float32)
    ours = resize_2d(jnp.asarray(x), hw_out, method)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=hw_out,
                        mode=method, align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
