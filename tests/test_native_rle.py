"""Native C++ COCO mask runtime (`native/rle.cpp`): codec round-trip vs the
pure-python reference, and bit-packed mask IoU vs dense numpy.

Counterpart role: pycocotools' C maskApi, which the reference stack uses
for every segm evaluation.
"""

import numpy as np
import pytest

from vitadapter.ops import native


def _rand_mask(rng, h, w):
    m = (rng.rand(h, w) > 0.6).astype(np.uint8)
    m[rng.randint(0, h), :] = 1  # long runs too
    return m


@pytest.mark.skipif(not native.native_available(),
                    reason="g++ toolchain unavailable")
def test_rle_roundtrip_matches_python_codec():
    import vitadapter.data.coco as coco

    rng = np.random.RandomState(0)
    for h, w in [(13, 17), (64, 64), (1, 9), (40, 1)]:
        m = _rand_mask(rng, h, w)
        s = native.rle_encode(m)
        # python encoder (fallback path inside encode_rle) must agree
        py = coco.encode_rle.__wrapped__(m) if hasattr(
            coco.encode_rle, "__wrapped__") else None
        # C encode -> C decode round-trips
        back = native.rle_decode(s, h, w)
        assert (back == m).all()
        # C encode -> python decode round-trips (codec interop)
        runs_back = coco.decode_rle(s, (h, w))
        assert (runs_back == m).all()


@pytest.mark.skipif(not native.native_available(),
                    reason="g++ toolchain unavailable")
def test_rle_matches_python_encoder_string():
    """C and python encoders produce the identical compressed string."""
    import vitadapter.data.coco as coco

    rng = np.random.RandomState(1)
    m = _rand_mask(rng, 23, 31)
    c_str = native.rle_encode(m)

    # python encoder body (bypass the native shortcut): rebuild from source
    H, W = m.shape
    flat = np.asarray(m, np.uint8).T.reshape(-1)
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    runs = np.diff(idx).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    out = []
    for i, x in enumerate(runs):
        if i > 2:
            x -= runs[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and \
                not (x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    assert c_str == "".join(out)


@pytest.mark.skipif(not native.native_available(),
                    reason="g++ toolchain unavailable")
def test_mask_iou_native_matches_numpy():
    rng = np.random.RandomState(2)
    dets = np.stack([_rand_mask(rng, 37, 41) for _ in range(5)])
    gts = np.stack([_rand_mask(rng, 37, 41) for _ in range(3)])
    iscrowd = np.asarray([0, 1, 0], np.uint8)

    got = native.mask_iou_native(dets, gts, iscrowd)
    d = dets.reshape(5, -1).astype(bool)
    g = gts.reshape(3, -1).astype(bool)
    inter = (d[:, None] & g[None, :]).sum(-1).astype(np.float64)
    union = (d[:, None] | g[None, :]).sum(-1).astype(np.float64)
    want = inter / np.maximum(union, 1e-9)
    ioa = inter / np.maximum(d.sum(-1)[:, None], 1e-9)
    want = np.where(iscrowd[None, :].astype(bool), ioa, want)
    assert np.allclose(got, want, atol=1e-12)

    # empty-mask rows give IoU 0, not NaN
    z = np.zeros((1, 37, 41), np.uint8)
    assert float(native.mask_iou_native(z, gts)[0].max()) >= 0.0
    assert np.isfinite(native.mask_iou_native(z, gts)).all()
