"""Fused whole-row attention kernel vs the XLA formulation (interpret mode;
`tools/tpu_smoke.py` runs the compiled on-chip parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitadapter.ops.attention_pallas import fusable, fused_mha


def xla_mha(q, k, v, scale):
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_mha_forward_matches_xla(dtype):
    B, H, N, D = 2, 3, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, N, D), dtype) for kk in ks)
    scale = D ** -0.5
    got = fused_mha(q, k, v, scale, True)
    ref = xla_mha(q, k, v, scale)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_fused_mha_grads_match_xla():
    B, H, N, D = 1, 2, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, H, N, D), jnp.float32) for kk in ks)
    scale = D ** -0.5

    def loss_fused(q, k, v):
        o = fused_mha(q, k, v, scale, True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_xla(q, k, v):
        o = xla_mha(q, k, v, scale)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_fusable_gate():
    bf = jnp.bfloat16
    assert fusable((4, 16, 1024, 64), bf, None)
    assert fusable((1, 8, 128, 128), bf, None)
    assert not fusable((4, 16, 1024, 64), jnp.float32, None)   # fp32 -> XLA
    assert not fusable((4, 16, 1024, 64), bf, jnp.zeros(()))   # bias
    assert not fusable((4, 2, 16, 1024, 64), bf, None)         # 5D (windowed)
    assert not fusable((4, 16, 196, 64), bf, None)             # non-128 N
    assert not fusable((4, 16, 4096, 64), bf, None)            # VMEM cliff
    assert not fusable((4, 16, 1024, 96), bf, None)            # lane-illegal D
