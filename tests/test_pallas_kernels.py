"""Correctness of the Pallas fused kernels vs plain-XLA references
(interpret mode on CPU; the same tests run compiled on TPU when available)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e3diff_tpu.ops.pallas_kernels import fused_attention, fused_layernorm

B, LQ, LK, H, D = 8, 16, 32, 4, 64
F = H * D


def _xla_attention(q, k, v, mask_add, pe=None):
    b, lq, f = q.shape
    lk = k.shape[1]
    q4 = q.reshape(b, lq, H, D)
    k4 = k.reshape(b, lk, H, D)
    v4 = v.reshape(b, lk, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q4.astype(jnp.float32),
                   k4.astype(jnp.float32))
    if pe is not None:
        s = s + jnp.einsum("blhd,lrd->bhlr", q4.astype(jnp.float32),
                           pe.astype(jnp.float32))
    s = s / math.sqrt(D) + mask_add[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v4.astype(jnp.float32))
    return o.reshape(b, lq, f)


def _inputs(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, LQ, F)), dtype)
    k = jnp.asarray(rng.normal(size=(B, LK, F)), dtype)
    v = jnp.asarray(rng.normal(size=(B, LK, F)), dtype)
    mask = np.zeros((B, LK), np.float32)
    mask[:, 20:] = -10000.0
    pe = jnp.asarray(rng.normal(size=(LQ, LK, D)), dtype)
    return q, k, v, jnp.asarray(mask), pe


@pytest.mark.parametrize("with_pe", [False, True])
def test_fused_attention_interpret(with_pe):
    q, k, v, mask, pe = _inputs()
    want = np.asarray(_xla_attention(q, k, v, mask, pe if with_pe else None))
    got = np.asarray(fused_attention(
        q, k, v, mask, pe if with_pe else None,
        num_heads=H, block_b=4, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_attention_masked_columns_ignored():
    q, k, v, mask, pe = _inputs(seed=1)
    out1 = fused_attention(q, k, v, mask, None, num_heads=H, interpret=True)
    # perturb masked-out keys/values: result must not change
    k2 = k.at[:, 20:].set(99.0)
    v2 = v.at[:, 20:].set(-99.0)
    out2 = fused_attention(q, k2, v2, mask, None, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_fused_layernorm_interpret():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, LQ, F)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(B, LQ, F)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(F,)), jnp.float32)

    def ref(x):
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        return (x - mean) / np.sqrt(var + 1e-12) * np.asarray(scale) + np.asarray(bias)

    got = np.asarray(fused_layernorm(x, scale, bias, interpret=True))
    np.testing.assert_allclose(got, ref(np.asarray(x)), atol=1e-5)

    got = np.asarray(fused_layernorm(x, scale, bias, residual=res,
                                     interpret=True))
    np.testing.assert_allclose(got, ref(np.asarray(x) + np.asarray(res)),
                               atol=1e-5)


@pytest.mark.skipif(jax.devices()[0].platform == "cpu",
                    reason="compiled path needs TPU")
def test_fused_attention_compiled_tpu():
    q, k, v, mask, pe = _inputs(jnp.bfloat16, seed=3)
    want = np.asarray(_xla_attention(q, k, v, mask, pe), np.float32)
    got = np.asarray(fused_attention(q, k, v, mask, pe, num_heads=H),
                     np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
