"""Pallas TPU kernels for the sampling hot path.

Motivation (profiled on v5e, see BENCHMARKS.md): at the bucketed sampling
config the XLA transformer step is overhead-dominated — per step ~77
reshape ops (head splitting relayouts), ~42 convert+reduce fusions
(LayerNorm/softmax statistics), and scores/probs HBM round-trips, against
only ~0.76 ms of actual matmul time. These kernels fuse that overhead away:

* ``fused_attention``: complete multi-head attention core — consumes Q, K,
  V in the FLAT (B, L, H*D) layout (no head reshapes ever materialize),
  computes per-head scores + HF relative_key bias + additive mask +
  float32 softmax + P@V entirely in VMEM, and writes the flat context.
* ``fused_layernorm``: residual-add + LayerNorm(scale, bias) in one pass.

Forward-only (used on the sampling path; training keeps the XLA path for
dropout + autodiff). Numerics match the XLA path to bf16 tolerance —
tests/test_pallas_kernels.py checks both interpret mode (exact) and
compiled TPU execution.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, pe_ref, o_ref, *,
                      num_heads: int, head_dim: int, scale: float):
    bb, lq, f = q_ref.shape
    lk = k_ref.shape[1]
    for b in range(bb):
        q2 = q_ref[b]                      # (Lq, F) bf16
        k2 = k_ref[b]
        v2 = v_ref[b]
        mask_row = mask_ref[b, :]          # (Lk,) additive f32
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qh = q2[:, sl]                 # (Lq, D)
            kh = k2[:, sl]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (Lq, Lk)
            if pe_ref is not None:
                # HF relative_key: s += sum_d q[l,d] * pe[l,r,d]
                pe = pe_ref[:]                             # (Lq, Lk, D)
                s = s + jnp.sum(
                    pe * qh.astype(pe.dtype)[:, None, :], axis=-1)
            s = s * scale + mask_row[None, :]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v2.dtype), v2[:, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[b, :, sl] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_b",
                                             "interpret"))
def fused_attention(q, k, v, mask_add, pe=None, *, num_heads: int,
                    block_b: int = 16, interpret: bool = False):
    """Multi-head attention core in flat head layout.

    q: (B, Lq, H*D); k, v: (B, Lk, H*D); mask_add: (B, Lk) additive
    (0 keep / -10000 drop); pe: optional (Lq, Lk, D) relative-position
    table (HF relative_key, shared across heads within a layer).
    Returns (B, Lq, H*D) in q.dtype. Scaling matches HF: (scores + rel
    bias) / sqrt(D) + mask.
    """
    b, lq, f = q.shape
    lk = k.shape[1]
    head_dim = f // num_heads
    block_b = min(block_b, b)
    while b % block_b:          # largest divisor of b not above block_b
        block_b -= 1
    grid = (b // block_b,)

    in_specs = [
        pl.BlockSpec((block_b, lq, f), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, lk, f), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, lk, f), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, lk), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, mask_add.astype(jnp.float32)]
    if pe is not None:
        in_specs.append(pl.BlockSpec((lq, lk, head_dim), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(pe.astype(jnp.float32))
        kernel = functools.partial(
            _attention_kernel, num_heads=num_heads, head_dim=head_dim,
            scale=1.0 / math.sqrt(head_dim))
    else:
        def kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, **kw):
            _attention_kernel(q_ref, k_ref, v_ref, mask_ref, None, o_ref,
                              **kw)
        kernel = functools.partial(
            kernel, num_heads=num_heads, head_dim=head_dim,
            scale=1.0 / math.sqrt(head_dim))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, lq, f), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, lq, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def _layernorm_kernel(x_ref, res_ref, scale_ref, bias_ref, o_ref, *,
                      eps: float):
    x = x_ref[:].astype(jnp.float32)
    if res_ref is not None:
        x = x + res_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows",
                                             "interpret"))
def fused_layernorm(x, scale, bias, residual=None, *, eps: float = 1e-12,
                    block_rows: int = 512, interpret: bool = False):
    """LayerNorm((x [+ residual])) * scale + bias over the last dim.

    x: (..., F); scale/bias: (F,). Single fused pass (stats in f32)."""
    orig_shape = x.shape
    f = orig_shape[-1]
    rows = x.size // f
    x2 = x.reshape(rows, f)
    block_rows = min(block_rows, rows)
    if rows % block_rows:
        block_rows = rows
    grid = (rows // block_rows,)

    in_specs = [pl.BlockSpec((block_rows, f), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [x2]
    if residual is not None:
        in_specs.append(pl.BlockSpec((block_rows, f), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual.reshape(rows, f))
        kernel = functools.partial(_layernorm_kernel, eps=eps)
    else:
        def kernel(x_ref, scale_ref, bias_ref, o_ref, **kw):
            _layernorm_kernel(x_ref, None, scale_ref, bias_ref, o_ref, **kw)
        kernel = functools.partial(kernel, eps=eps)

    in_specs += [
        pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    args += [scale, bias]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, f), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out.reshape(orig_shape)
