"""Int8 weight-only parameter storage for the inference samplers.

The reverse-diffusion samplers re-read the decoder weight set every scan
step, and the sampler step is HBM-bandwidth-bound (BENCHMARKS.md floor
analysis: ~80% of the v5e HBM peak; the r4 bf16_matmul cast bought 9-21%
by halving that stream). Storing the >=2-D kernels as int8 + a
per-output-channel scale halves the weight bytes AGAIN — the one
remaining storage lever the roofline identifies (VERDICT r4 #2).

Scheme: per-output-channel symmetric quantization. For a kernel of shape
(..., in, out) the scale is amax over the contraction axis (axis -2),
kept per output channel (and per stacked layer for scan-layers' 3-D
(L, in, out) kernels): q = round(w / scale) in [-127, 127] stored int8,
dequantized as q * scale in the model's compute dtype right where the
weights are consumed — INSIDE the sampler's scan body, so XLA streams
int8 (+ tiny scales) from HBM per step and the dequant multiply fuses
into the consumer matmul's prologue.

Quality: unlike "bf16_matmul" (bit-identical to the in-program bf16
round of f32 kernels), int8 CHANGES the weights (~0.4% rms per kernel).
It ships only behind --params_dtype int8_matmul, gated by the measured
distribution-level quality harness (tests/test_sampler_quality.py bounds
and the flagship TV/class-accuracy pins — see BENCHMARKS.md round 5).

The reference has no storage-precision lever at all — its only speed
knob is the lossy STEP stride (structure_model/sample.py:16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_Q = "__q8__"
_S = "__q8_scale__"


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and _Q in x


def is_quantized(params) -> bool:
    """True if any leaf of the tree is an int8-quantized kernel."""
    found = False

    def probe(x):
        nonlocal found
        found = found or _is_qleaf(x)
        return x

    jax.tree.map(probe, params, is_leaf=_is_qleaf)
    return found


def quantize_params_int8(params, dequant_dtype=jnp.bfloat16):
    """Replace every floating >=2-D kernel leaf with an int8 packed dict.

    1-D leaves (biases, LayerNorm/adaLN affines) stay untouched in f32 —
    the r4 flagship pin showed rounding THOSE is what collapses structure
    quality (BENCHMARKS.md "bf16 parameter storage"); the kernels are
    where the bytes are anyway (>99% of the 146M model).
    """

    def q(x):
        if not (hasattr(x, "dtype")
                and jnp.issubdtype(x.dtype, jnp.floating)) or x.ndim < 2:
            return x
        w = jnp.asarray(x, jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        qv = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {_Q: qv, _S: scale.astype(dequant_dtype)}

    return jax.tree.map(q, params)


def dequantize_params(params):
    """Materialize compute-dtype kernels from packed int8 leaves.

    Pure pass-through for unquantized trees (no ops inserted). Call
    INSIDE the jitted sampler — and inside the scan body for the weights
    the loop re-reads — so the HBM-resident form stays int8; the
    dequantized product is a loop-local value the fusion consumes.
    """

    def dq(x):
        if _is_qleaf(x):
            return x[_Q].astype(x[_S].dtype) * x[_S]
        return x

    return jax.tree.map(dq, params, is_leaf=_is_qleaf)
