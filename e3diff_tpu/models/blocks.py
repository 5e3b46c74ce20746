"""Shared neural blocks for both denoisers, implemented once in flax.linen
(the reference copy-pastes these between structure_model/model.py:27-154 and
sequence_model/model.py:26-153).

Numerical semantics mirror the torch originals exactly (verified by the
weight-porting parity tests in tests/test_model_parity.py):

* attention with HF BERT ``relative_key`` position scores — learned
  per-layer distance embedding of size (2*max_pos-1, head_dim), relative
  scores added to the raw QK logits *before* the 1/sqrt(d) scaling;
  cross-attention never uses relative scores (HF instantiates it with
  position_embedding_type="absolute").
* SELayer: DiT-style adaLN block (shift/scale/gate x2) whose *first* adaLN
  linear is zero-initialized (reference quirk — most DiT implementations
  zero the last); norm1/norm2 are affine-free LayerNorms with torch-default
  eps=1e-5, while all residual-branch LayerNorms use eps=1e-12.
* additive attention masks: (1 - mask) * -10000, HF convention.

Everything is shape-static and fuses cleanly under XLA; sequence lengths
are 64/128 so plain einsum attention saturates the MXU without a custom
kernel (a fused Pallas attention is available behind
``e3diff_tpu.ops.pallas_kernels.fused_attention`` once benchmarks justify it).
"""

from __future__ import annotations

import math


import flax.linen as nn
import jax
import jax.numpy as jnp

from e3diff_tpu.models.config import TransformerConfig


# ---------------------------------------------------------------------------
# Initializers replicating torch defaults
# ---------------------------------------------------------------------------

def torch_linear_kernel_init(key, shape, dtype):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax kernel shape is (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init(key, shape, dtype):
    return nn.initializers.xavier_uniform()(key, shape, dtype)


def make_dense(cfg: TransformerConfig, features: int, name: str,
               fan_in: int, zero_init: bool = False) -> nn.Dense:
    """Dense layer with init matching the reference's init_style."""
    if zero_init:
        kernel_init = nn.initializers.zeros
        bias_init = nn.initializers.zeros
    elif cfg.init_style == "xavier_all":
        kernel_init = xavier_uniform_init
        bias_init = nn.initializers.zeros
    else:  # torch_default
        kernel_init = torch_linear_kernel_init
        bias_init = torch_linear_bias_init_for(fan_in)
    return nn.Dense(features, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    kernel_init=kernel_init, bias_init=bias_init, name=name)


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------

def extend_attention_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, L) 0/1 mask -> (B, 1, 1, L) additive mask with -10000 at padding.

    Matches _exetend_attention_mask (structure_model/model.py:226-231)."""
    mask = mask.astype(dtype)
    return (1.0 - mask)[:, None, None, :] * -10000.0


# ---------------------------------------------------------------------------
# Core blocks
# ---------------------------------------------------------------------------

class MultiHeadAttention(nn.Module):
    """QKV attention with optional HF relative_key position scores.

    Mirrors HF BertSelfAttention (transformers modeling_bert): relative
    scores are added to raw logits before dividing by sqrt(head_dim).
    """

    config: TransformerConfig
    relative: bool = True
    is_cross: bool = False

    @nn.compact
    def __call__(self, x, kv, extended_mask, *, deterministic: bool = True,
                 cached_kv=None, kv_only: bool = False):
        cfg = self.config
        h, nh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

        if kv_only:
            # project ONLY k/v from the (timestep-independent) memory so
            # samplers can cache them across the reverse-diffusion scan
            b, lk, _ = kv.shape
            k = make_dense(cfg, h, "key", fan_in=h)(kv).reshape(b, lk, nh, hd)
            v = make_dense(cfg, h, "value", fan_in=h)(kv).reshape(b, lk, nh, hd)
            return k, v

        b, lq, _ = x.shape
        q = make_dense(cfg, h, "query", fan_in=h)(x)
        q = q.reshape(b, lq, nh, hd)
        if cached_kv is not None:
            k, v = cached_kv            # (B, Lk, nh, hd) each, precomputed
            lk = k.shape[1]
        else:
            lk = kv.shape[1]
            k = make_dense(cfg, h, "key", fan_in=h)(kv)
            v = make_dense(cfg, h, "value", fan_in=h)(kv)
            # contract directly in (B, L, H, D) layout — no head transposes
            # (XLA materializes .transpose copies; dot_general batch dims
            # don't need them)
            k = k.reshape(b, lk, nh, hd)
            v = v.reshape(b, lk, nh, hd)

        pe = None
        if self.relative and cfg.position_embedding_type == "relative_key":
            max_pos = cfg.max_position_embeddings
            # torch nn.Embedding default init: N(0, 1)
            rel = nn.Embed(2 * max_pos - 1, hd,
                           dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                           embedding_init=nn.initializers.normal(1.0),
                           name="distance_embedding")
            distance = (jnp.arange(lq)[:, None] - jnp.arange(lk)[None, :])
            pe = rel(distance + max_pos - 1)  # (Lq, Lk, hd)

        # blockdiag is a SELF-attention layout (its win is small Lq*H; at
        # cross-attention's Lk=64 the H-times-larger score tensor loses —
        # measured, BENCHMARKS.md), so cross-attention always uses einsum
        if cfg.self_attention_impl == "blockdiag" and not self.is_cross:
            return self._blockdiag(q, k, v, pe, extended_mask,
                                   deterministic=deterministic)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if pe is not None:
            scores = scores + jnp.einsum("blhd,lrd->bhlr", q, pe)

        scores = scores / math.sqrt(hd)
        if extended_mask is not None:
            scores = scores + extended_mask
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)

        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return ctx.reshape(b, lq, h)

    def _blockdiag(self, q, k, v, pe, extended_mask, *, deterministic):
        """Stacked-head attention: rows are (l, h) pairs so ALL heads'
        scores come from ONE 3D batched matmul with a constant same-head
        block mask — no 4D tensors or head transposes anywhere (ROADMAP
        item 1d). exp(-inf) = 0 at cross-head entries, so the softmax is
        exactly the per-head softmax. H-times redundant score FLOPs —
        profitable only when Lq*H stays small; gate via config."""
        cfg = self.config
        nh, hd = cfg.num_heads, cfg.head_dim
        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]

        qf = q.reshape(b, lq * nh, hd)
        kf = k.reshape(b, lk * nh, hd)
        vf = v.reshape(b, lk * nh, hd)
        scores = jnp.einsum("bqd,bkd->bqk", qf, kf)      # (B, LqH, LkH)

        # relative scores and padding mask broadcast over the trailing head
        # index through a free (B, LqH, Lk, H) view
        s4 = scores.reshape(b, lq * nh, lk, nh)
        if pe is not None:
            qpe = jnp.einsum("blhd,lrd->blhr", q, pe)    # (B, Lq, H, Lk)
            s4 = s4 + qpe.reshape(b, lq * nh, lk)[..., None]
        s4 = s4 / math.sqrt(hd)
        if extended_mask is not None:
            s4 = s4 + extended_mask[:, 0, 0, :][:, None, :, None]
        scores = s4.reshape(b, lq * nh, lk * nh)

        same_head = jnp.equal((jnp.arange(lq * nh) % nh)[:, None],
                              (jnp.arange(lk * nh) % nh)[None, :])
        scores = jnp.where(same_head, scores, -jnp.inf)

        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_dropout)(probs,
                                                  deterministic=deterministic)
        ctx = jnp.einsum("bqk,bkd->bqd", probs, vf)      # rows still (l, h)
        return ctx.reshape(b, lq, nh * hd)


class AttentionBlock(nn.Module):
    """BertAttention: self/cross attention + output projection + residual LN.

    kv=None -> self-attention (with relative scores when configured);
    kv given -> cross-attention (absolute — no relative scores, matching
    HF BertLayer.crossattention)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, kv, extended_mask, *, deterministic: bool = True,
                 cached_kv=None, kv_only: bool = False):
        cfg = self.config
        if kv_only:
            return MultiHeadAttention(cfg, relative=False, is_cross=True,
                                      name="self")(
                None, kv, None, deterministic=deterministic, kv_only=True)
        is_cross = kv is not None or cached_kv is not None
        ctx = MultiHeadAttention(cfg, relative=not is_cross,
                                 is_cross=is_cross, name="self")(
            x, kv if is_cross else x, extended_mask, deterministic=deterministic,
            cached_kv=cached_kv)
        out = make_dense(cfg, cfg.hidden_size, "output_dense", fan_in=cfg.hidden_size)(ctx)
        out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="output_norm")(out + x)


class TransformerLayer(nn.Module):
    """BertLayer: self-attn [+ cross-attn] + gelu MLP, all with residual LN.

    `deterministic` is positional-or-keyword so the layer can sit under
    nn.remat/nn.scan (lifted transforms take it as a static positional)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, extended_mask, enc_out=None, enc_mask=None,
                 deterministic: bool = True, cross_kv=None,
                 kv_only: bool = False):
        cfg = self.config
        if kv_only:
            return AttentionBlock(cfg, name="crossattention")(
                None, enc_out, None, deterministic=deterministic, kv_only=True)
        x = AttentionBlock(cfg, name="attention")(
            x, None, extended_mask, deterministic=deterministic)
        if cfg.add_cross_attention and (enc_out is not None
                                        or cross_kv is not None):
            x = AttentionBlock(cfg, name="crossattention")(
                x, enc_out, enc_mask, deterministic=deterministic,
                cached_kv=cross_kv)
        y = make_dense(cfg, cfg.intermediate_size, "intermediate_dense",
                       fan_in=cfg.hidden_size)(x)
        y = jax.nn.gelu(y, approximate=False)
        y = make_dense(cfg, cfg.hidden_size, "output_dense",
                       fan_in=cfg.intermediate_size)(y)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="output_norm")(y + x)


def _remat_policy(name: str):
    if name == "layer":
        return None  # save nothing, recompute the whole layer
    if name == "dots":
        # save MXU outputs, recompute elementwise/softmax in the backward
        return jax.checkpoint_policies.checkpoint_dots
    raise ValueError(f"unknown remat policy {name!r}")


class _LayerScanBody(nn.Module):
    """nn.scan carry adapter: TransformerLayer returning (carry, ys)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, extended_mask, enc_out, enc_mask, deterministic,
                 cross_kv=None, kv_only=False):
        if kv_only:
            kv = TransformerLayer(self.config, name="layer")(
                x, extended_mask, enc_out, enc_mask, deterministic,
                kv_only=True)
            return x, kv
        x = TransformerLayer(self.config, name="layer")(
            x, extended_mask, enc_out, enc_mask, deterministic, cross_kv)
        return x, None


class TransformerStack(nn.Module):
    """BertEncoder: a stack of TransformerLayers.

    cfg.remat wraps each layer in jax.checkpoint (numerics unchanged);
    cfg.scan_layers compiles ONE scanned layer body instead of num_layers
    unrolled copies — params gain a leading layer axis under
    "layers"/"layer" (converters in models/restack.py)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, extended_mask, enc_out=None, enc_mask=None, *,
                 deterministic: bool = True, cross_kv=None,
                 kv_only: bool = False):
        """kv_only=True: project each layer's cross-attention k/v from
        ``enc_out`` and return them WITHOUT running the stack — samplers
        cache these across the reverse-diffusion scan when the memory is
        timestep-independent (structure model; the sequence model's
        receptor fuse takes the timestep, so it cannot cache). Layout:
        tuple-of-(k, v) per layer (unrolled) or (k, v) with a leading
        layer axis (scan_layers); produce and consume with the SAME
        config. cross_kv: the cached value, fed back into the layers in
        place of the k/v projections — numerics are bit-identical."""
        cfg = self.config
        if cfg.scan_layers:
            body = _LayerScanBody
            if cfg.remat != "none":
                body = nn.remat(body, policy=_remat_policy(cfg.remat),
                                static_argnums=(5, 7), prevent_cse=False)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 4 + (0, nn.broadcast),
                length=cfg.num_layers,
            )(cfg, name="layers")
            x, ys = scanned(x, extended_mask, enc_out, enc_mask,
                            deterministic, cross_kv, kv_only)
            return ys if kv_only else x

        layer_cls = TransformerLayer
        if cfg.remat != "none":
            layer_cls = nn.remat(TransformerLayer,
                                 policy=_remat_policy(cfg.remat),
                                 static_argnums=(5, 7))
        if kv_only:
            return tuple(
                layer_cls(cfg, name=f"layer_{i}")(
                    x, extended_mask, enc_out, enc_mask, deterministic,
                    None, True)
                for i in range(cfg.num_layers))
        for i in range(cfg.num_layers):
            # kv_only passed positionally so the arity matches
            # static_argnums under nn.remat (flax offsets by +1 for self).
            x = layer_cls(cfg, name=f"layer_{i}")(
                x, extended_mask, enc_out, enc_mask, deterministic,
                None if cross_kv is None else cross_kv[i], False)
        return x


class SELayer(nn.Module):
    """DiT-style adaLN-zero block (reference SELayer,
    structure_model/model.py:27-67; per arXiv:2401.13858).

    x: (B, L, H) tokens; c: (B, L, H) or (B, 1, H) conditioning.
    The FIRST adaLN linear is zero-initialized in the reference's torch
    constructor; when the enclosing model uses init_style="xavier_all" the
    reference immediately overwrites that with xavier (sequence model),
    except where explicitly re-zeroed — controlled here by zero_init_adaln.
    """

    config: TransformerConfig
    zero_init_adaln: bool = True

    @nn.compact
    def __call__(self, x, c, extended_mask, *, deterministic: bool = True):
        cfg = self.config
        h = cfg.hidden_size

        a = make_dense(cfg, h, "adaln_0", fan_in=h,
                       zero_init=self.zero_init_adaln)(c)
        a = jax.nn.silu(a)
        a = make_dense(cfg, 6 * h, "adaln_1", fan_in=h)(a)
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(a, 6, axis=-1)

        def modulate(y, shift, scale):
            return y * (1 + scale) + shift

        attn_out = AttentionBlock(cfg, name="attn")(
            x, None, extended_mask, deterministic=deterministic)
        # norm1/norm2: torch LayerNorm(elementwise_affine=False), default eps 1e-5
        norm1 = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                             dtype=cfg.dtype, name="norm1")
        x = x + gate_msa * modulate(norm1(attn_out), shift_msa, scale_msa)

        mlp_dim = int(h * cfg.mlp_ratio)
        y = make_dense(cfg, mlp_dim, "mlp_dense1", fan_in=h)(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        y = make_dense(cfg, h, "mlp_dense2", fan_in=mlp_dim)(y)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        norm2 = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                             dtype=cfg.dtype, name="norm2")
        x = x + gate_mlp * modulate(norm2(y), shift_mlp, scale_mlp)
        return x


class GaussianFourierProjection(nn.Module):
    """Fixed random Fourier features for the timestep
    (structure_model/model.py:69-98). W ~ N(0, (2*pi)^2) is a non-trainable
    buffer in the reference; here it is a parameter excluded from gradients
    via stop_gradient (and from weight decay via the optimizer mask)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, t):
        cfg = self.config
        w = self.param("W", nn.initializers.normal(stddev=2 * math.pi),
                       (cfg.hidden_size // 2,), cfg.param_dtype)
        w = jax.lax.stop_gradient(w)
        t = t.reshape(-1).astype(cfg.dtype)  # (B,)
        proj = t[:, None] * w[None, :] * 2 * math.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class FeatureEmbedding(nn.Module):
    """Linear -> LayerNorm -> Dropout input embedding
    (reference BertEmbeddings, structure_model/model.py:100-118)."""

    config: TransformerConfig
    in_features: int

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.config
        y = make_dense(cfg, cfg.hidden_size, "linear", fan_in=self.in_features)(
            x.astype(cfg.dtype))
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="norm")(y)
        return nn.Dropout(cfg.dropout)(y, deterministic=deterministic)


class MLPHead(nn.Module):
    """dense -> gelu -> LayerNorm -> dense prediction head
    (AnglesPredictor / AminoAcidPredictor, structure_model/model.py:120-154)."""

    config: TransformerConfig
    d_out: int

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        y = make_dense(cfg, cfg.hidden_size, "dense1", fan_in=cfg.hidden_size)(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.LayerNorm(epsilon=1e-12, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="norm")(y)
        return make_dense(cfg, self.d_out, "dense2", fan_in=cfg.hidden_size)(y)
