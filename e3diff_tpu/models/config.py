"""Typed model/transformer configuration (replaces the reference's module-level
CONFIG dicts + HF BertConfig pairs, structure_model/train_model.py:18-39)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Configuration of one transformer stack (mirrors the knobs the reference
    sets on HF BertConfig at structure_model/train_model.py:124-148)."""

    hidden_size: int = 768
    num_heads: int = 12
    num_layers: int = 12
    intermediate_size: int = 1024
    max_position_embeddings: int = 128
    dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    # "relative_key" (learned relative position scores added to attention
    # logits, HF semantics) or "absolute" (no positional term — the reference
    # models have no absolute position embeddings at all, SURVEY.md Q6).
    position_embedding_type: str = "relative_key"
    add_cross_attention: bool = False
    mlp_ratio: float = 4.0  # SELayer MLP width multiplier (not intermediate_size)
    # torch_default: kaiming-uniform Linears like bare torch modules (structure
    # model); xavier_all: xavier-uniform weights + zero bias everywhere
    # (sequence model's initialize_weights, sequence_model/model.py:183-198).
    init_style: str = "torch_default"
    dtype: Any = jnp.float32      # activation/compute dtype (bf16 for TPU speed)
    param_dtype: Any = jnp.float32
    # Rematerialization of transformer layers in the backward pass:
    # "none" | "layer" (recompute everything) | "dots" (save matmul outputs,
    # recompute elementwise — usually the TPU sweet spot). Numerics identical.
    remat: str = "none"
    # Compile the stack as ONE nn.scan'ed layer body instead of num_layers
    # unrolled copies (params gain a leading layer axis — see
    # models/restack.py for the per-layer <-> stacked converters that keep
    # torch-ported checkpoints loadable). Cuts compile time; same numerics.
    scan_layers: bool = False
    # Self-attention score layout: "einsum" (per-head batched dots in
    # (B,L,H,D)) or "blockdiag" ((B, L*H, D) rows with a constant
    # same-head block mask — ONE 3D matmul, no 4D tensors; wins at small
    # Lq where reshapes dominate, loses at Lk=64+ where the H-times-larger
    # score tensor costs more bandwidth than it saves — see ROADMAP).
    self_attention_impl: str = "einsum"

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_heads == 0
        return self.hidden_size // self.num_heads


def structure_model_configs(
    max_seq_len: int = 128,
    num_layers: int = 12,
    dtype=jnp.float32,
) -> tuple[TransformerConfig, TransformerConfig]:
    """Encoder/decoder configs of the structure (angle) denoiser
    (structure_model/train_model.py:18-39, :124-148)."""
    base = dict(
        hidden_size=768, num_heads=12, num_layers=num_layers,
        intermediate_size=1024, max_position_embeddings=max_seq_len,
        dropout=0.1, attention_dropout=0.1,
        position_embedding_type="relative_key",
        init_style="torch_default", dtype=dtype,
    )
    enc = TransformerConfig(**base, add_cross_attention=False)
    dec = TransformerConfig(**base, add_cross_attention=True)
    return enc, dec


def sequence_model_configs(
    max_seq_len: int = 128,
    num_layers: int = 6,
    dtype=jnp.float32,
) -> tuple[TransformerConfig, TransformerConfig]:
    """Encoder/decoder configs of the sequence (D3PM) denoiser
    (sequence_model/train_model.py:17-39, :118-142)."""
    base = dict(
        hidden_size=768, num_heads=12, num_layers=num_layers,
        intermediate_size=1024, max_position_embeddings=max_seq_len,
        dropout=0.1, attention_dropout=0.1,
        position_embedding_type="relative_key",
        init_style="xavier_all", dtype=dtype,
    )
    enc = TransformerConfig(**base, add_cross_attention=False)
    dec = TransformerConfig(**base, add_cross_attention=True)
    return enc, dec
