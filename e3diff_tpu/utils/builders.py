"""Glue: ExperimentConfig -> models, trainers, diffusions, datasets."""

from __future__ import annotations

import jax.numpy as jnp

from e3diff_tpu.data.dataset import LigandBindingSiteData, load_complexes
from e3diff_tpu.diffusion import D3PMDiffusion, GaussianAngleDiffusion
from e3diff_tpu.models import (
    SequenceDenoiser,
    StructureDenoiser,
    TransformerConfig,
)
from e3diff_tpu.ops import BlosumTransition, UniformTransition
from e3diff_tpu.utils.presets import ExperimentConfig


def transformer_configs(cfg: ExperimentConfig, init_style: str):
    base = dict(
        hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
        num_layers=cfg.num_hidden_layers,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_seq_len,
        dropout=cfg.dropout_p, attention_dropout=cfg.dropout_p,
        position_embedding_type=cfg.position_embedding_type,
        init_style=init_style,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
        scan_layers=cfg.scan_layers,
        remat=cfg.remat,
    )
    enc = TransformerConfig(**base, add_cross_attention=False)
    dec = TransformerConfig(**base, add_cross_attention=True)
    return enc, dec


def build_structure_model(cfg: ExperimentConfig) -> StructureDenoiser:
    enc, dec = transformer_configs(cfg, "torch_default")
    return StructureDenoiser(enc, dec)


def build_sequence_model(cfg: ExperimentConfig) -> SequenceDenoiser:
    enc, dec = transformer_configs(cfg, "xavier_all")
    return SequenceDenoiser(enc, dec)


def build_structure_diffusion(cfg: ExperimentConfig) -> GaussianAngleDiffusion:
    return GaussianAngleDiffusion.cosine(cfg.timesteps)


def build_sequence_diffusion(cfg: ExperimentConfig,
                             transition: str = "blosum") -> D3PMDiffusion:
    trans = (BlosumTransition() if transition == "blosum"
             else UniformTransition(20))
    return D3PMDiffusion.create(trans, timesteps=cfg.timesteps)


def build_dataset(cfg: ExperimentConfig, data_file: str,
                  split: str | None) -> LigandBindingSiteData:
    return LigandBindingSiteData(
        load_complexes(data_file), split,
        max_len=cfg.max_seq_len, pocket_ext=cfg.pocket_ext,
        ligand_max_len=cfg.ligand_max_len)
