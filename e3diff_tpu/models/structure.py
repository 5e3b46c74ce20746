"""Structure (backbone-angle) denoiser: conditional BERT encoder-decoder.

Rebuild of ConditionalBertForDiffusionBase (structure_model/model.py:157-231):

  receptor branch: FeatureEmbedding(angles 8) + FeatureEmbedding(seq 20)
                   -> SELayer(angles, cond=seq) -> 12-layer encoder
  ligand branch:   FeatureEmbedding(angles 8) + GaussianFourier(timestep)
                   -> SELayer(angles, cond=time) -> 12-layer decoder with
                   cross-attention to the encoder output
  head:            MLPHead(768 -> 8) predicting epsilon

Position information enters only through relative_key attention (the
reference computes absolute position ids and never uses them — SURVEY.md
Q6; we simply don't compute them).

The receptor encoder is timestep-independent, so ``encode_receptor`` /
``decode`` are exposed separately: samplers encode the pocket ONCE and run
only the decoder inside the T-step scan (the reference re-encodes the
receptor on every one of its 1000 sampling steps — pure waste; identical
numerics). ``__call__`` composes both for training."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from e3diff_tpu.models.config import TransformerConfig
from e3diff_tpu.models.blocks import (
    FeatureEmbedding,
    GaussianFourierProjection,
    MLPHead,
    SELayer,
    TransformerStack,
    extend_attention_mask,
)


class StructureDenoiser(nn.Module):
    encoder_config: TransformerConfig
    decoder_config: TransformerConfig
    n_features: int = 8
    n_aa: int = 20

    def setup(self):
        enc_cfg, dec_cfg = self.encoder_config, self.decoder_config
        self.receptor_angle_emb = FeatureEmbedding(
            enc_cfg, self.n_features, name="receptor_angle_emb")
        self.receptor_seq_emb = FeatureEmbedding(
            enc_cfg, self.n_aa, name="receptor_seq_emb")
        self.receptor_emb = SELayer(enc_cfg, name="receptor_emb")
        self.encoder = TransformerStack(enc_cfg, name="encoder")
        self.ligand_angle_emb = FeatureEmbedding(
            dec_cfg, self.n_features, name="ligand_angle_emb")
        self.timestep_projector = GaussianFourierProjection(
            dec_cfg, name="timestep_projector")
        self.timestep_emb = SELayer(dec_cfg, name="timestep_emb")
        self.decoder = TransformerStack(dec_cfg, name="decoder")
        self.angles_predictor = MLPHead(
            dec_cfg, self.n_features, name="angles_predictor")

    def encode_receptor(self, receptor_seq, receptor_angles, receptor_mask,
                        *, deterministic: bool = True):
        """Timestep-independent pocket encoding -> (B, L, H) memory."""
        enc_cfg = self.encoder_config
        rec_ext = extend_attention_mask(receptor_mask, enc_cfg.dtype)
        rec_angles = self.receptor_angle_emb(
            receptor_angles, deterministic=deterministic)
        rec_seq = self.receptor_seq_emb(
            receptor_seq, deterministic=deterministic)
        rec = self.receptor_emb(rec_angles, rec_seq, rec_ext,
                                deterministic=deterministic)
        return self.encoder(rec, rec_ext, deterministic=deterministic)

    def precompute_cross_kv(self, encoder_out):
        """Project every decoder layer's cross-attention k/v from the
        (timestep-independent) pocket encoding. Samplers compute this ONCE
        per batch and pass it to ``decode`` inside the T-step scan, saving
        2 matmuls x num_layers over the full receptor length per step
        (bit-identical numerics — the same Dense params are applied to the
        same memory, just hoisted out of the loop)."""
        return self.decoder(None, None, encoder_out, None, kv_only=True)

    def decode(self, timestep, noised_ligand_angles, ligand_mask,
               encoder_out, receptor_mask, *, deterministic: bool = True,
               cross_kv=None):
        """Denoise ligand angles against a precomputed pocket encoding.

        cross_kv: optional output of ``precompute_cross_kv`` — when given,
        the decoder reuses the cached k/v instead of re-projecting
        ``encoder_out`` (which is then only needed for the cache)."""
        dec_cfg = self.decoder_config
        lig_ext = extend_attention_mask(ligand_mask, dec_cfg.dtype)
        rec_ext = extend_attention_mask(receptor_mask, dec_cfg.dtype)
        lig = self.ligand_angle_emb(
            noised_ligand_angles, deterministic=deterministic)
        t_emb = self.timestep_projector(jnp.asarray(timestep))[:, None, :]
        lig = self.timestep_emb(lig, t_emb, lig_ext,
                                deterministic=deterministic)
        dec_out = self.decoder(lig, lig_ext,
                               None if cross_kv is not None else encoder_out,
                               rec_ext, deterministic=deterministic,
                               cross_kv=cross_kv)
        return self.angles_predictor(dec_out)

    def __call__(
        self,
        timestep,              # (B,) or (B,1) int/float diffusion step
        noised_ligand_angles,  # (B, L, 8)
        ligand_mask,           # (B, L) 0/1
        receptor_seq,          # (B, L, 20) one-hot
        receptor_angles,       # (B, L, 8)
        receptor_mask,         # (B, L) 0/1
        *,
        deterministic: bool = True,
    ):
        enc_out = self.encode_receptor(
            receptor_seq, receptor_angles, receptor_mask,
            deterministic=deterministic)
        return self.decode(
            timestep, noised_ligand_angles, ligand_mask, enc_out,
            receptor_mask, deterministic=deterministic)
