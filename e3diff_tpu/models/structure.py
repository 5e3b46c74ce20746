"""Structure (backbone-angle) denoiser: conditional BERT encoder-decoder.

Rebuild of ConditionalBertForDiffusionBase (structure_model/model.py:157-231):

  receptor branch: FeatureEmbedding(angles 8) + FeatureEmbedding(seq 20)
                   -> SELayer(angles, cond=seq) -> 12-layer encoder
  ligand branch:   FeatureEmbedding(angles 8) + GaussianFourier(timestep)
                   -> SELayer(angles, cond=time) -> 12-layer decoder with
                   cross-attention to the encoder output
  head:            MLPHead(768 -> 8) predicting epsilon

Position information enters only through relative_key attention (the
reference computes absolute position ids and never uses them — SURVEY.md Q6;
we simply don't compute them)."""

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

    @nn.compact
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
        enc_cfg, dec_cfg = self.encoder_config, self.decoder_config
        lig_ext = extend_attention_mask(ligand_mask, dec_cfg.dtype)
        rec_ext = extend_attention_mask(receptor_mask, enc_cfg.dtype)

        # --- receptor encoder ---
        rec_angles = FeatureEmbedding(enc_cfg, self.n_features,
                                      name="receptor_angle_emb")(
            receptor_angles, deterministic=deterministic)
        rec_seq = FeatureEmbedding(enc_cfg, self.n_aa, name="receptor_seq_emb")(
            receptor_seq, deterministic=deterministic)
        rec = SELayer(enc_cfg, name="receptor_emb")(
            rec_angles, rec_seq, rec_ext, deterministic=deterministic)
        enc_out = TransformerStack(enc_cfg, name="encoder")(
            rec, rec_ext, deterministic=deterministic)

        # --- ligand decoder ---
        lig = FeatureEmbedding(dec_cfg, self.n_features, name="ligand_angle_emb")(
            noised_ligand_angles, deterministic=deterministic)
        t_emb = GaussianFourierProjection(dec_cfg, name="timestep_projector")(
            jnp.asarray(timestep))[:, None, :]
        lig = SELayer(dec_cfg, name="timestep_emb")(
            lig, t_emb, lig_ext, deterministic=deterministic)
        dec_out = TransformerStack(dec_cfg, name="decoder")(
            lig, lig_ext, enc_out, rec_ext, deterministic=deterministic)

        return MLPHead(dec_cfg, self.n_features, name="angles_predictor")(dec_out)
