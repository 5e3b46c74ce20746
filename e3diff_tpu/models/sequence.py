"""Sequence (inverse-folding) denoiser for the discrete D3PM.

Rebuild of sequence_model/model.py:156-253 with the reference's
behavior-defining quirks kept (SURVEY.md Q7/Q9):

  ligand branch:   seq FeatureEmbedding(20) + angle FeatureEmbedding(8)
                   (+ timestep Fourier embedding ADDED to the angle/cond
                   embedding) -> SELayer(seq, cond=angle+time)
  receptor branch: built the same way but fused through the SAME SELayer
                   instance as the ligand (Q7 — the reference creates
                   receptor_feature_emb and never calls it; we share the
                   module and do not materialize the dead weights, so our
                   param count excludes the unused ~11M).
  decoder:         6-layer cross-attention stack (ligand queries, receptor
                   memory), then SELayer conditioned on the timestep
                   ("decoder_normalize", adaLN re-zero-initialized), then
                   MLPHead(768 -> 20).

No encoder transformer stack exists — the receptor is encoded only by
embeddings + the shared SELayer (reference builds an encoder_config but
never instantiates a BertEncoder from it).

Timestep scale quirk Q9: training conditions on t/T in [0,1], sampling on
the raw integer step; this module just embeds whatever float it is handed,
as the reference does."""

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


class SequenceDenoiser(nn.Module):
    encoder_config: TransformerConfig   # used for embeddings + shared SELayer
    decoder_config: TransformerConfig
    n_classes: int = 20
    n_angle_features: int = 8

    @nn.compact
    def __call__(
        self,
        timestep,            # (B,) or (B,1) float: t/T at train, int step at sampling
        noised_ligand_seq,   # (B, L, 20) one-hot
        ligand_angles,       # (B, L, 8)
        ligand_mask,         # (B, L) 0/1
        receptor_seq,        # (B, L, 20) one-hot
        receptor_angles,     # (B, L, 8)
        receptor_mask,       # (B, L) 0/1
        *,
        deterministic: bool = True,
    ):
        enc_cfg, dec_cfg = self.encoder_config, self.decoder_config
        lig_ext = extend_attention_mask(ligand_mask, dec_cfg.dtype)
        rec_ext = extend_attention_mask(receptor_mask, enc_cfg.dtype)

        t_emb = GaussianFourierProjection(dec_cfg, name="timestep_projector")(
            jnp.asarray(timestep))[:, None, :]

        # ligand fuse: x = seq embedding, cond = angle embedding + time
        lig_seq = FeatureEmbedding(enc_cfg, self.n_classes,
                                   name="ligand_seq_embedding")(
            noised_ligand_seq, deterministic=deterministic)
        lig_angle = FeatureEmbedding(enc_cfg, self.n_angle_features,
                                     name="ligand_angle_embedding")(
            ligand_angles, deterministic=deterministic) + t_emb
        # Q7: one SELayer instance serves BOTH branches. In the sequence
        # model the reference's xavier re-init overwrites the SELayer's
        # zero adaLN init, hence zero_init_adaln=False here.
        fuse = SELayer(enc_cfg, zero_init_adaln=(enc_cfg.init_style != "xavier_all"),
                       name="ligand_feature_emb")
        lig = fuse(lig_seq, lig_angle, lig_ext, deterministic=deterministic)

        rec_seq = FeatureEmbedding(
            enc_cfg, self.n_classes, name="receptor_seq_embedding")(
            receptor_seq, deterministic=deterministic)
        rec_angle = FeatureEmbedding(enc_cfg, self.n_angle_features,
                                     name="receptor_angle_embedding")(
            receptor_angles, deterministic=deterministic) + t_emb
        rec = fuse(rec_seq, rec_angle, rec_ext, deterministic=deterministic)

        dec_out = TransformerStack(dec_cfg, name="decoder")(
            lig, lig_ext, rec, rec_ext, deterministic=deterministic)
        dec_out = SELayer(dec_cfg, zero_init_adaln=True, name="decoder_normalize")(
            dec_out, t_emb, lig_ext, deterministic=deterministic)

        return MLPHead(dec_cfg, self.n_classes, name="amino_acid_predictor")(dec_out)
