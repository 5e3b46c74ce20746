"""Convert reference torch state_dicts to e3diff_tpu flax parameter trees.

Serves two purposes:
* numerical parity tests (tests/test_model_parity.py) that validate our
  transformer blocks against the torch/HF originals layer by layer;
* a converter for the reference's published pretrained weights
  (README links in /root/reference/README.md), so users can bring trained
  models to TPU without retraining.

Input is a mapping of torch parameter names to numpy arrays (call
``{k: v.numpy() for k, v in model.state_dict().items()}`` host-side; torch
is never needed beyond producing that dict).

Key transforms: torch Linear weight (out,in) -> flax kernel (in,out)
transpose; LayerNorm weight->scale; Embedding weight -> embedding.
"""

from __future__ import annotations

import numpy as np


def _j(p, s):
    """Join torch name parts, tolerating an empty prefix."""
    return f"{p}.{s}" if p else s


def _lin(sd, p):
    return {"kernel": np.ascontiguousarray(sd[f"{p}.weight"].T),
            "bias": sd[f"{p}.bias"]}


def _ln(sd, p):
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def port_feature_embedding(sd, p):
    """Reference BertEmbeddings -> FeatureEmbedding."""
    return {"linear": _lin(sd, f"{p}.linear"), "norm": _ln(sd, f"{p}.LayerNorm")}


def port_attention_block(sd, p):
    """torch BertAttention '{p}.self.*' / '{p}.output.*' -> AttentionBlock."""
    self_tree = {
        "query": _lin(sd, f"{p}.self.query"),
        "key": _lin(sd, f"{p}.self.key"),
        "value": _lin(sd, f"{p}.self.value"),
    }
    if f"{p}.self.distance_embedding.weight" in sd:
        self_tree["distance_embedding"] = {
            "embedding": sd[f"{p}.self.distance_embedding.weight"]}
    return {
        "self": self_tree,
        "output_dense": _lin(sd, f"{p}.output.dense"),
        "output_norm": _ln(sd, f"{p}.output.LayerNorm"),
    }


def port_selayer(sd, p):
    """Reference SELayer -> SELayer (adaLN Sequential indices 0/2; mlp 0/3)."""
    return {
        "adaln_0": _lin(sd, f"{p}.adaLN_modulation.0"),
        "adaln_1": _lin(sd, f"{p}.adaLN_modulation.2"),
        "attn": port_attention_block(sd, f"{p}.attn"),
        "mlp_dense1": _lin(sd, f"{p}.mlp.0"),
        "mlp_dense2": _lin(sd, f"{p}.mlp.3"),
    }


def port_transformer_layer(sd, p, cross: bool):
    """torch BertLayer -> TransformerLayer."""
    tree = {
        "attention": port_attention_block(sd, _j(p, "attention")),
        "intermediate_dense": _lin(sd, _j(p, "intermediate.dense")),
        "output_dense": _lin(sd, _j(p, "output.dense")),
        "output_norm": _ln(sd, _j(p, "output.LayerNorm")),
    }
    if cross:
        tree["crossattention"] = port_attention_block(sd, _j(p, "crossattention"))
    return tree


def port_transformer_stack(sd, p, num_layers: int, cross: bool):
    base = f"{p}.layer" if p else "layer"
    return {f"layer_{i}": port_transformer_layer(sd, f"{base}.{i}", cross)
            for i in range(num_layers)}


def port_mlp_head(sd, p):
    """AnglesPredictor/AminoAcidPredictor -> MLPHead."""
    return {"dense1": _lin(sd, f"{p}.dense1"),
            "norm": _ln(sd, f"{p}.layer_norm"),
            "dense2": _lin(sd, f"{p}.dense2")}


def port_structure_state_dict(sd, num_enc_layers: int = 12,
                              num_dec_layers: int = 12):
    """Full ConditionalBertForDiffusion(Base) state_dict -> StructureDenoiser
    params (structure_model/model.py:157-179 module layout)."""
    return {
        "receptor_seq_emb": port_feature_embedding(sd, "receptor_seq_emb"),
        "receptor_angle_emb": port_feature_embedding(sd, "receptor_angle_emb"),
        "receptor_emb": port_selayer(sd, "receptor_emb"),
        "encoder": port_transformer_stack(sd, "encoder", num_enc_layers, cross=False),
        "ligand_angle_emb": port_feature_embedding(sd, "ligand_angle_emb"),
        "timestep_projector": {"W": sd["timestep_projector.W"]},
        "timestep_emb": port_selayer(sd, "timestep_emb"),
        "decoder": port_transformer_stack(sd, "decoder", num_dec_layers, cross=True),
        "angles_predictor": port_mlp_head(sd, "angles_predictor"),
    }


def port_sequence_state_dict(sd, num_dec_layers: int = 6):
    """PeptideDiff state_dict -> SequenceDenoiser params
    (sequence_model/model.py:156-198). The dead receptor_feature_emb weights
    (quirk Q7) are intentionally dropped — the reference never executes
    them."""
    return {
        "timestep_projector": {"W": sd["timestep_projector.W"]},
        "ligand_seq_embedding": port_feature_embedding(sd, "ligand_seq_embedding"),
        "ligand_angle_embedding": port_feature_embedding(sd, "ligand_angle_embedding"),
        "ligand_feature_emb": port_selayer(sd, "ligand_feature_emb"),
        "receptor_seq_embedding": port_feature_embedding(sd, "receptor_seq_embedding"),
        "receptor_angle_embedding": port_feature_embedding(sd, "receptor_angle_embedding"),
        "decoder": port_transformer_stack(sd, "decoder", num_dec_layers, cross=True),
        "decoder_normalize": port_selayer(sd, "decoder_normalize"),
        "amino_acid_predictor": port_mlp_head(sd, "amino_acid_predictor"),
    }
