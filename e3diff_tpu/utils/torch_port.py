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
    (quirk Q7) and the discrete_noise_schedule.betas buffer are intentionally
    dropped — the reference never executes the former and the latter is a
    recomputable constant."""
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


# ---------------------------------------------------------------------------
# Export: flax parameter trees -> reference-layout torch state_dicts.
# The exact inverse of the port_* functions above, so weights can round-trip
# e3diff_tpu -> torch -> e3diff_tpu bit-exactly and exported checkpoints load
# into the reference modules (including the dead/buffer keys a real reference
# state_dict carries).
# ---------------------------------------------------------------------------


def _f32(x):
    return np.asarray(x, np.float32)


def _export_lin(tree, p, out):
    out[f"{p}.weight"] = np.ascontiguousarray(_f32(tree["kernel"]).T)
    out[f"{p}.bias"] = _f32(tree["bias"])


def _export_ln(tree, p, out):
    out[f"{p}.weight"] = _f32(tree["scale"])
    out[f"{p}.bias"] = _f32(tree["bias"])


def export_feature_embedding(tree, p, out):
    _export_lin(tree["linear"], f"{p}.linear", out)
    _export_ln(tree["norm"], f"{p}.LayerNorm", out)


def export_attention_block(tree, p, out):
    _export_lin(tree["self"]["query"], f"{p}.self.query", out)
    _export_lin(tree["self"]["key"], f"{p}.self.key", out)
    _export_lin(tree["self"]["value"], f"{p}.self.value", out)
    if "distance_embedding" in tree["self"]:
        out[f"{p}.self.distance_embedding.weight"] = _f32(
            tree["self"]["distance_embedding"]["embedding"])
    _export_lin(tree["output_dense"], f"{p}.output.dense", out)
    _export_ln(tree["output_norm"], f"{p}.output.LayerNorm", out)


def export_selayer(tree, p, out):
    _export_lin(tree["adaln_0"], f"{p}.adaLN_modulation.0", out)
    _export_lin(tree["adaln_1"], f"{p}.adaLN_modulation.2", out)
    export_attention_block(tree["attn"], f"{p}.attn", out)
    _export_lin(tree["mlp_dense1"], f"{p}.mlp.0", out)
    _export_lin(tree["mlp_dense2"], f"{p}.mlp.3", out)


def export_transformer_stack(tree, p, out):
    if set(tree) == {"layers"}:  # scan_layers layout -> per-layer first
        from e3diff_tpu.models.restack import params_from_scan
        tree = params_from_scan(tree)
    base = f"{p}.layer" if p else "layer"
    for name in sorted(tree, key=lambda s: int(s.rsplit("_", 1)[1])):
        i = int(name.rsplit("_", 1)[1])
        layer = tree[name]
        export_attention_block(layer["attention"], f"{base}.{i}.attention", out)
        if "crossattention" in layer:
            export_attention_block(
                layer["crossattention"], f"{base}.{i}.crossattention", out)
        _export_lin(layer["intermediate_dense"],
                    f"{base}.{i}.intermediate.dense", out)
        _export_lin(layer["output_dense"], f"{base}.{i}.output.dense", out)
        _export_ln(layer["output_norm"], f"{base}.{i}.output.LayerNorm", out)


def export_mlp_head(tree, p, out):
    _export_lin(tree["dense1"], f"{p}.dense1", out)
    _export_ln(tree["norm"], f"{p}.layer_norm", out)
    _export_lin(tree["dense2"], f"{p}.dense2", out)


def export_structure_state_dict(params) -> dict:
    """StructureDenoiser params -> ConditionalBertForDiffusion state_dict
    (numpy arrays; torch.save'able after tensor conversion host-side)."""
    out = {}
    export_feature_embedding(params["receptor_seq_emb"], "receptor_seq_emb", out)
    export_feature_embedding(params["receptor_angle_emb"], "receptor_angle_emb", out)
    export_selayer(params["receptor_emb"], "receptor_emb", out)
    export_transformer_stack(params["encoder"], "encoder", out)
    export_feature_embedding(params["ligand_angle_emb"], "ligand_angle_emb", out)
    out["timestep_projector.W"] = _f32(params["timestep_projector"]["W"])
    export_selayer(params["timestep_emb"], "timestep_emb", out)
    export_transformer_stack(params["decoder"], "decoder", out)
    export_mlp_head(params["angles_predictor"], "angles_predictor", out)
    return out


def _dead_selayer_like(template, rng):
    """Fresh tensors shaped like an existing SELayer subtree, mimicking the
    reference inits (xavier-uniform Linear weights via initialize_weights'
    _basic_init, zero biases, unit LayerNorm, N(0,1) embeddings). Used to
    re-materialize quirk Q7's never-executed receptor_feature_emb
    (sequence_model/model.py:176) so exports carry the full reference key
    set."""
    def gen(leaf_name, arr):
        arr = np.asarray(arr)
        if leaf_name == "kernel":
            bound = float(np.sqrt(6.0 / (arr.shape[0] + arr.shape[1])))
            return rng.uniform(-bound, bound, arr.shape).astype(np.float32)
        if leaf_name == "scale":
            return np.ones(arr.shape, np.float32)
        if leaf_name == "embedding":
            return rng.normal(size=arr.shape).astype(np.float32)
        return np.zeros(arr.shape, np.float32)  # biases

    def walk(node):
        if isinstance(node, dict):
            return {k: gen(k, v) if not isinstance(v, dict) else walk(v)
                    for k, v in node.items()}
        raise TypeError(type(node))

    return walk(template)


def export_sequence_state_dict(params, *, timesteps: int = 50,
                               seed: int = 0) -> dict:
    """SequenceDenoiser params -> PeptideDiff state_dict with the FULL
    reference key set: the live weights, the dead receptor_feature_emb
    SELayer (Q7; shapes mirrored from the shared ligand_feature_emb, which
    the reference builds from the same encoder_config), and the
    discrete_noise_schedule.betas buffer (PredefinedNoiseScheduleDiscrete
    registers it; sequence_model/utils.py:216).

    port_sequence_state_dict(export_sequence_state_dict(params)) == params.
    """
    from e3diff_tpu.ops.schedules import DiscreteNoiseSchedule

    out = {}
    out["timestep_projector.W"] = _f32(params["timestep_projector"]["W"])
    export_feature_embedding(params["ligand_seq_embedding"],
                             "ligand_seq_embedding", out)
    export_feature_embedding(params["ligand_angle_embedding"],
                             "ligand_angle_embedding", out)
    export_selayer(params["ligand_feature_emb"], "ligand_feature_emb", out)
    export_feature_embedding(params["receptor_seq_embedding"],
                             "receptor_seq_embedding", out)
    export_feature_embedding(params["receptor_angle_embedding"],
                             "receptor_angle_embedding", out)
    dead = _dead_selayer_like(params["ligand_feature_emb"],
                              np.random.default_rng(seed))
    export_selayer(dead, "receptor_feature_emb", out)
    export_transformer_stack(params["decoder"], "decoder", out)
    export_selayer(params["decoder_normalize"], "decoder_normalize", out)
    export_mlp_head(params["amino_acid_predictor"], "amino_acid_predictor", out)
    out["discrete_noise_schedule.betas"] = _f32(
        DiscreteNoiseSchedule.cosine(timesteps).betas)
    return out
