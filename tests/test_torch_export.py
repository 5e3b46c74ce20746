"""Bidirectional torch checkpoint compatibility.

Round 1 only tested import (torch state_dict -> flax). These tests pin the
export direction: flax params -> reference-layout state_dict that
(a) round-trips bit-exactly through port_*_state_dict,
(b) carries EXACTLY the reference models' key set — including quirk Q7's
    dead receptor_feature_emb SELayer and the discrete_noise_schedule.betas
    buffer a real PeptideDiff checkpoint contains — and
(c) loads into the actual reference torch modules with strict=True and
    reproduces our forward outputs.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from e3diff_tpu.models import (  # noqa: E402
    TransformerConfig,
    StructureDenoiser,
    SequenceDenoiser,
)
from e3diff_tpu.utils.torch_port import (  # noqa: E402
    export_sequence_state_dict,
    export_structure_state_dict,
    port_sequence_state_dict,
    port_structure_state_dict,
)
from tests.reference_compat import load_reference_module  # noqa: E402

B, L, H, HEADS, LAYERS, INTER = 2, 16, 64, 4, 2, 96


def _tcfg(cross: bool, init_style="torch_default"):
    return TransformerConfig(
        hidden_size=H, num_heads=HEADS, num_layers=LAYERS,
        intermediate_size=INTER, max_position_embeddings=L,
        dropout=0.1, attention_dropout=0.1,
        position_embedding_type="relative_key",
        add_cross_attention=cross, init_style=init_style)


def _bert_config(cross: bool):
    from transformers import BertConfig

    cfg = BertConfig(
        max_position_embeddings=L, num_attention_heads=HEADS, hidden_size=H,
        intermediate_size=INTER, num_hidden_layers=LAYERS,
        position_embedding_type="relative_key", hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, use_cache=False,
        is_decoder=cross, add_cross_attention=cross)
    cfg._attn_implementation = "eager"
    return cfg


def _sequence_params():
    model = SequenceDenoiser(_tcfg(False, "xavier_all"),
                             _tcfg(True, "xavier_all"))
    rng = np.random.default_rng(0)
    args = (jnp.zeros((B, 1)),
            jnp.asarray(np.eye(20, dtype=np.float32)[
                rng.integers(0, 20, (B, L))]),
            jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32)),
            jnp.ones((B, L)),
            jnp.asarray(np.eye(20, dtype=np.float32)[
                rng.integers(0, 20, (B, L))]),
            jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32)),
            jnp.ones((B, L)))
    params = model.init(jax.random.PRNGKey(7), *args)["params"]
    return model, params, args


def _structure_params():
    model = StructureDenoiser(_tcfg(False), _tcfg(True))
    rng = np.random.default_rng(1)
    args = (jnp.asarray(np.array([[3], [11]], np.int64)),
            jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32)),
            jnp.ones((B, L)),
            jnp.asarray(np.eye(20, dtype=np.float32)[
                rng.integers(0, 20, (B, L))]),
            jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32)),
            jnp.ones((B, L)))
    params = model.init(jax.random.PRNGKey(8), *args)["params"]
    return model, params, args


def _assert_trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sequence_export_roundtrip_bit_exact():
    _, params, _ = _sequence_params()
    sd = export_sequence_state_dict(params)
    back = port_sequence_state_dict(sd, num_dec_layers=LAYERS)
    _assert_trees_equal(params, back)


def test_structure_export_roundtrip_bit_exact():
    _, params, _ = _structure_params()
    sd = export_structure_state_dict(params)
    back = port_structure_state_dict(sd, LAYERS, LAYERS)
    _assert_trees_equal(params, back)


def _reference_peptide_diff():
    ref = load_reference_module("sequence_model", "model")
    cwd = os.getcwd()
    os.chdir("/root/reference/sequence_model")  # BlosumTransition asset cwd
    try:
        return ref.PeptideDiff(
            _bert_config(False), _bert_config(True),
            feature_names=list("ACDEFGHIKLMNPQRSTVWY"),
            loss_func=[torch.nn.functional.cross_entropy],
            noise_schedule="cosine", timesteps=50).eval()
    finally:
        os.chdir(cwd)


def test_sequence_export_full_reference_key_set_and_forward():
    """export() == the real PeptideDiff.state_dict() key-for-key (incl. the
    Q7 dead SELayer and the schedule buffer), loads strict=True, and the
    loaded reference model reproduces our forward output."""
    model, params, args = _sequence_params()
    sd = export_sequence_state_dict(params)

    ref_model = _reference_peptide_diff()
    want_keys = set(ref_model.state_dict().keys())
    assert set(sd.keys()) == want_keys

    ref_model.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=True)

    t, lig_seq, lig_ang, lig_mask, rec_seq, rec_ang, rec_mask = args
    with torch.no_grad():
        want = ref_model(
            torch.tensor(np.asarray(t, np.float32)),
            torch.tensor(np.asarray(lig_seq)), torch.tensor(np.asarray(lig_ang)),
            torch.tensor(np.asarray(lig_mask, np.float32)),
            torch.tensor(np.asarray(rec_seq)), torch.tensor(np.asarray(rec_ang)),
            torch.tensor(np.asarray(rec_mask, np.float32))).numpy()
    got = model.apply({"params": params}, *args, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_structure_export_full_reference_key_set_and_forward():
    ref = load_reference_module("structure_model", "model")
    ref_model = ref.ConditionalBertForDiffusion(
        _bert_config(False), _bert_config(True),
        feature_names=["phi", "psi", "omega", "dihedral_o",
                       "tau", "CA:C:1N", "1C:N:CA", "CA:C:O"],
        loss_func=[]).eval()

    model, params, args = _structure_params()
    sd = export_structure_state_dict(params)
    assert set(sd.keys()) == set(ref_model.state_dict().keys())

    ref_model.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=True)

    t, lig_ang, lig_mask, rec_seq, rec_ang, rec_mask = args
    with torch.no_grad():
        want = ref_model(
            torch.tensor(np.asarray(t)), torch.tensor(np.asarray(lig_ang)),
            torch.tensor(np.asarray(lig_mask, np.float32)),
            torch.tensor(np.asarray(rec_seq)), torch.tensor(np.asarray(rec_ang)),
            torch.tensor(np.asarray(rec_mask, np.float32))).numpy()
    got = model.apply({"params": params}, *args, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_sequence_export_betas_buffer_matches_reference():
    """The exported discrete_noise_schedule.betas buffer must bit-match the
    reference PredefinedNoiseScheduleDiscrete's registered buffer."""
    _, params, _ = _sequence_params()
    sd = export_sequence_state_dict(params, timesteps=50)
    ref_model = _reference_peptide_diff()
    want = ref_model.state_dict()["discrete_noise_schedule.betas"].numpy()
    np.testing.assert_array_equal(sd["discrete_noise_schedule.betas"], want)


def test_structure_export_accepts_scan_layout():
    """Exporting scan_layers params (keys 'layers'/'layer', leading layer
    axis) must equal the per-layer export — not IndexError (r2 review)."""
    from e3diff_tpu.models.restack import params_to_scan

    _, params, _ = _structure_params()
    want = export_structure_state_dict(params)
    got = export_structure_state_dict(params_to_scan(params))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
