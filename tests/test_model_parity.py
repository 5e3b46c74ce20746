"""Numerical parity of the flax denoisers vs the reference torch models.

Loads the reference modules read-only from /root/reference (lightning
stubbed), ports their randomly-initialized state_dicts into our flax trees,
and compares full-model forward outputs on random inputs. This pins down
HF relative_key attention semantics, cross-attention wiring, SELayer adaLN
math, LayerNorm epsilons, and mask conventions in one shot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from e3diff_tpu.models import (  # noqa: E402
    TransformerConfig,
    StructureDenoiser,
    SequenceDenoiser,
)
from e3diff_tpu.utils.torch_port import (  # noqa: E402
    port_structure_state_dict,
    port_sequence_state_dict,
    port_transformer_stack,
)
from tests.reference_compat import load_reference_module  # noqa: E402

B, L, H, HEADS, LAYERS, INTER = 2, 16, 64, 4, 2, 96


def _bert_config(cross: bool):
    from transformers import BertConfig

    cfg = BertConfig(
        max_position_embeddings=L,
        num_attention_heads=HEADS,
        hidden_size=H,
        intermediate_size=INTER,
        num_hidden_layers=LAYERS,
        position_embedding_type="relative_key",
        hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1,
        use_cache=False,
        is_decoder=cross,
        add_cross_attention=cross,
    )
    # BertConfig built outside a *Model never gets _attn_implementation set;
    # force the eager path (relative_key falls back to it anyway).
    cfg._attn_implementation = "eager"
    return cfg


def _tcfg(cross: bool, init_style="torch_default"):
    return TransformerConfig(
        hidden_size=H, num_heads=HEADS, num_layers=LAYERS,
        intermediate_size=INTER, max_position_embeddings=L,
        dropout=0.1, attention_dropout=0.1,
        position_embedding_type="relative_key",
        add_cross_attention=cross, init_style=init_style)


def _prefix_mask(lengths, max_len=L):
    m = np.zeros((len(lengths), max_len), np.float32)
    for i, n in enumerate(lengths):
        m[i, :n] = 1.0
    return m


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_encoder_stack_parity_with_hf_bert():
    """12-layer-free parity of TransformerStack vs HF BertEncoder with
    relative_key attention + cross attention."""
    from transformers.models.bert.modeling_bert import BertEncoder

    torch.manual_seed(0)
    enc = BertEncoder(_bert_config(cross=True)).eval()

    x = torch.randn(B, L, H)
    mem = torch.randn(B, L, H)
    mask = torch.tensor(_prefix_mask([7, 16]))
    mem_mask = torch.tensor(_prefix_mask([12, 3]))
    ext = (1.0 - mask)[:, None, None, :] * -10000.0
    mem_ext = (1.0 - mem_mask)[:, None, None, :] * -10000.0

    with torch.no_grad():
        want = enc(x, attention_mask=ext, encoder_hidden_states=mem,
                   encoder_attention_mask=mem_ext).last_hidden_state.numpy()

    from e3diff_tpu.models.blocks import TransformerStack, extend_attention_mask

    params = port_transformer_stack(_np_sd(enc), "", LAYERS, cross=True)
    stack = TransformerStack(_tcfg(cross=True))
    got = stack.apply(
        {"params": params},
        jnp.asarray(x.numpy()), jnp.asarray(ext.numpy()),
        jnp.asarray(mem.numpy()), jnp.asarray(mem_ext.numpy()),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_structure_denoiser_full_parity():
    ref = load_reference_module("structure_model", "model")
    torch.manual_seed(1)
    model = ref.ConditionalBertForDiffusionBase(
        _bert_config(False), _bert_config(True), feature_size=8).eval()

    rng = np.random.default_rng(4)
    lig_angles = rng.normal(size=(B, L, 8)).astype(np.float32)
    rec_angles = rng.normal(size=(B, L, 8)).astype(np.float32)
    rec_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    lig_mask = _prefix_mask([5, 16])
    rec_mask = _prefix_mask([16, 9])
    t = np.array([[3], [999]], dtype=np.int64)

    with torch.no_grad():
        want = model(
            torch.tensor(t), torch.tensor(lig_angles), torch.tensor(lig_mask),
            torch.tensor(rec_seq), torch.tensor(rec_angles), torch.tensor(rec_mask),
        ).numpy()

    params = port_structure_state_dict(_np_sd(model), LAYERS, LAYERS)
    net = StructureDenoiser(_tcfg(False), _tcfg(True))
    got = net.apply(
        {"params": params},
        jnp.asarray(t), jnp.asarray(lig_angles), jnp.asarray(lig_mask),
        jnp.asarray(rec_seq), jnp.asarray(rec_angles), jnp.asarray(rec_mask),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_sequence_denoiser_full_parity():
    ref = load_reference_module("sequence_model", "model")
    torch.manual_seed(2)
    model = ref.ConditionalBertForDiffusionBase(
        _bert_config(False), _bert_config(True), feature_size=20).eval()

    rng = np.random.default_rng(5)
    lig_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    lig_angles = rng.normal(size=(B, L, 8)).astype(np.float32)
    rec_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    rec_angles = rng.normal(size=(B, L, 8)).astype(np.float32)
    lig_mask = _prefix_mask([10, 4])
    rec_mask = _prefix_mask([16, 13])
    # Q9: float timestep — training uses t/T in [0,1], sampling raw ints
    t = np.array([[0.42], [17.0]], dtype=np.float32)

    with torch.no_grad():
        want = model(
            torch.tensor(t),
            torch.tensor(lig_seq), torch.tensor(lig_angles), torch.tensor(lig_mask),
            torch.tensor(rec_seq), torch.tensor(rec_angles), torch.tensor(rec_mask),
        ).numpy()

    params = port_sequence_state_dict(_np_sd(model), LAYERS)
    net = SequenceDenoiser(_tcfg(False, "xavier_all"), _tcfg(True, "xavier_all"))
    got = net.apply(
        {"params": params},
        jnp.asarray(t), jnp.asarray(lig_seq), jnp.asarray(lig_angles),
        jnp.asarray(lig_mask), jnp.asarray(rec_seq), jnp.asarray(rec_angles),
        jnp.asarray(rec_mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_structure_param_count_matches_reference_scale():
    """Full-size structure config should land at ~146.4M params
    (BASELINE.md; printed by reference train_model.py:97-98)."""
    import jax
    from e3diff_tpu.models import structure_model_configs

    enc, dec = structure_model_configs(max_seq_len=128)
    net = StructureDenoiser(enc, dec)
    shapes = jax.eval_shape(
        lambda: net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 128, 8)),
            jnp.ones((1, 128)), jnp.zeros((1, 128, 20)),
            jnp.zeros((1, 128, 8)), jnp.ones((1, 128))))
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))
    assert abs(n - 146.4e6) / 146.4e6 < 0.02, f"got {n/1e6:.1f}M params"


def test_bf16_matches_f32_within_mixed_precision_tolerance():
    """The bf16 compute path (used for TPU speed; analog of the reference's
    TF32 'medium' matmuls) must track the f32 path closely."""
    import dataclasses

    import jax

    cfg_f32_enc, cfg_f32_dec = _tcfg(False), _tcfg(True)
    net32 = StructureDenoiser(cfg_f32_enc, cfg_f32_dec)
    net16 = StructureDenoiser(
        dataclasses.replace(cfg_f32_enc, dtype=jnp.bfloat16),
        dataclasses.replace(cfg_f32_dec, dtype=jnp.bfloat16))

    rng = np.random.default_rng(21)
    lig = rng.uniform(-3, 3, (B, L, 8)).astype(np.float32)
    rec_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    rec_ang = rng.uniform(-3, 3, (B, L, 8)).astype(np.float32)
    masks = _prefix_mask([8, 16]), _prefix_mask([16, 11])
    t = np.zeros((B,), np.int32)

    params = net32.init(jax.random.PRNGKey(5), jnp.asarray(t),
                        jnp.asarray(lig), jnp.asarray(masks[0]),
                        jnp.asarray(rec_seq), jnp.asarray(rec_ang),
                        jnp.asarray(masks[1]))["params"]
    out32 = net32.apply({"params": params}, jnp.asarray(t), jnp.asarray(lig),
                        jnp.asarray(masks[0]), jnp.asarray(rec_seq),
                        jnp.asarray(rec_ang), jnp.asarray(masks[1]))
    out16 = net16.apply({"params": params}, jnp.asarray(t), jnp.asarray(lig),
                        jnp.asarray(masks[0]), jnp.asarray(rec_seq),
                        jnp.asarray(rec_ang), jnp.asarray(masks[1]))
    diff = np.abs(np.asarray(out32) - np.asarray(out16, np.float32))
    scale = np.abs(np.asarray(out32)).mean() + 1e-6
    assert diff.mean() / scale < 0.05, (diff.mean(), scale)


def test_sequence_param_count_matches_live_reference_scale():
    """Full-size sequence config: ~61M live params (reference prints 72.3M
    including the ~11.2M dead receptor_feature_emb we don't materialize,
    quirk Q7)."""
    import jax
    from e3diff_tpu.models import sequence_model_configs

    enc, dec = sequence_model_configs(max_seq_len=128)
    net = SequenceDenoiser(enc, dec)
    shapes = jax.eval_shape(
        lambda: net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1)), jnp.zeros((1, 128, 20)),
            jnp.zeros((1, 128, 8)), jnp.ones((1, 128)),
            jnp.zeros((1, 128, 20)), jnp.zeros((1, 128, 8)),
            jnp.ones((1, 128))))
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))
    assert abs(n - 61.0e6) / 61.0e6 < 0.02, f"got {n/1e6:.1f}M params"
