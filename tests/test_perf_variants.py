"""Numerical-equivalence tests for the performance variants: blockdiag
self-attention, layer remat, scan_layers + param restack, fused loss."""

import numpy as np
import jax
import jax.numpy as jnp

from e3diff_tpu.models import StructureDenoiser, TransformerConfig
from e3diff_tpu.models.blocks import TransformerStack, extend_attention_mask
from e3diff_tpu.models.restack import params_from_scan, params_to_scan

B, L, H, HEADS, LAYERS, INTER = 2, 16, 64, 4, 3, 96


def _cfg(cross=False, **kw):
    base = dict(hidden_size=H, num_heads=HEADS, num_layers=LAYERS,
                intermediate_size=INTER, max_position_embeddings=L,
                dropout=0.0, attention_dropout=0.0,
                add_cross_attention=cross)
    base.update(kw)
    return TransformerConfig(**base)


def _stack_inputs(lk=L, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, L, H)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(B, lk, H)).astype(np.float32))
    mask = np.ones((B, L), np.float32)
    mask[1, L // 2:] = 0.0
    mem_mask = np.ones((B, lk), np.float32)
    mem_mask[0, lk - 3:] = 0.0
    return (x, extend_attention_mask(jnp.asarray(mask)),
            mem, extend_attention_mask(jnp.asarray(mem_mask)))


def test_blockdiag_attention_matches_einsum():
    """Same params, same inputs: blockdiag scores == per-head einsum scores
    (incl. relative_key scores, padding mask, cross-attention)."""
    x, ext, mem, mem_ext = _stack_inputs()
    ref_stack = TransformerStack(_cfg(cross=True))
    params = ref_stack.init(jax.random.PRNGKey(0), x, ext, mem, mem_ext)[
        "params"]
    want = ref_stack.apply({"params": params}, x, ext, mem, mem_ext,
                           deterministic=True)

    bd_stack = TransformerStack(_cfg(cross=True,
                                     self_attention_impl="blockdiag"))
    got = bd_stack.apply({"params": params}, x, ext, mem, mem_ext,
                         deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_remat_matches_baseline_forward_and_grad():
    """remat='layer'/'dots' must be numerically identical (incl. grads)."""
    x, ext, mem, mem_ext = _stack_inputs(seed=1)
    base = TransformerStack(_cfg(cross=True))
    params = base.init(jax.random.PRNGKey(1), x, ext, mem, mem_ext)["params"]

    def loss(p, stack):
        return jnp.sum(stack.apply({"params": p}, x, ext, mem, mem_ext,
                                   deterministic=True) ** 2)

    want, want_grad = jax.value_and_grad(loss)(params, base)
    for policy in ["layer", "dots"]:
        stack = TransformerStack(_cfg(cross=True, remat=policy))
        got, got_grad = jax.value_and_grad(loss)(params, stack)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(got_grad), jax.tree.leaves(want_grad)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


def test_remat_with_cross_kv_cache_matches_baseline():
    """Round-3 regression: static_argnums under nn.remat must stay in
    sync with the call arity after the cross_kv/kv_only args landed —
    every remat x {unrolled, scan} x {cross_kv None, populated} combo
    must trace and match the baseline forward."""
    from e3diff_tpu.models.restack import params_to_scan

    x, ext, mem, mem_ext = _stack_inputs(seed=7)
    base = TransformerStack(_cfg(cross=True))
    params = base.init(jax.random.PRNGKey(7), x, ext, mem, mem_ext)["params"]
    want = np.asarray(base.apply({"params": params}, x, ext, mem, mem_ext,
                                 deterministic=True))
    sparams = params_to_scan(params)

    for policy in ["layer", "dots"]:
        for scan in [False, True]:
            stack = TransformerStack(_cfg(cross=True, remat=policy,
                                          scan_layers=scan))
            p = sparams if scan else params
            got = stack.apply({"params": p}, x, ext, mem, mem_ext,
                              deterministic=True)
            np.testing.assert_allclose(np.asarray(got), want,
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"{policy} scan={scan}")
            kv = stack.apply({"params": p}, x, ext, mem, mem_ext,
                             deterministic=True, kv_only=True)
            got = stack.apply({"params": p}, x, ext, None, mem_ext,
                              deterministic=True, cross_kv=kv)
            np.testing.assert_allclose(np.asarray(got), want,
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"{policy} scan={scan} kv")


def test_scan_layers_matches_unrolled():
    """scan_layers=True with restacked params reproduces the unrolled stack
    (forward and gradients), and params_from_scan inverts params_to_scan."""
    x, ext, mem, mem_ext = _stack_inputs(seed=2)
    base = TransformerStack(_cfg(cross=True))
    params = base.init(jax.random.PRNGKey(2), x, ext, mem, mem_ext)["params"]
    want = base.apply({"params": params}, x, ext, mem, mem_ext,
                      deterministic=True)

    scan_stack = TransformerStack(_cfg(cross=True, scan_layers=True))
    sparams = params_to_scan(params)
    # scan init produces the same tree structure as the converter
    init_shape = jax.tree.map(
        jnp.shape, scan_stack.init(jax.random.PRNGKey(0), x, ext, mem,
                                   mem_ext)["params"])
    assert init_shape == jax.tree.map(jnp.shape, sparams)

    got = scan_stack.apply({"params": sparams}, x, ext, mem, mem_ext,
                           deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    back = params_from_scan(sparams)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_layers_full_model_restack():
    """Whole-model restack: a scan-layer StructureDenoiser runs with
    converted params and matches the unrolled model."""
    enc, dec = _cfg(False), _cfg(True)
    model = StructureDenoiser(enc, dec)
    rng = np.random.default_rng(3)
    args = (jnp.zeros((B,), jnp.int32),
            jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32)),
            jnp.ones((B, L)),
            jnp.asarray(np.eye(20, dtype=np.float32)[
                rng.integers(0, 20, (B, L))]),
            jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32)),
            jnp.ones((B, L)))
    params = model.init(jax.random.PRNGKey(3), *args)["params"]
    want = model.apply({"params": params}, *args, deterministic=True)

    scan_model = StructureDenoiser(
        _cfg(False, scan_layers=True), _cfg(True, scan_layers=True))
    got = scan_model.apply({"params": params_to_scan(params)}, *args,
                           deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_loss_matches_per_channel():
    """The fused 8-channel reduction equals per-channel radian losses."""
    from e3diff_tpu.ops.angles import radian_l1_loss, radian_smooth_l1_loss
    from e3diff_tpu.training.structure import (
        SMOOTH_L1_BETA, structure_loss_terms)

    rng = np.random.default_rng(4)
    pred = jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32) * 2)
    known = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(
        np.float32))
    mask = np.ones((B, L), np.float32)
    mask[0, 5:] = 0.0
    mask = jnp.asarray(mask)

    got = structure_loss_terms(pred, known, mask)
    want = [radian_l1_loss(pred[..., i], known[..., i], mask=mask)
            if i < 4 else
            radian_smooth_l1_loss(pred[..., i], known[..., i],
                                  beta=SMOOTH_L1_BETA, mask=mask)
            for i in range(8)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-7, rtol=1e-6)


def test_fused_loss_bf16_inputs_match_f32():
    """Loss arithmetic must run in f32 even for bf16 model outputs: the
    masked-mean denominator rounded in bf16 skews every channel ~0.1%
    (round-2 review finding). Quantize inputs to bf16 both ways so the
    only possible divergence is the reduction dtype."""
    from e3diff_tpu.training.structure import structure_loss_terms

    rng = np.random.default_rng(5)
    b, l = 64, 128  # large enough that a bf16 denominator actually rounds
    pred = jnp.asarray(rng.normal(size=(b, l, 8)) * 2, jnp.bfloat16)
    known = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, l, 8)), jnp.bfloat16)
    mask = (rng.uniform(size=(b, l)) < 0.8).astype(np.float32)
    assert float(mask.sum()) > 4096  # past bf16 integer exactness

    got = structure_loss_terms(pred, known, jnp.asarray(mask, jnp.bfloat16))
    want = structure_loss_terms(pred.astype(jnp.float32),
                                known.astype(jnp.float32),
                                jnp.asarray(mask))
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-5)


def test_sequence_losses_bf16_logits_match_f32():
    from e3diff_tpu.training.sequence import sequence_losses

    rng = np.random.default_rng(6)
    b, l, k = 64, 64, 20
    logits = rng.normal(size=(b, l, k)).astype(np.float32) * 3
    logits_bf16 = jnp.asarray(logits, jnp.bfloat16)
    seq = np.eye(k, dtype=np.float32)[rng.integers(0, k, (b, l))]
    noised = np.eye(k, dtype=np.float32)[rng.integers(0, k, (b, l))]
    mask = (rng.uniform(size=(b, l)) < 0.9).astype(np.float32)

    got, gm = sequence_losses(logits_bf16, jnp.asarray(noised),
                              jnp.asarray(seq), jnp.asarray(mask))
    want, wm = sequence_losses(logits_bf16.astype(jnp.float32),
                               jnp.asarray(noised), jnp.asarray(seq),
                               jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for key in gm:
        np.testing.assert_allclose(
            float(gm[key]), float(wm[key]), rtol=1e-5, err_msg=key)


def test_blockdiag_applies_to_self_attention_only(monkeypatch):
    """self_attention_impl='blockdiag' must not reroute cross-attention:
    the layout loses at Lk=64 (measured); cross stays on einsum."""
    from e3diff_tpu.models import blocks as blocks_mod

    calls = []
    orig = blocks_mod.MultiHeadAttention._blockdiag

    def spy(self, *a, **kw):
        calls.append(self.is_cross)
        return orig(self, *a, **kw)

    monkeypatch.setattr(blocks_mod.MultiHeadAttention, "_blockdiag", spy)
    x, ext, mem, mem_ext = _stack_inputs()
    stack = TransformerStack(_cfg(cross=True,
                                  self_attention_impl="blockdiag"))
    params = stack.init(jax.random.PRNGKey(0), x, ext, mem, mem_ext)[
        "params"]
    stack.apply({"params": params}, x, ext, mem, mem_ext,
                deterministic=True)
    assert calls and not any(calls)  # invoked, never for cross-attention
