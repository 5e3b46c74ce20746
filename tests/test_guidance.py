"""Classifier-free guidance (diffusion/guidance.py).

Covers: null-conditioning construction, per-example training dropout,
cond_dropout=1 == hand-nulled batch (both trainers, bit-level), and the
guided samplers' 2B-batched combine == two explicit B-sized forwards
(both models). The cond_dropout=0 / guidance_scale=1 paths are pinned by
the existing parity suite (they compile the identical programs).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
from e3diff_tpu.diffusion import D3PMDiffusion, GaussianAngleDiffusion
from e3diff_tpu.diffusion.gaussian import sample_wrapped_noise
from e3diff_tpu.diffusion.guidance import (
    concat_cond_uncond,
    drop_conditioning,
    guided_combine,
    null_receptor,
)
from e3diff_tpu.models import (
    SequenceDenoiser,
    StructureDenoiser,
    TransformerConfig,
)
from e3diff_tpu.ops import UniformTransition
from e3diff_tpu.sampling.sequence import make_sequence_sampler
from e3diff_tpu.sampling.structure import make_structure_sampler
from e3diff_tpu.training import (
    SequenceTrainer,
    StructureTrainer,
    make_optimizer,
)

MAXLEN = 24
B = 6


def _tiny_cfg(cross, init_style="torch_default"):
    return TransformerConfig(
        hidden_size=32, num_heads=4, num_layers=2, intermediate_size=64,
        max_position_embeddings=MAXLEN, dropout=0.0, attention_dropout=0.0,
        add_cross_attention=cross, init_style=init_style)


def _batch():
    ds = LigandBindingSiteData(
        synthetic_complexes(n=B, seed=7, receptor_len_range=(8, 14),
                            ligand_len_range=(5, 8)),
        None, max_len=MAXLEN, pocket_ext=1)
    b = next(ds.batches(B))
    return {k: jnp.asarray(v) for k, v in b.items()
            if k not in ("num_valid", "structure_ids")}


def _null_batch(batch, drop_ligand_angles=False):
    nseq, nang, nmask = null_receptor(
        batch["receptor_seq"], batch["receptor_angles"],
        batch["receptor_attn_mask"])
    out = dict(batch, receptor_seq=nseq, receptor_angles=nang,
               receptor_attn_mask=nmask)
    if drop_ligand_angles:
        out["ligand_angles"] = jnp.zeros_like(batch["ligand_angles"])
    return out


def test_null_receptor_single_token_mask():
    batch = _batch()
    nseq, nang, nmask = null_receptor(
        batch["receptor_seq"], batch["receptor_angles"],
        batch["receptor_attn_mask"])
    assert not np.any(np.asarray(nseq)) and not np.any(np.asarray(nang))
    m = np.asarray(nmask)
    assert np.array_equal(m[:, 0], np.ones(B))
    assert not np.any(m[:, 1:])


def test_drop_conditioning_per_example_all_or_nothing():
    batch = _batch()
    out = drop_conditioning(jax.random.PRNGKey(0), 0.5, batch,
                            drop_ligand_angles=True)
    dropped = kept = 0
    for i in range(B):
        null_i = not np.any(np.asarray(out["receptor_seq"][i]))
        if null_i:
            dropped += 1
            assert not np.any(np.asarray(out["receptor_angles"][i]))
            assert not np.any(np.asarray(out["ligand_angles"][i]))
            m = np.asarray(out["receptor_attn_mask"][i])
            assert m[0] == 1 and not np.any(m[1:])
        else:
            kept += 1
            for f in ("receptor_seq", "receptor_angles",
                      "receptor_attn_mask", "ligand_angles"):
                np.testing.assert_array_equal(np.asarray(out[f][i]),
                                              np.asarray(batch[f][i]))
    # p=0.5 over 6 examples: overwhelmingly likely to see both outcomes
    assert dropped and kept
    # targets/masks are never conditioning
    np.testing.assert_array_equal(np.asarray(out["ligand_seq"]),
                                  np.asarray(batch["ligand_seq"]))
    np.testing.assert_array_equal(np.asarray(out["ligand_attn_mask"]),
                                  np.asarray(batch["ligand_attn_mask"]))


@pytest.mark.slow_integration   # multi-minute on this host; full suite runs it
def test_structure_cond_dropout_one_equals_nulled_batch():
    """cond_dropout=1.0 must train on exactly the null-conditioned batch:
    bit-equal loss to a cond_dropout=0 step fed the hand-nulled batch
    with the post-split rng."""
    batch = _batch()
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(20)
    rng = jax.random.PRNGKey(2)
    params = model.init(
        rng, jnp.zeros((B,), jnp.int32), batch["ligand_angles"],
        batch["ligand_attn_mask"], batch["receptor_seq"],
        batch["receptor_angles"], batch["receptor_attn_mask"])["params"]

    def build(cd):
        tr = StructureTrainer(
            model, diff,
            make_optimizer(params, base_lr=1e-3, max_epochs=4,
                           steps_per_epoch=2),
            cond_dropout=cd)
        return tr, tr.create_state(rng, batch)

    step_rng = jax.random.PRNGKey(11)
    tr_cfg, st_cfg = build(1.0)
    _, m_cfg = tr_cfg.train_step(st_cfg, dict(batch), step_rng)
    # the cond_dropout branch consumes split(rng)[1]; the remaining
    # stream is split(rng)[0]
    tr_plain, st_plain = build(0.0)
    _, m_plain = tr_plain.train_step(
        st_plain, _null_batch(batch), jax.random.split(step_rng)[0])
    assert float(m_cfg["train_loss"]) == float(m_plain["train_loss"])
    # eval never drops conditioning
    tr_cfg2, st_cfg2 = build(1.0)
    tr_plain2, st_plain2 = build(0.0)
    v_cfg = tr_cfg2.eval_step(st_cfg2, dict(batch), step_rng)
    v_plain = tr_plain2.eval_step(st_plain2, dict(batch), step_rng)
    assert float(v_cfg["val_loss"]) == float(v_plain["val_loss"])


@pytest.mark.slow_integration   # multi-minute on this host; full suite runs it
def test_sequence_cond_dropout_one_equals_nulled_batch():
    batch = _batch()
    model = SequenceDenoiser(_tiny_cfg(False, "xavier_all"),
                             _tiny_cfg(True, "xavier_all"))
    d3pm = D3PMDiffusion.create(UniformTransition(20), timesteps=10)
    rng = jax.random.PRNGKey(3)
    params = model.init(
        rng, jnp.zeros((B, 1)), batch["ligand_seq"], batch["ligand_angles"],
        batch["ligand_attn_mask"], batch["receptor_seq"],
        batch["receptor_angles"], batch["receptor_attn_mask"])["params"]

    def build(cd):
        tr = SequenceTrainer(
            model, d3pm,
            make_optimizer(params, base_lr=1e-3, max_epochs=4,
                           steps_per_epoch=2),
            cond_dropout=cd)
        return tr, tr.create_state(rng, batch)

    step_rng = jax.random.PRNGKey(12)
    tr_cfg, st_cfg = build(1.0)
    _, m_cfg = tr_cfg.train_step(st_cfg, dict(batch), step_rng)
    tr_plain, st_plain = build(0.0)
    _, m_plain = tr_plain.train_step(
        st_plain, _null_batch(batch, drop_ligand_angles=True),
        jax.random.split(step_rng)[0])
    assert float(m_cfg["train_loss"]) == float(m_plain["train_loss"])


def test_guided_combine_formula():
    c = jnp.arange(12.0).reshape(2, 3, 2)
    u = jnp.ones((2, 3, 2))
    out = guided_combine(jnp.concatenate([c, u], 0), 2.0)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(u + 2.0 * (c - u)))


def test_concat_cond_uncond_layout():
    batch = _batch()
    cond = {f: batch[f] for f in
            ("ligand_angles", "ligand_attn_mask", "receptor_seq",
             "receptor_angles", "receptor_attn_mask")}
    cat = concat_cond_uncond(cond, drop_ligand_angles=True)
    for f, v in cat.items():
        assert v.shape[0] == 2 * B
        np.testing.assert_array_equal(np.asarray(v[:B]),
                                      np.asarray(cond[f]))
    null = _null_batch(batch, drop_ligand_angles=True)
    for f in ("receptor_seq", "receptor_angles", "receptor_attn_mask",
              "ligand_angles"):
        np.testing.assert_array_equal(np.asarray(cat[f][B:]),
                                      np.asarray(null[f]))
    # non-conditioning fields are tiled
    np.testing.assert_array_equal(np.asarray(cat["ligand_attn_mask"][B:]),
                                  np.asarray(batch["ligand_attn_mask"]))


def test_structure_guided_sampler_matches_two_forwards():
    """The 2B-batched CFG sampler == a hand-rolled step doing two explicit
    B-sized forwards and combining u + w(c - u).

    Compared at T=1 (one forward; the t=0 ancestral step adds no noise)
    because the 2B-concat forward and two B-sized forwards differ by
    float ulps that chaotic multi-step trajectories amplify across the
    ±pi wrap — the single-step comparison pins the actual CFG math."""
    batch = _batch()
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(1)
    rng = jax.random.PRNGKey(4)
    params = model.init(
        rng, jnp.zeros((B,), jnp.int32), batch["ligand_angles"],
        batch["ligand_attn_mask"], batch["receptor_seq"],
        batch["receptor_angles"], batch["receptor_attn_mask"])["params"]
    w = 2.5

    run = make_structure_sampler(model, diff, return_trajectory=False,
                                 guidance_scale=w)
    key = jax.random.PRNGKey(21)
    got, _ = run(params, batch, key)

    # manual: replicate run()'s key discipline exactly
    key_init, key_loop = jax.random.split(key)
    x_init = sample_wrapped_noise(key_init, batch["ligand_angles"].shape,
                                  batch["ligand_angles"].dtype)
    enc_c = model.apply({"params": params}, batch["receptor_seq"],
                        batch["receptor_angles"],
                        batch["receptor_attn_mask"],
                        method=model.encode_receptor)
    nseq, nang, nmask = null_receptor(
        batch["receptor_seq"], batch["receptor_angles"],
        batch["receptor_attn_mask"])
    enc_u = model.apply({"params": params}, nseq, nang, nmask,
                        method=model.encode_receptor)

    def manual_denoise(t_vec, x):
        c = model.apply({"params": params}, t_vec, x,
                        batch["ligand_attn_mask"], enc_c,
                        batch["receptor_attn_mask"], method=model.decode)
        u = model.apply({"params": params}, t_vec, x,
                        batch["ligand_attn_mask"], enc_u, nmask,
                        method=model.decode)
        return u + w * (c - u)

    want, _ = diff.sample_loop(manual_denoise, key_loop, x_init,
                               return_trajectory=False)
    # 2B-concat vs two-B forwards differ by float ulps that the DDPM
    # mean's 1/sqrt(1-abar) amplifies to ~1e-4; wrong CFG math (scale or
    # branch mixups) is O(1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=0)


def test_structure_guided_multistep_runs_and_differs():
    """Multi-step guided sampling is finite, shaped, and actually moves
    the distribution away from the unguided sampler's output."""
    batch = _batch()
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(6)
    rng = jax.random.PRNGKey(6)
    params = model.init(
        rng, jnp.zeros((B,), jnp.int32), batch["ligand_angles"],
        batch["ligand_attn_mask"], batch["receptor_seq"],
        batch["receptor_angles"], batch["receptor_attn_mask"])["params"]
    key = jax.random.PRNGKey(30)
    plain = make_structure_sampler(model, diff, return_trajectory=False)
    guided = make_structure_sampler(model, diff, return_trajectory=False,
                                    guidance_scale=3.0)
    x1, _ = plain(params, batch, key)
    x2, _ = guided(params, batch, key)
    assert x2.shape == x1.shape
    assert np.isfinite(np.asarray(x2)).all()
    assert np.abs(np.asarray(x2)).max() <= np.pi + 1e-6
    assert not np.allclose(np.asarray(x1), np.asarray(x2), atol=1e-3)


def test_sequence_guided_sampler_matches_two_forwards():
    batch = _batch()
    model = SequenceDenoiser(_tiny_cfg(False, "xavier_all"),
                             _tiny_cfg(True, "xavier_all"))
    d3pm = D3PMDiffusion.create(UniformTransition(20), timesteps=6)
    rng = jax.random.PRNGKey(5)
    params = model.init(
        rng, jnp.zeros((B, 1)), batch["ligand_seq"], batch["ligand_angles"],
        batch["ligand_attn_mask"], batch["receptor_seq"],
        batch["receptor_angles"], batch["receptor_attn_mask"])["params"]
    w = 3.0

    run = make_sequence_sampler(model, d3pm, diverse=False,
                                guidance_scale=w)
    key = jax.random.PRNGKey(22)
    got = run(params, batch, key)

    key_init, key_loop = jax.random.split(key)
    x_init = d3pm.init_noise(key_init, B, MAXLEN,
                             dtype=batch["ligand_seq"].dtype)
    null = _null_batch(batch, drop_ligand_angles=True)

    def manual_denoise(s_arr, x):
        c = model.apply({"params": params}, s_arr, x,
                        batch["ligand_angles"], batch["ligand_attn_mask"],
                        batch["receptor_seq"], batch["receptor_angles"],
                        batch["receptor_attn_mask"])
        u = model.apply({"params": params}, s_arr, x,
                        null["ligand_angles"], batch["ligand_attn_mask"],
                        null["receptor_seq"], null["receptor_angles"],
                        null["receptor_attn_mask"])
        return u + w * (c - u)

    want = d3pm.sample_loop(manual_denoise, key_loop, x_init, diverse=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_guidance_scale_one_reuses_plain_program():
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(6)
    plain = make_structure_sampler(model, diff, return_trajectory=False)
    one = make_structure_sampler(model, diff, return_trajectory=False,
                                 guidance_scale=1.0)
    assert plain.inner is one.inner


def test_guidance_scale_sweep_shares_one_program():
    """The scale is a traced scalar of the guided program: sweeping w
    must reuse ONE compiled program, not compile per scale."""
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(6)
    a = make_structure_sampler(model, diff, return_trajectory=False,
                               guidance_scale=1.5)
    b = make_structure_sampler(model, diff, return_trajectory=False,
                               guidance_scale=3.0)
    assert a.inner is b.inner
    # and the guided program is distinct from the plain one
    plain = make_structure_sampler(model, diff, return_trajectory=False)
    assert plain.inner is not a.inner
    # forced-guided at w=1 (CFG-enabled serving) shares the guided program
    forced = make_structure_sampler(model, diff, return_trajectory=False,
                                    guidance_scale=1.0, guided=True)
    assert forced.inner is a.inner

    qmodel = SequenceDenoiser(_tiny_cfg(False, "xavier_all"),
                              _tiny_cfg(True, "xavier_all"))
    d3pm = D3PMDiffusion.create(UniformTransition(20), timesteps=6)
    qa = make_sequence_sampler(qmodel, d3pm, guidance_scale=1.5)
    qb = make_sequence_sampler(qmodel, d3pm, guidance_scale=3.0)
    assert qa.inner is qb.inner


def test_per_example_scale_vector_matches_scalar_runs():
    """A (B,) per-example scale vector (mixed-scale serving batches)
    must equal running each example at its scalar scale."""
    batch = _batch()
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(6)
    rng = jax.random.PRNGKey(8)
    params = model.init(
        rng, jnp.zeros((B,), jnp.int32), batch["ligand_angles"],
        batch["ligand_attn_mask"], batch["receptor_seq"],
        batch["receptor_angles"], batch["receptor_attn_mask"])["params"]
    key = jax.random.PRNGKey(40)
    scales = np.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0], np.float32)

    guided = make_structure_sampler(model, diff, return_trajectory=False,
                                    guidance_scale=1.0, guided=True)
    mixed, _ = guided(params, batch, key, scale=scales)
    for w in (1.0, 2.0, 3.0):
        at_w, _ = make_structure_sampler(
            model, diff, return_trajectory=False, guidance_scale=w,
            guided=True)(params, batch, key)
        idx = np.nonzero(scales == w)[0]
        np.testing.assert_allclose(np.asarray(mixed)[idx],
                                   np.asarray(at_w)[idx],
                                   atol=1e-5, rtol=0)
