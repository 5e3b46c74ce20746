"""End-to-end sampling tests on tiny models: structure sampler, sequence
sampler with recovery metrics, and the full pipeline through NERF PDBs."""

import numpy as np
import jax
import jax.numpy as jnp

from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
from e3diff_tpu.diffusion import GaussianAngleDiffusion, D3PMDiffusion
from e3diff_tpu.models import (
    StructureDenoiser,
    SequenceDenoiser,
    TransformerConfig,
)
from e3diff_tpu.ops import BlosumTransition
from e3diff_tpu.sampling import (
    sample_structure_batches,
    sample_sequence_batches,
    run_pipeline,
)

MAXLEN = 32


def _tiny_cfg(cross, init_style="torch_default"):
    return TransformerConfig(
        hidden_size=32, num_heads=4, num_layers=2, intermediate_size=64,
        max_position_embeddings=MAXLEN, dropout=0.1, attention_dropout=0.1,
        add_cross_attention=cross, init_style=init_style)


def _dataset(n=6):
    return LigandBindingSiteData(
        synthetic_complexes(n=n, seed=11, receptor_len_range=(10, 20),
                            ligand_len_range=(5, 10)),
        None, max_len=MAXLEN, pocket_ext=1)


def _structure_model_and_params(ds):
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    batch = next(ds.batches(4))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((4,), jnp.int32),
        jnp.asarray(batch["ligand_angles"]),
        jnp.asarray(batch["ligand_attn_mask"]),
        jnp.asarray(batch["receptor_seq"]),
        jnp.asarray(batch["receptor_angles"]),
        jnp.asarray(batch["receptor_attn_mask"]))["params"]
    return model, params


def _sequence_model_and_params(ds):
    model = SequenceDenoiser(_tiny_cfg(False, "xavier_all"),
                             _tiny_cfg(True, "xavier_all"))
    batch = next(ds.batches(4))
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((4, 1)),
        jnp.asarray(batch["ligand_seq"]),
        jnp.asarray(batch["ligand_angles"]),
        jnp.asarray(batch["ligand_attn_mask"]),
        jnp.asarray(batch["receptor_seq"]),
        jnp.asarray(batch["receptor_angles"]),
        jnp.asarray(batch["receptor_attn_mask"]))["params"]
    return model, params


def test_structure_sampling_trajectory_layout():
    ds = _dataset()
    model, params = _structure_model_and_params(ds)
    diff = GaussianAngleDiffusion.cosine(12)
    out = sample_structure_batches(
        params, model, diff, ds.batches(4), jax.random.PRNGKey(2),
        first_batch_only=True)
    # Q5: first batch only -> 4 samples, trajectory-major (T, len_i, 8)
    assert len(out) == 4
    lengths = ds.arrays["ligand_length"][:4]
    for s, l in zip(out, lengths):
        assert s.shape == (12, l, 8)
        assert np.all(np.abs(s) <= np.pi + 1e-5)

    out_all = sample_structure_batches(
        params, model, diff, ds.batches(4), jax.random.PRNGKey(2),
        first_batch_only=False, return_trajectory=False)
    assert len(out_all) == len(ds)
    assert out_all[0].ndim == 2


def test_structure_sampling_stride():
    ds = _dataset(4)
    model, params = _structure_model_and_params(ds)
    diff = GaussianAngleDiffusion.cosine(12)
    out = sample_structure_batches(
        params, model, diff, ds.batches(4), jax.random.PRNGKey(3), step=3)
    assert out[0].shape[0] == 4  # ceil(12/3) steps recorded


def test_sequence_sampling_outputs():
    ds = _dataset()
    model, params = _sequence_model_and_params(ds)
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=8)
    res = sample_sequence_batches(
        params, model, d3pm, ds.batches(4), jax.random.PRNGKey(4))
    assert len(res["recovery_rate"]) == len(ds)
    for rec, pred, true in zip(res["recovery_rate"],
                               res["predict_sequence"], res["true_sequence"]):
        assert 0.0 <= rec <= 1.0
        assert len(pred) == len(true) > 0
    assert res["structure_ids"][0].startswith("syn")


def test_sampler_jit_program_cache():
    """Repeated make_*_sampler calls with identical (model, diffusion,
    flags) must return the SAME jitted function (a fresh closure per call
    would recompile — 30-340 s through the remote TPU tunnel)."""
    from e3diff_tpu.sampling.sequence import make_sequence_sampler
    from e3diff_tpu.sampling.structure import make_structure_sampler

    ds = _dataset(2)
    smodel, _ = _structure_model_and_params(ds)
    diff = GaussianAngleDiffusion.cosine(4)
    a = make_structure_sampler(smodel, diff, step=1, return_trajectory=False)
    b = make_structure_sampler(smodel, diff, step=1, return_trajectory=False)
    # the guidance-scale binder returns a fresh thin wrapper per call, but
    # the jitted program underneath (``.inner``) must be the cached one
    assert a.inner is b.inner
    c = make_structure_sampler(smodel, diff, step=2, return_trajectory=False)
    assert c.inner is not a.inner

    qmodel, _ = _sequence_model_and_params(ds)
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=4)
    d = make_sequence_sampler(qmodel, d3pm, diverse=True)
    assert make_sequence_sampler(qmodel, d3pm, diverse=True).inner is d.inner
    assert make_sequence_sampler(qmodel, d3pm, diverse=False).inner is not d.inner


def test_pad_generated_zero_valid_batch():
    """A batch with zero valid rows must not index into an empty chunk."""
    from e3diff_tpu.sampling.pipeline import _pad_generated

    batches = [
        {"ligand_angles": np.zeros((2, 16, 8)), "num_valid": 2},
        {"ligand_angles": np.zeros((2, 16, 8)), "num_valid": 0},
    ]
    angles = [np.full((5, 8), 1.0), np.full((7, 8), 2.0)]
    chunks = _pad_generated(angles, 16, batches)
    assert [c.shape for c in chunks] == [(2, 16, 8), (2, 16, 8)]
    np.testing.assert_array_equal(chunks[1], 0.0)
    np.testing.assert_array_equal(chunks[0][0, :5], 1.0)
    np.testing.assert_array_equal(chunks[0][1, 7:], 0.0)


def test_full_pipeline(tmp_path):
    ds = _dataset(5)
    smodel, sparams = _structure_model_and_params(ds)
    qmodel, qparams = _sequence_model_and_params(ds)
    res = run_pipeline(
        sparams, smodel, qparams, qmodel, ds, jax.random.PRNGKey(5),
        batch_size=4, structure_timesteps=6, sequence_timesteps=4,
        pdb_outdir=str(tmp_path / "pdbs"))
    assert len(res["recovery_rate"]) == 5
    assert len(res["generated_angles"]) == 5
    assert len(res["pdb_paths"]) == 5
    ok = [p for p in res["pdb_paths"] if p]
    assert len(ok) >= 4  # NaN guard may occasionally skip one
    text = open(ok[0]).read()
    assert text.startswith("ATOM")


def test_jit_sampler_cache_reuse_and_lru():
    from e3diff_tpu.utils.jit_cache import JitSamplerCache

    cache = JitSamplerCache(maxsize=2)
    m1, m2, m3 = object(), object(), object()
    cache.put(("a",), "fn1", m1)
    assert cache.get(("a",), m1) == "fn1"
    # identity revalidation: same key, different pinned object -> miss
    assert cache.get(("a",), m2) is None
    cache.put(("b",), "fn2", m2)
    cache.get(("a",), m1)  # touch a so b is LRU
    cache.put(("c",), "fn3", m3)  # evicts b
    assert cache.get(("b",), m2) is None
    assert cache.get(("a",), m1) == "fn1"
    assert cache.get(("c",), m3) == "fn3"


def test_make_structure_sampler_cache_hit():
    """Same (model, diffusion, flags) must return the SAME compiled
    callable (a fresh closure would repay a full remote recompile)."""
    from e3diff_tpu.diffusion import GaussianAngleDiffusion
    from e3diff_tpu.models import StructureDenoiser, TransformerConfig
    from e3diff_tpu.sampling.structure import make_structure_sampler

    cfg = TransformerConfig(hidden_size=32, num_heads=2, num_layers=1,
                            intermediate_size=48,
                            max_position_embeddings=8)
    ccfg = TransformerConfig(hidden_size=32, num_heads=2, num_layers=1,
                             intermediate_size=48,
                             max_position_embeddings=8,
                             add_cross_attention=True)
    model = StructureDenoiser(cfg, ccfg)
    diff = GaussianAngleDiffusion.cosine(4)
    s1 = make_structure_sampler(model, diff, return_trajectory=False)
    s2 = make_structure_sampler(model, diff, return_trajectory=False)
    assert s1.inner is s2.inner   # same cached jit under the scale binder
    s3 = make_structure_sampler(model, diff, return_trajectory=True)
    assert s3.inner is not s1.inner


def test_ddim_sampler_math_and_wiring():
    """DDIM correctness pins that don't need a trained model:
    (a) with a perfect denoiser (eps_hat == the true noise used to build
    x_t from a known x0), ONE eta=0 DDIM jump from any t straight to
    x0 recovers x0 exactly — the property the reference's stride skip
    lacks; (b) the scan sampler is deterministic at eta=0 and produces
    wrapped outputs; (c) n_steps controls the trajectory length."""
    diff = GaussianAngleDiffusion.cosine(100)
    rng = np.random.default_rng(0)
    b, l, f = 4, 6, 8
    x0 = jnp.asarray(rng.uniform(-np.pi / 2, np.pi / 2, (b, l, f)),
                     jnp.float32)

    # (a) exact one-jump inversion with the true eps (t well inside)
    t = jnp.full((b,), 60, jnp.int32)
    eps = jnp.asarray(rng.normal(size=(b, l, f)), jnp.float32) * 0.3
    a_t = diff.terms["alphas_cumprod"][t][:, None, None]
    x_t = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps  # unwrapped on purpose
    x_rec = diff.ddim_step(jax.random.PRNGKey(0), x_t, eps, t,
                           jnp.full((b,), -1, jnp.int32), eta=0.0)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x0), atol=1e-5)

    # (b, c) full scan: deterministic at eta=0, shape (n_steps, ...)
    def fake_denoise(t_vec, x):
        return 0.1 * x  # any fixed function of (t, x)

    x_init = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, l, f)), jnp.float32)
    f1, traj = diff.sample_loop_ddim(fake_denoise, jax.random.PRNGKey(1),
                                     x_init, n_steps=7, eta=0.0,
                                     return_trajectory=True)
    f2, _ = diff.sample_loop_ddim(fake_denoise, jax.random.PRNGKey(2),
                                  x_init, n_steps=7, eta=0.0,
                                  return_trajectory=True)
    assert traj.shape == (7, b, l, f)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=0)
    assert float(jnp.max(jnp.abs(f1))) <= np.pi + 1e-6

    # n_steps=1 starts at the NOISE end: one-shot x0 via the denoiser
    # (regression: linspace(0, T-1, 1) = [0] returned wrapped x_init)
    f1s, _ = diff.sample_loop_ddim(fake_denoise, jax.random.PRNGKey(1),
                                   x_init, n_steps=1, eta=0.0)
    a_top = float(diff.terms["alphas_cumprod"][diff.timesteps - 1])
    want = np.asarray((x_init - np.sqrt(1 - a_top) * 0.1 * x_init)
                      / np.sqrt(a_top))
    want = np.mod(want + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(np.asarray(f1s), want, atol=1e-3)

    # eta=1 with different keys must differ (stochastic path live)
    f3, _ = diff.sample_loop_ddim(fake_denoise, jax.random.PRNGKey(1),
                                  x_init, n_steps=7, eta=1.0)
    f4, _ = diff.sample_loop_ddim(fake_denoise, jax.random.PRNGKey(2),
                                  x_init, n_steps=7, eta=1.0)
    assert float(jnp.max(jnp.abs(f3 - f4))) > 1e-4


def test_structure_sampler_ddim_wiring():
    """make_structure_sampler(sampler='ddim') runs end-to-end through a
    real (tiny) model and honors ddim_steps in the trajectory."""
    from e3diff_tpu.sampling.structure import make_structure_sampler

    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(40)
    b, llig, lrec = 2, 8, 16
    rng = np.random.default_rng(1)
    batch = {
        "ligand_angles": jnp.zeros((b, llig, 8)),
        "ligand_attn_mask": jnp.ones((b, llig)),
        "receptor_seq": jnp.asarray(
            np.eye(20, dtype=np.float32)[rng.integers(0, 20, (b, lrec))]),
        "receptor_angles": jnp.asarray(
            rng.uniform(-np.pi, np.pi, (b, lrec, 8)).astype(np.float32)),
        "receptor_attn_mask": jnp.ones((b, lrec)),
    }
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
        batch["ligand_angles"], batch["ligand_attn_mask"],
        batch["receptor_seq"], batch["receptor_angles"],
        batch["receptor_attn_mask"])["params"]
    run = make_structure_sampler(model, diff, sampler="ddim",
                                 ddim_steps=5, return_trajectory=True)
    final, traj = run(params, batch, jax.random.PRNGKey(3))
    assert traj.shape[0] == 5 and final.shape == (b, llig, 8)
    assert np.isfinite(np.asarray(final)).all()


def test_d3pm_skip_sampling():
    """Skip loop: n_steps=None equals the explicit full ladder bit-for-bit;
    a short ladder runs the right number of model calls and returns valid
    logits."""
    from e3diff_tpu.ops import UniformTransition

    d3pm = D3PMDiffusion.create(UniformTransition(20), timesteps=20)
    b, l, k = 3, 6, 20
    x0 = d3pm.init_noise(jax.random.PRNGKey(0), b, l)

    def fake_denoise(s_arr, x):
        return 2.0 * x - 1.0 + 0.01 * s_arr[:, :, None]

    full_a = d3pm.sample_loop(fake_denoise, jax.random.PRNGKey(1), x0)
    full_b = d3pm.sample_loop(fake_denoise, jax.random.PRNGKey(1), x0,
                              n_steps=None)
    np.testing.assert_array_equal(np.asarray(full_a), np.asarray(full_b))

    short = d3pm.sample_loop(fake_denoise, jax.random.PRNGKey(1), x0,
                             n_steps=5)
    assert short.shape == (b, l, k)
    assert np.isfinite(np.asarray(short)).all()
    # the short ladder is a different program with different draws
    assert np.abs(np.asarray(short) - np.asarray(full_a)).max() > 1e-6


def test_cross_kv_cache_bit_identical():
    """Decoder cross-attention k/v cached once per batch (the pocket
    encoding is timestep-independent) must be BIT-identical to
    re-projecting them inside every decode — in both the unrolled and the
    scan_layers parameter layouts (models/blocks.py kv_only/cross_kv;
    the production sampler in sampling/structure.py relies on this)."""
    import dataclasses

    ds = _dataset(4)
    batch = next(ds.batches(4))
    for scan_layers in (False, True):
        enc_cfg = dataclasses.replace(_tiny_cfg(False),
                                      scan_layers=scan_layers)
        dec_cfg = dataclasses.replace(_tiny_cfg(True),
                                      scan_layers=scan_layers)
        model = StructureDenoiser(enc_cfg, dec_cfg)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not isinstance(v, list)}
        t = jnp.arange(4, dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), t, jb["ligand_angles"],
            jb["ligand_attn_mask"], jb["receptor_seq"],
            jb["receptor_angles"], jb["receptor_attn_mask"])["params"]
        enc_out = model.apply(
            {"params": params}, jb["receptor_seq"], jb["receptor_angles"],
            jb["receptor_attn_mask"], method=model.encode_receptor)
        base = model.apply(
            {"params": params}, t, jb["ligand_angles"],
            jb["ligand_attn_mask"], enc_out, jb["receptor_attn_mask"],
            method=model.decode)
        ckv = model.apply({"params": params}, enc_out,
                          method=model.precompute_cross_kv)
        cached = model.apply(
            {"params": params}, t, jb["ligand_angles"],
            jb["ligand_attn_mask"], enc_out, jb["receptor_attn_mask"],
            method=model.decode, cross_kv=ckv)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(cached))
        # layout contract: per-layer tuple (unrolled) / leading layer axis
        # (scan) of (B, Lk, heads, head_dim) pairs
        nh = dec_cfg.num_heads
        hd = dec_cfg.head_dim
        if scan_layers:
            k_all, v_all = ckv
            assert k_all.shape == (dec_cfg.num_layers, 4,
                                   enc_out.shape[1], nh, hd)
        else:
            assert len(ckv) == dec_cfg.num_layers
            assert ckv[0][0].shape == (4, enc_out.shape[1], nh, hd)


def test_structure_sampler_uses_cached_kv_same_result():
    """make_structure_sampler's output is invariant to the kv-cache
    optimization: a hand-rolled uncached reverse loop with the same keys
    produces the same final sample. (T=1 — jit-vs-eager fusion
    differences amplify ~1e-4 per extra step through the chaotic reverse
    iteration even WITHOUT the cache; the per-step MATH is pinned
    bit-identical by test_cross_kv_cache_bit_identical, this test pins
    the sampler WIRING.)"""
    from e3diff_tpu.diffusion.gaussian import sample_wrapped_noise
    from e3diff_tpu.sampling.structure import make_structure_sampler

    ds = _dataset(4)
    model, params = _structure_model_and_params(ds)
    diff = GaussianAngleDiffusion.cosine(1)
    batch = next(ds.batches(4))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}

    run = make_structure_sampler(model, diff, return_trajectory=False)
    final, _ = run(params, jb, jax.random.PRNGKey(7))

    key_init, key_loop = jax.random.split(jax.random.PRNGKey(7))
    x_init = sample_wrapped_noise(key_init, jb["ligand_angles"].shape,
                                  jb["ligand_angles"].dtype)
    enc_out = model.apply(
        {"params": params}, jb["receptor_seq"], jb["receptor_angles"],
        jb["receptor_attn_mask"], method=model.encode_receptor)

    def denoise_uncached(t_vec, x):
        return model.apply(
            {"params": params}, t_vec, x, jb["ligand_attn_mask"],
            enc_out, jb["receptor_attn_mask"], method=model.decode)

    ref, _ = diff.sample_loop(denoise_uncached, key_loop, x_init,
                              return_trajectory=False)
    # atol: the T=1 DDPM step divides by sqrt(alpha_0) with the clipped
    # beta=0.9999, amplifying benign jit-vs-eager fusion diffs (~1e-6 per
    # forward) by ~100x; a real wiring bug (wrong mask/cache) would be O(1)
    np.testing.assert_allclose(np.asarray(final), np.asarray(ref),
                               atol=2e-3)


def test_params_dtype_cast_and_sampler_quality():
    """cast_inference_params semantics + bf16-param sampling stays close
    to f32-param sampling (the --params_dtype bf16 inference fast path)."""
    from e3diff_tpu.utils.params_io import cast_inference_params

    ds = _dataset(4)
    model, params = _structure_model_and_params(ds)

    bf16 = cast_inference_params(params, "bf16")
    leaves = jax.tree.leaves(bf16)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
    # round-trip no-ops
    assert cast_inference_params(params, None) is params
    back = cast_inference_params(bf16, "f32")
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(back))

    # bf16_matmul: >=2-D kernels cast, 1-D leaves (biases/LN affines —
    # the ones whose rounding broke flagship quality, BENCHMARKS.md)
    # stay f32
    mm = cast_inference_params(params, "bf16_matmul")
    mm_leaves = jax.tree.leaves(mm)
    assert any(l.ndim >= 2 for l in mm_leaves)
    assert any(l.ndim < 2 for l in mm_leaves)
    for l in mm_leaves:
        want = jnp.bfloat16 if l.ndim >= 2 else jnp.float32
        assert l.dtype == want, (l.shape, l.dtype)

    # the reverse loop is chaotic (noise re-injection makes pointwise
    # trajectories diverge under ANY weight perturbation), so the
    # numerical pin is on a single denoiser forward: bf16 weight
    # rounding is ~0.4% relative per layer, so outputs stay close;
    # distribution-level sampling quality is pinned on hardware
    # (BENCHMARKS.md "bf16 parameter storage").
    batch = next(ds.batches(4))
    args = (jnp.zeros((4,), jnp.int32),
            jnp.asarray(batch["ligand_angles"]),
            jnp.asarray(batch["ligand_attn_mask"]),
            jnp.asarray(batch["receptor_seq"]),
            jnp.asarray(batch["receptor_angles"]),
            jnp.asarray(batch["receptor_attn_mask"]))
    want = np.asarray(model.apply({"params": params}, *args,
                                  deterministic=True), np.float32)
    got = np.asarray(model.apply({"params": bf16}, *args,
                                 deterministic=True), np.float32)
    err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert err < 0.05, err
    # and the sampler runs end-to-end with bf16 params (wiring check)
    diff = GaussianAngleDiffusion.cosine(4)
    out = sample_structure_batches(
        bf16, model, diff, iter([batch]), jax.random.PRNGKey(9),
        return_trajectory=False)
    assert len(out) == 4 and np.all(np.isfinite(np.asarray(out[0])))


def test_int8_matmul_quantization_semantics_and_sampler():
    """int8_matmul packing: >=2-D kernels become int8+scale dicts, 1-D
    leaves stay f32; dequantization error is bounded by the per-channel
    grid (amax/127 per element, ~0.4% rms); single forwards stay close;
    both samplers run end-to-end on packed params (the scan-body dequant
    wiring)."""
    from e3diff_tpu.utils.params_io import cast_inference_params
    from e3diff_tpu.utils.quant import (
        dequantize_params,
        is_quantized,
        quantize_params_int8,
    )

    ds = _dataset(4)
    model, params = _structure_model_and_params(ds)

    q = cast_inference_params(params, "int8_matmul")
    assert is_quantized(q) and not is_quantized(params)

    # leaf discipline: every >=2-D float leaf packed, 1-D leaves intact
    flat_p = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(params)}
    n_packed = 0
    dq = dequantize_params(q)
    flat_dq = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(dq)}
    assert set(flat_p) == set(flat_dq)
    for key, w in flat_p.items():
        got = np.asarray(flat_dq[key], np.float32)
        w = np.asarray(w, np.float32)
        if w.ndim < 2:
            np.testing.assert_array_equal(got, w)
        else:
            n_packed += 1
            # per-element error bounded by half a quantization step
            # (scale = amax/127 over the contraction axis) plus the
            # bf16 round of the dequant product
            step = np.max(np.abs(w), axis=-2, keepdims=True) / 127.0
            bound = 0.5 * step + 0.01 * np.abs(w) + 1e-8
            assert np.all(np.abs(got - w) <= bound), key
    assert n_packed > 0

    # quantizing twice is rejected-by-construction (packed leaves are
    # dicts, not arrays — idempotency via is_quantized gate upstream)
    assert is_quantized(q)

    # single-forward closeness (int8 is lossy; ~0.4% kernel rms -> a few
    # % output error on this tiny random model)
    batch = next(ds.batches(4))
    args = (jnp.zeros((4,), jnp.int32),
            jnp.asarray(batch["ligand_angles"]),
            jnp.asarray(batch["ligand_attn_mask"]),
            jnp.asarray(batch["receptor_seq"]),
            jnp.asarray(batch["receptor_angles"]),
            jnp.asarray(batch["receptor_attn_mask"]))
    want = np.asarray(model.apply({"params": params}, *args,
                                  deterministic=True), np.float32)
    got = np.asarray(model.apply({"params": dequantize_params(q)}, *args,
                                 deterministic=True), np.float32)
    err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert err < 0.10, err

    # structure sampler end-to-end on packed params
    diff = GaussianAngleDiffusion.cosine(4)
    out = sample_structure_batches(
        q, model, diff, iter([batch]), jax.random.PRNGKey(9),
        return_trajectory=False)
    assert len(out) == 4 and np.all(np.isfinite(np.asarray(out[0])))
    # and with CFG (guided program also dequantizes per step)
    out_g = sample_structure_batches(
        q, model, diff, iter([batch]), jax.random.PRNGKey(9),
        return_trajectory=False, guidance_scale=1.5)
    assert len(out_g) == 4 and np.all(np.isfinite(np.asarray(out_g[0])))


def test_int8_matmul_sequence_sampler_runs():
    from e3diff_tpu.diffusion import D3PMDiffusion
    from e3diff_tpu.ops import UniformTransition
    from e3diff_tpu.sampling.sequence import sample_sequence_batches
    from e3diff_tpu.utils.params_io import cast_inference_params

    ds = _dataset(4)
    model, params = _sequence_model_and_params(ds)
    q = cast_inference_params(params, "int8_matmul")
    d3pm = D3PMDiffusion.create(UniformTransition(20), timesteps=5)
    batch = next(ds.batches(4))
    out = sample_sequence_batches(q, model, d3pm, iter([batch]),
                                  jax.random.PRNGKey(3))
    assert len(out["predict_sequence"]) == 4
    assert all(len(s) > 0 for s in out["predict_sequence"])
