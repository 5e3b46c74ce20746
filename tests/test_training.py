"""End-to-end training smoke tests on synthetic data (tiny models, CPU)."""

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
from e3diff_tpu.training import (
    StructureTrainer,
    SequenceTrainer,
    make_optimizer,
    linear_warmup_per_epoch,
)

MAXLEN = 32


def _tiny_cfg(cross, init_style="torch_default"):
    return TransformerConfig(
        hidden_size=32, num_heads=4, num_layers=2, intermediate_size=64,
        max_position_embeddings=MAXLEN, dropout=0.1, attention_dropout=0.1,
        add_cross_attention=cross, init_style=init_style)


def _data():
    ds = LigandBindingSiteData(
        synthetic_complexes(n=8, seed=3, receptor_len_range=(10, 20),
                            ligand_len_range=(5, 10)),
        None, max_len=MAXLEN, pocket_ext=1)
    return next(ds.batches(8))


def test_lr_schedule_matches_reference_shape():
    """Per-epoch linear warmup: warmup = 10% of max_epochs, decay to 0 at
    max_epochs (Q12)."""
    sched = linear_warmup_per_epoch(5e-5, max_epochs=100, steps_per_epoch=10)
    assert float(sched(jnp.asarray(0))) == 0.0
    np.testing.assert_allclose(float(sched(jnp.asarray(50))), 5e-5 * 5 / 10)
    np.testing.assert_allclose(float(sched(jnp.asarray(100))), 5e-5)   # end of warmup
    np.testing.assert_allclose(float(sched(jnp.asarray(550))), 5e-5 * 0.5)
    assert float(sched(jnp.asarray(999))) <= 5e-5 / 45 + 1e-12


def test_structure_training_reduces_loss():
    batch = {k: v for k, v in _data().items() if k not in ("num_valid", "structure_ids")}
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(100)
    trainer = StructureTrainer(
        model, diff,
        make_optimizer(None, base_lr=2e-3, max_epochs=10, steps_per_epoch=5))
    # optimizer mask needs a params example; rebuild with real params
    state = None
    rng = jax.random.PRNGKey(0)
    params_rng, rng = jax.random.split(rng)
    trainer = StructureTrainer(
        model, diff,
        make_optimizer(
            model.init(params_rng, jnp.zeros((8,), jnp.int32),
                       jnp.asarray(batch["ligand_angles"]),
                       jnp.asarray(batch["ligand_attn_mask"]),
                       jnp.asarray(batch["receptor_seq"]),
                       jnp.asarray(batch["receptor_angles"]),
                       jnp.asarray(batch["receptor_attn_mask"]))["params"],
            base_lr=2e-3, max_epochs=10, steps_per_epoch=5))
    state = trainer.create_state(params_rng, batch)

    losses = []
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    for i in range(30):
        rng, step_rng = jax.random.split(rng)
        state, metrics = trainer.train_step(state, dict(jbatch), step_rng)
        losses.append(float(metrics["train_loss"]))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    # per-feature metrics present
    assert "train_loss_phi" in metrics and "train_loss_CA:C:O" in metrics

    val = trainer.eval_step(state, jbatch, jax.random.PRNGKey(9))
    assert np.isfinite(float(val["val_loss"]))


def test_sequence_training_reduces_loss():
    batch = {k: v for k, v in _data().items() if k not in ("num_valid", "structure_ids")}
    model = SequenceDenoiser(_tiny_cfg(False, "xavier_all"),
                             _tiny_cfg(True, "xavier_all"))
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    rng = jax.random.PRNGKey(1)
    params_rng, rng = jax.random.split(rng)
    params = model.init(
        params_rng, jnp.zeros((8, 1)), jnp.asarray(batch["ligand_seq"]),
        jnp.asarray(batch["ligand_angles"]), jnp.asarray(batch["ligand_attn_mask"]),
        jnp.asarray(batch["receptor_seq"]), jnp.asarray(batch["receptor_angles"]),
        jnp.asarray(batch["receptor_attn_mask"]))["params"]
    trainer = SequenceTrainer(
        model, d3pm,
        make_optimizer(params, base_lr=2e-3, max_epochs=10, steps_per_epoch=5))
    state = trainer.create_state(params_rng, batch)

    losses = []
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    for i in range(30):
        rng, step_rng = jax.random.split(rng)
        state, metrics = trainer.train_step(state, dict(jbatch), step_rng)
        losses.append(float(metrics["train_loss"]))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert 0.0 <= float(metrics["train_aa_recovery_rate"]) <= 1.0
    assert 0.0 <= float(metrics["train_aa_noise_rate"]) <= 1.0


def test_abstract_params_matches_real_init():
    """eval_shape-derived params (the single-init train CLI path) must
    have the identical tree structure/shapes as a real init, and an
    optimizer masked from them must train. Guards the CLIs' switch away
    from the throwaway create_state (VERDICT r2 weak #4)."""
    batch = {k: v for k, v in _data().items()
             if k not in ("num_valid", "structure_ids")}
    rng = jax.random.PRNGKey(0)

    for trainer_cls, model in [
        (StructureTrainer,
         StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))),
        (SequenceTrainer,
         SequenceDenoiser(_tiny_cfg(False, "xavier_all"),
                          _tiny_cfg(True, "xavier_all"))),
    ]:
        diff = (GaussianAngleDiffusion.cosine(100)
                if trainer_cls is StructureTrainer
                else D3PMDiffusion.create(BlosumTransition(), timesteps=50))
        abstract = trainer_cls(model, diff, None).abstract_params(rng, batch)
        trainer = trainer_cls(
            model, diff,
            make_optimizer(abstract, base_lr=2e-3, max_epochs=10,
                           steps_per_epoch=5))
        state = trainer.create_state(rng, batch)
        real = jax.tree.map(lambda x: (x.shape, x.dtype), state.params)
        abst = jax.tree.map(lambda x: (x.shape, x.dtype), abstract)
        assert jax.tree_util.tree_structure(real) == \
            jax.tree_util.tree_structure(abst)
        assert jax.tree.leaves(real) == jax.tree.leaves(abst)
        # one step runs (the decay mask from abstract params is valid)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = trainer.train_step(state, jbatch,
                                            jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["train_loss"]))


def test_fourier_w_is_frozen():
    """The GFP W buffer must not move under training (stop_gradient +
    decay mask)."""
    batch = {k: v for k, v in _data().items() if k not in ("num_valid", "structure_ids")}
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(100)
    rng = jax.random.PRNGKey(2)
    params = model.init(rng, jnp.zeros((8,), jnp.int32),
                        jnp.asarray(batch["ligand_angles"]),
                        jnp.asarray(batch["ligand_attn_mask"]),
                        jnp.asarray(batch["receptor_seq"]),
                        jnp.asarray(batch["receptor_angles"]),
                        jnp.asarray(batch["receptor_attn_mask"]))["params"]
    trainer = StructureTrainer(
        model, diff, make_optimizer(params, base_lr=1e-2,
                                    max_epochs=10, steps_per_epoch=1))
    state = trainer.create_state(rng, batch)
    w_before = np.asarray(state.params["timestep_projector"]["W"])
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    for i in range(3):
        state, _ = trainer.train_step(state, dict(jbatch), jax.random.PRNGKey(i))
    np.testing.assert_array_equal(
        np.asarray(state.params["timestep_projector"]["W"]), w_before)


def test_ckpt_every_controls_last_save_cadence(monkeypatch, tmp_path):
    """ckpt_every=N saves the resumable 'last' checkpoint every N epochs
    plus the final epoch (full train state is ~2.3 GB at 146M scale —
    every-epoch saves dominate wall-clock on slow checkpoint stores)."""
    from e3diff_tpu.training import loop as loop_mod

    saved = []

    class FakeManager:
        def __init__(self, ckpt_dir):
            pass

        def exists(self, name):
            return False

        def save(self, name, payload):
            saved.append((name, payload.get("epoch")))

        def save_final(self, params):
            saved.append(("final", None))

        def close(self):
            pass

    class FakeTrainer:
        def train_step(self, state, batch, rng):
            return state, {"train_loss": 0.0}

    monkeypatch.setattr(loop_mod, "CheckpointManager", FakeManager)
    monkeypatch.setattr(loop_mod, "BestTracker",
                        lambda manager, mode: None)

    import jax

    class FakeState:
        params = {}

    loop_mod.train_loop(
        FakeTrainer(), state=FakeState(),
        train_batches=lambda epoch: [{"x": 0}],
        val_batches=None, rng=jax.random.PRNGKey(0),
        max_epochs=5, ckpt_dir=str(tmp_path), ckpt_every=2,
        log_every=0, log_fn=lambda s: None)

    assert [e for n, e in saved if n == "last"] == [1, 3, 4]
    assert saved[-1] == ("final", None)


def test_ema_tracking_semantics():
    """ema_decay > 0 keeps an EMA copy: initialized to params, updated as
    d*ema + (1-d)*params each step; default-off leaves the state pytree
    unchanged (checkpoint compat)."""
    batch = {k: v for k, v in _data().items()
             if k not in ("num_valid", "structure_ids")}
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(100)

    off = StructureTrainer(
        model, diff, make_optimizer(None, base_lr=1e-3, max_epochs=4,
                                    steps_per_epoch=1))
    assert off.create_state(jax.random.PRNGKey(0), batch).ema_params is None

    d = 0.5
    trainer = StructureTrainer(
        model, diff, make_optimizer(None, base_lr=1e-3, max_epochs=4,
                                    steps_per_epoch=1), ema_decay=d)
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    p0 = jax.tree.map(np.asarray, state.params)
    chex = np.testing.assert_allclose

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, _ = trainer.train_step(state, dict(jbatch), jax.random.PRNGKey(1))
    p1 = jax.tree.map(np.asarray, state.params)
    ema1 = jax.tree.map(np.asarray, state.ema_params)
    for path in [("angles_predictor", "dense1", "kernel"),
                 ("ligand_angle_emb", "linear", "kernel")]:
        a, b, e = p0, p1, ema1
        for k in path:
            a, b, e = a[k], b[k], e[k]
        chex(e, d * a + (1 - d) * b, rtol=1e-5)
        assert np.abs(a - b).max() > 0   # the step actually moved params

    # second step: ema keeps tracking (closer to params than step-1 ema)
    state, _ = trainer.train_step(state, dict(jbatch), jax.random.PRNGKey(2))
    ema2 = jax.tree.map(np.asarray, state.ema_params)
    p2 = jax.tree.map(np.asarray, state.params)
    leaf = lambda t: t["angles_predictor"]["dense1"]["kernel"]
    chex(leaf(ema2), d * leaf(ema1) + (1 - d) * leaf(p2), rtol=1e-5)


def test_accum_grads_match_manual_microbatch_average():
    """accum_steps=n applies the MEAN of the n interleaved-microbatch
    gradients (each microbatch with its own rng fold), exactly as if the
    microbatch value_and_grads were run in a Python loop and averaged."""
    batch = {k: v for k, v in _data().items()
             if k not in ("num_valid", "structure_ids")}
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(100)
    opt = make_optimizer(None, base_lr=1e-3, max_epochs=4, steps_per_epoch=1)
    base = StructureTrainer(model, diff, opt)
    acc = StructureTrainer(model, diff, opt, accum_steps=2)

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(7)

    # manual path: same interleaved split + rng folds the helper documents
    state0 = base.create_state(jax.random.PRNGKey(0), batch)
    rngs = jax.random.split(rng, 2)
    micro = jax.tree.map(
        lambda a: a.reshape(a.shape[0] // 2, 2, *a.shape[1:]), jbatch)
    grads, losses, termss = [], [], []
    for j in range(2):
        mb = jax.tree.map(lambda a: a[:, j], micro)
        (l, t), g = jax.value_and_grad(base._losses, has_aux=True)(
            state0.params, mb, rngs[j], False)
        grads.append(g)
        losses.append(l)
        termss.append(t)
    avg_grads = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    expected = state0.apply_gradients(grads=avg_grads)

    # the helper's gradients == the manual average (f32 summation-order
    # tolerance only)
    from e3diff_tpu.training.optim import accumulated_value_and_grad
    (hl, ht), hg = jax.jit(
        lambda p, b, r: accumulated_value_and_grad(
            lambda pp, bb, rr: base._losses(pp, bb, rr, False),
            p, b, r, 2))(state0.params, jbatch, rng)
    np.testing.assert_allclose(float(hl), float((losses[0] + losses[1]) / 2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ht),
                               np.asarray((termss[0] + termss[1]) / 2),
                               rtol=1e-5, atol=1e-7)
    for (pa, a), (pe, e) in zip(
            jax.tree_util.tree_leaves_with_path(hg),
            jax.tree_util.tree_leaves_with_path(avg_grads)):
        assert pa == pe
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-7, err_msg=str(pa))

    actual0 = acc.create_state(jax.random.PRNGKey(0), batch)
    actual, metrics = acc.train_step(actual0, dict(jbatch), rng)

    np.testing.assert_allclose(
        float(metrics["train_loss"]), float((losses[0] + losses[1]) / 2),
        rtol=1e-6)
    exp_terms = np.asarray((termss[0] + termss[1]) / 2)
    act_terms = np.array([float(metrics[f"train_loss_{n}"])
                          for n in ["phi", "psi", "omega", "dihedral_o",
                                    "tau", "CA:C:1N", "1C:N:CA", "CA:C:O"]])
    np.testing.assert_allclose(act_terms, exp_terms, rtol=1e-5, atol=1e-7)
    import optax
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               float(optax.global_norm(avg_grads)), rtol=1e-5)
    # post-AdamW params: loose tolerance — g/sqrt(v) amplifies summation
    # -order noise wherever a gradient entry is ~0 (the grads themselves
    # are pinned tight above)
    for (pa, a), (pe, e) in zip(
            jax.tree_util.tree_leaves_with_path(actual.params),
            jax.tree_util.tree_leaves_with_path(expected.params)):
        assert pa == pe
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, err_msg=str(pa))


def test_accum_steps_divisibility_errors():
    import pytest

    from e3diff_tpu.training.optim import accumulated_value_and_grad

    with pytest.raises(ValueError, match="not divisible"):
        accumulated_value_and_grad(
            lambda p, b, r: (jnp.sum(p * b.sum()), jnp.zeros(())),
            jnp.ones(3), jnp.ones((7, 2)), jax.random.PRNGKey(0), 2)


def test_sequence_accum_training_reduces_loss():
    """The sequence trainer's accum path trains end-to-end (dict aux
    metrics accumulate through the scan)."""
    data = _data()
    batch = {k: v for k, v in data.items()
             if k not in ("num_valid", "structure_ids")}
    model = SequenceDenoiser(_tiny_cfg(False, "xavier_all"),
                             _tiny_cfg(True, "xavier_all"))
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=50)
    trainer = SequenceTrainer(
        model, d3pm,
        make_optimizer(None, base_lr=2e-3, max_epochs=10, steps_per_epoch=5),
        accum_steps=4)
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        rng, step_rng = jax.random.split(rng)
        state, metrics = trainer.train_step(state, dict(jbatch), step_rng)
        losses.append(float(metrics["train_loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["train_aa_recovery_rate"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_mu_dtype_bf16_state_and_training():
    """mu_dtype='bf16' stores the AdamW first moment in bfloat16 (second
    moment stays f32) and still trains; 'f32' keeps everything f32."""
    batch = {k: v for k, v in _data().items()
             if k not in ("num_valid", "structure_ids")}
    model = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    diff = GaussianAngleDiffusion.cosine(100)

    def mu_nu_dtypes(state):
        adam = state.opt_state[1][0]  # chain(clip, adamw) -> adamw ScaleByAdam
        mu = {str(x.dtype) for x in jax.tree.leaves(adam.mu)}
        nu = {str(x.dtype) for x in jax.tree.leaves(adam.nu)}
        return mu, nu

    tr32 = StructureTrainer(model, diff, make_optimizer(
        None, base_lr=1e-3, max_epochs=4, steps_per_epoch=1, mu_dtype="f32"))
    mu, nu = mu_nu_dtypes(tr32.create_state(jax.random.PRNGKey(0), batch))
    assert mu == {"float32"} and nu == {"float32"}

    tr16 = StructureTrainer(model, diff, make_optimizer(
        None, base_lr=2e-3, max_epochs=10, steps_per_epoch=5,
        mu_dtype="bf16"))
    state = tr16.create_state(jax.random.PRNGKey(0), batch)
    mu, nu = mu_nu_dtypes(state)
    assert mu == {"bfloat16"} and nu == {"float32"}

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(20):
        rng, step_rng = jax.random.split(rng)
        state, metrics = tr16.train_step(state, dict(jbatch), step_rng)
        losses.append(float(metrics["train_loss"]))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    mu, nu = mu_nu_dtypes(state)   # dtype survives the update
    assert mu == {"bfloat16"} and nu == {"float32"}

    import pytest
    with pytest.raises(ValueError, match="mu_dtype"):
        make_optimizer(None, mu_dtype="fp8")
