"""Golden end-to-end sampling parity vs the reference.

Ports a randomly-initialized reference model's weights, runs the reference
p_sample_loop on CPU with torch.randn_like patched to a recorded noise
sequence, then replays the SAME initial state and noise through our
diffusion math + ported flax model. Trajectories must match step for step
— this pins the full sampler composition (model forward + DDPM posterior +
wrapping) end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from e3diff_tpu.diffusion import GaussianAngleDiffusion  # noqa: E402
from e3diff_tpu.models import StructureDenoiser  # noqa: E402
from e3diff_tpu.ops.angles import wrap_angle  # noqa: E402
from e3diff_tpu.utils.torch_port import port_structure_state_dict  # noqa: E402
from tests.reference_compat import load_reference_module  # noqa: E402
from tests.test_model_parity import _bert_config, _tcfg, _prefix_mask  # noqa: E402
from tests.test_diffusion_parity import _load_structure_sample  # noqa: E402

B, L, T = 2, 16, 5


def test_structure_sampler_trajectory_parity(monkeypatch):
    ref_model_mod = load_reference_module("structure_model", "model")
    ref_sample = _load_structure_sample()
    ref_utils = load_reference_module("structure_model", "utils")

    torch.manual_seed(7)
    model = ref_model_mod.ConditionalBertForDiffusionBase(
        _bert_config(False), _bert_config(True), feature_size=8).eval()

    rng = np.random.default_rng(11)
    x_init = rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(np.float32)
    lig_mask = _prefix_mask([9, 16])
    rec_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    rec_angles = rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(np.float32)
    rec_mask = _prefix_mask([16, 12])
    noises = [rng.normal(size=(B, L, 8)).astype(np.float32)
              for _ in range(T)]

    # --- reference loop with injected noise ---
    noise_iter = iter(list(noises))
    monkeypatch.setattr(
        torch, "randn_like", lambda v: torch.tensor(next(noise_iter)))
    monkeypatch.setattr(ref_sample, "STEP", 1, raising=False)
    betas = ref_utils.cosine_beta_schedule(T)
    want_traj = ref_sample.p_sample_loop(
        model,
        torch.tensor(lig_mask), torch.tensor(x_init),
        torch.tensor(rec_seq), torch.tensor(rec_mask),
        torch.tensor(rec_angles),
        total_timesteps=T, betas=betas, disable_pbar=True).numpy()

    # --- our math, same weights, same noises ---
    params = port_structure_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, 2, 2)
    net = StructureDenoiser(_tcfg(False), _tcfg(True))
    diff = GaussianAngleDiffusion.cosine(T)

    x = jnp.asarray(x_init)
    got_traj = []
    for step, t_index in enumerate(reversed(range(T))):
        t_vec = jnp.full((B,), t_index, jnp.int32)
        eps = net.apply({"params": params}, t_vec, x, jnp.asarray(lig_mask),
                        jnp.asarray(rec_seq), jnp.asarray(rec_angles),
                        jnp.asarray(rec_mask), deterministic=True)
        mean = diff.p_mean(x, eps, t_vec)
        if t_index > 0:
            spv = diff.terms["sqrt_posterior_variance"][t_index]
            x = mean + spv * jnp.asarray(noises[step])
        else:
            x = mean
        x = wrap_angle(x)
        got_traj.append(np.asarray(x))
    got_traj = np.stack(got_traj)

    assert want_traj.shape == got_traj.shape == (T, B, L, 8)
    np.testing.assert_allclose(got_traj, want_traj, atol=5e-4)

    # and the scan-based production sampler agrees with the manual replay
    # in distribution setup (shapes, wrapping); exact equality requires the
    # same RNG stream, covered by test_parallel's single-vs-sharded check.
    assert np.all(np.abs(got_traj) <= np.pi + 1e-5)


def test_sequence_sampler_full_loop_parity(monkeypatch):
    """Full T-step D3PM denoise loop vs the reference with identical
    weights and initial one-hots, argmax mode (fully deterministic)."""
    from e3diff_tpu.diffusion import D3PMDiffusion
    from e3diff_tpu.models import SequenceDenoiser
    from e3diff_tpu.ops import BlosumTransition
    from e3diff_tpu.utils.torch_port import port_sequence_state_dict
    from tests.test_diffusion_parity import _load_sequence_sample
    import os

    ref_model_mod = load_reference_module("sequence_model", "model")
    ref_sample = _load_sequence_sample()
    ref_utils = load_reference_module("sequence_model", "utils")

    T_seq = 5
    torch.manual_seed(8)
    model = ref_model_mod.ConditionalBertForDiffusionBase(
        _bert_config(False), _bert_config(True), feature_size=20).eval()

    rng = np.random.default_rng(13)
    lig_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    lig_angles = rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(np.float32)
    lig_mask = _prefix_mask([7, 16])
    rec_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    rec_angles = rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(np.float32)
    rec_mask = _prefix_mask([16, 10])
    init_onehot = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]

    # --- reference loop (argmax: deterministic given init) ---
    monkeypatch.setitem(ref_sample.CONFIG, "timesteps", T_seq)
    monkeypatch.setattr(
        ref_sample, "generate_discrete_noise",
        lambda b, l, k=20: torch.tensor(init_onehot))
    cwd = os.getcwd()
    os.chdir("/root/reference/sequence_model")
    try:
        transition = ref_utils.BlosumTransition(x_classes=20)
    finally:
        os.chdir(cwd)
    schedule = ref_utils.PredefinedNoiseScheduleDiscrete("cosine", T_seq)
    batch = {
        "ligand_seq": torch.tensor(lig_seq),
        "ligand_attn_mask": torch.tensor(lig_mask),
        "ligand_angles": torch.tensor(lig_angles),
        "receptor_seq": torch.tensor(rec_seq),
        "receptor_angles": torch.tensor(rec_angles),
        "receptor_attn_mask": torch.tensor(rec_mask),
        "structure_ids": {"pdb_id": ["a", "b"], "ligand_chain": ["A", "B"]},
    }
    ids, true_seqs, pred_seqs, rec_rates = ref_sample.denoise(
        batch, model, schedule, transition, diverse=False)

    # --- ours: same weights, same init, argmax ---
    params = port_sequence_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, 2)
    net = SequenceDenoiser(_tcfg(False, "xavier_all"),
                           _tcfg(True, "xavier_all"))
    d3pm = D3PMDiffusion.create(BlosumTransition(), timesteps=T_seq)

    def denoise_fn(s_arr, x):
        return net.apply({"params": params}, s_arr, x,
                         jnp.asarray(lig_angles), jnp.asarray(lig_mask),
                         jnp.asarray(rec_seq), jnp.asarray(rec_angles),
                         jnp.asarray(rec_mask), deterministic=True)

    import jax

    logits = d3pm.sample_loop(denoise_fn, jax.random.PRNGKey(0),
                              jnp.asarray(init_onehot), diverse=False)
    pred = np.asarray(logits.argmax(-1))

    from e3diff_tpu.data.dataset import AA_VOCAB

    for i in range(B):
        m = lig_mask[i].astype(bool)
        got_seq = "".join(AA_VOCAB[c] for c in pred[i][m])
        assert got_seq == pred_seqs[i], (got_seq, pred_seqs[i])
        got_rec = float((pred[i][m] == lig_seq[i].argmax(-1)[m]).mean())
        np.testing.assert_allclose(got_rec, rec_rates[i], atol=1e-6)


def test_structure_training_loss_parity():
    """The full training loss vector (8 per-channel radian losses through
    the real model) matches the reference's _get_loss_terms given identical
    weights, noised inputs, and targets — the 'loss curves match' criterion
    at step granularity."""
    import functools

    from e3diff_tpu.training.structure import structure_loss_terms

    ref = load_reference_module("structure_model", "model")
    torch.manual_seed(9)
    ref_full = ref.ConditionalBertForDiffusion(
        _bert_config(False), _bert_config(True),
        feature_names=["phi", "psi", "omega", "dihedral_o",
                       "tau", "CA:C:1N", "1C:N:CA", "CA:C:O"],
        loss_func=[ref.ConditionalBertForDiffusion.diheral_loss_func] * 4 +
                  [ref.ConditionalBertForDiffusion.angle_loss_func] * 4,
    ).eval()

    rng = np.random.default_rng(17)
    noised = rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(np.float32)
    known_noise = rng.normal(size=(B, L, 8)).astype(np.float32)
    lig_mask = _prefix_mask([6, 16])
    rec_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    rec_ang = rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(np.float32)
    rec_mask = _prefix_mask([16, 14])
    t = np.array([[12], [700]], dtype=np.int64)

    batch = {
        "timestep": torch.tensor(t),
        "known_noise": torch.tensor(known_noise),
        "noised_ligand_angle": torch.tensor(noised),
        "ligand_attn_mask": torch.tensor(lig_mask),
        "receptor_seq": torch.tensor(rec_seq),
        "receptor_angles": torch.tensor(rec_ang),
        "receptor_attn_mask": torch.tensor(rec_mask),
        "ligand_pos_id": None,
        "receptor_pos_id": None,
    }
    with torch.no_grad():
        want = ref_full._get_loss_terms(batch).numpy()

    params = port_structure_state_dict(
        {k: v.numpy() for k, v in ref_full.state_dict().items()}, 2, 2)
    net = StructureDenoiser(_tcfg(False), _tcfg(True))
    pred = net.apply({"params": params}, jnp.asarray(t), jnp.asarray(noised),
                     jnp.asarray(lig_mask), jnp.asarray(rec_seq),
                     jnp.asarray(rec_ang), jnp.asarray(rec_mask),
                     deterministic=True)
    got = np.asarray(structure_loss_terms(
        pred, jnp.asarray(known_noise), jnp.asarray(lig_mask)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_sequence_training_loss_parity():
    """Total sequence loss (CE over noised + ELBO) through the real model
    matches the reference get_loss given identical weights and noised
    one-hots."""
    from e3diff_tpu.models import SequenceDenoiser
    from e3diff_tpu.training.sequence import sequence_losses
    from e3diff_tpu.utils.torch_port import port_sequence_state_dict

    ref = load_reference_module("sequence_model", "model")
    torch.manual_seed(10)
    import os

    cwd = os.getcwd()
    os.chdir("/root/reference/sequence_model")  # BlosumTransition asset path
    try:
        ref_full = ref.PeptideDiff(
            _bert_config(False), _bert_config(True),
            feature_names=list("ACDEFGHIKLMNPQRSTVWY"),
            loss_func=torch.nn.CrossEntropyLoss(),
            noise_schedule="cosine", timesteps=50,
        ).eval()
    finally:
        os.chdir(cwd)

    rng = np.random.default_rng(19)
    lig_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    lig_mask = _prefix_mask([9, 16])
    lig_seq = lig_seq * lig_mask[..., None]   # zero padding rows
    noised = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    # padded positions noise to class 0 like apply_aa_noise's guard
    noised[lig_mask == 0] = np.eye(20, dtype=np.float32)[0]
    lig_ang = rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(np.float32)
    rec_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (B, L))]
    rec_ang = rng.uniform(-np.pi, np.pi, (B, L, 8)).astype(np.float32)
    rec_mask = _prefix_mask([16, 12])
    t_norm = np.array([[0.3], [0.8]], dtype=np.float32)

    batch = {
        "ligand_seq": torch.tensor(lig_seq),
        "ligand_attn_mask": torch.tensor(lig_mask),
        "ligand_angles": torch.tensor(lig_ang),
        "receptor_seq": torch.tensor(rec_seq),
        "receptor_angles": torch.tensor(rec_ang),
        "receptor_attn_mask": torch.tensor(rec_mask),
    }
    with torch.no_grad():
        total, elbo, noised_loss, all_loss, rec_rate, noise_rate = (
            ref_full.get_loss(batch, torch.tensor(t_norm),
                              torch.tensor(noised)))

    params = port_sequence_state_dict(
        {k: v.numpy() for k, v in ref_full.state_dict().items()
         if not k.startswith(("aa_transition_model", "discrete_noise"))}, 2)
    net = SequenceDenoiser(_tcfg(False, "xavier_all"),
                           _tcfg(True, "xavier_all"))
    pred = net.apply({"params": params}, jnp.asarray(t_norm),
                     jnp.asarray(noised), jnp.asarray(lig_ang),
                     jnp.asarray(lig_mask), jnp.asarray(rec_seq),
                     jnp.asarray(rec_ang), jnp.asarray(rec_mask),
                     deterministic=True)
    got_total, metrics = sequence_losses(
        pred, jnp.asarray(noised), jnp.asarray(lig_seq),
        jnp.asarray(lig_mask))
    np.testing.assert_allclose(float(got_total), float(total), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["aa_noised_loss"]),
                               float(noised_loss), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["elbo_loss"]), float(elbo),
                               rtol=2e-4)
    np.testing.assert_allclose(float(metrics["aa_recovery_rate"]),
                               float(rec_rate), atol=1e-6)
    np.testing.assert_allclose(float(metrics["aa_noise_rate"]),
                               float(noise_rate), atol=1e-6)


@pytest.mark.parametrize("grad_clip", [1.0, 0.02])
def test_multi_step_adamw_optimizer_parity(grad_clip):
    """N optimizer steps of the FULL training composition — AdamW
    (decoupled wd=0.1, eps 1e-8) + global-norm clip + per-epoch HF
    LinearWarmup (quirk Q12) — on identical weights, batches, and noise:
    the per-step loss trajectory AND the final weights match the
    reference Lightning recipe end-to-end
    (structure_model/model.py:361-403 configure_optimizers,
    train_model.py:31-34 gradient_clip/l2_norm, Trainer's clip-then-step
    order). grad_clip=1.0 is the reference value; 0.02 forces the clip
    branch to be ACTIVE every step so the clip/AdamW composition is
    exercised, not just present.
    """
    import dataclasses

    import jax
    from transformers import get_linear_schedule_with_warmup

    from e3diff_tpu.training import StructureTrainer, make_optimizer

    ref = load_reference_module("structure_model", "model")
    torch.manual_seed(21)
    bcfg_enc, bcfg_dec = _bert_config(False), _bert_config(True)
    for c in (bcfg_enc, bcfg_dec):
        # train-mode forwards must be deterministic on both sides
        c.hidden_dropout_prob = 0.0
        c.attention_probs_dropout_prob = 0.0
    ref_full = ref.ConditionalBertForDiffusion(
        bcfg_enc, bcfg_dec,
        feature_names=["phi", "psi", "omega", "dihedral_o",
                       "tau", "CA:C:1N", "1C:N:CA", "CA:C:O"],
        loss_func=[ref.ConditionalBertForDiffusion.diheral_loss_func] * 4 +
                  [ref.ConditionalBertForDiffusion.angle_loss_func] * 4,
    ).train()

    N_STEPS, MAX_EPOCHS, LR, WD = 5, 10, 1e-3, 0.1
    T = 50
    diff = GaussianAngleDiffusion.cosine(T)

    def tcfg(cross):
        return dataclasses.replace(_tcfg(cross), dropout=0.0,
                                   attention_dropout=0.0)

    net = StructureDenoiser(tcfg(False), tcfg(True))
    params0 = port_structure_state_dict(
        {k: v.numpy() for k, v in ref_full.state_dict().items()}, 2, 2)
    # steps_per_epoch=1: every optimizer step is an "epoch", so the
    # per-epoch scheduler stepping (Q12) is exercised across the run,
    # including the lr=0 first warmup epoch
    opt = make_optimizer(params0, base_lr=LR, weight_decay=WD,
                         max_epochs=MAX_EPOCHS, steps_per_epoch=1,
                         grad_clip=grad_clip)
    trainer = StructureTrainer(net, diff, opt)

    rng_np = np.random.default_rng(23)
    batches = []
    for _ in range(N_STEPS):
        batches.append({
            "ligand_angles": rng_np.uniform(
                -np.pi, np.pi, (B, L, 8)).astype(np.float32),
            "ligand_attn_mask": _prefix_mask([9, 16]),
            "receptor_seq": np.eye(20, dtype=np.float32)[
                rng_np.integers(0, 20, (B, L))],
            "receptor_angles": rng_np.uniform(
                -np.pi, np.pi, (B, L, 8)).astype(np.float32),
            "receptor_attn_mask": _prefix_mask([16, 11]),
        })

    state = trainer.create_state(jax.random.PRNGKey(0), batches[0])
    state = state.replace(params=jax.tree.map(jnp.asarray, params0))

    optim = torch.optim.AdamW(ref_full.parameters(), lr=LR,
                              weight_decay=WD)
    sched = get_linear_schedule_with_warmup(
        optim, int(MAX_EPOCHS * 0.1), MAX_EPOCHS)

    our_losses, ref_losses, grad_norms = [], [], []
    for s, b in enumerate(batches):
        rng = jax.random.fold_in(jax.random.PRNGKey(3), s)
        # replicate train_step's internal noising (cond_dropout=0:
        # _losses splits rng once, noises with the first half) so the
        # torch side sees the identical (t, noise, x_t)
        t, noise, x_t = diff.noise_batch(
            jax.random.split(rng)[0], jnp.asarray(b["ligand_angles"]))

        tb = {
            "timestep": torch.tensor(
                np.asarray(t)[:, None].astype(np.int64)),
            "known_noise": torch.tensor(np.asarray(noise)),
            "noised_ligand_angle": torch.tensor(np.asarray(x_t)),
            "ligand_attn_mask": torch.tensor(b["ligand_attn_mask"]),
            "receptor_seq": torch.tensor(b["receptor_seq"]),
            "receptor_angles": torch.tensor(b["receptor_angles"]),
            "receptor_attn_mask": torch.tensor(b["receptor_attn_mask"]),
            "ligand_pos_id": None,
            "receptor_pos_id": None,
        }
        loss = ref_full._get_loss_terms(tb).mean()
        optim.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_full.parameters(), grad_clip)
        optim.step()
        sched.step()     # per-EPOCH stepping, steps_per_epoch=1 (Q12)
        ref_losses.append(float(loss.detach()))

        state, metrics = trainer.train_step(
            state, {k: jnp.asarray(v) for k, v in b.items()}, rng)
        our_losses.append(float(metrics["train_loss"]))
        grad_norms.append(float(metrics["grad_norm"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-4)
    if grad_clip < 1.0:
        # the tight-clip variant must actually clip every step
        assert all(g > grad_clip for g in grad_norms), grad_norms
    # final weights after N steps of the full composition
    want = port_structure_state_dict(
        {k: v.numpy() for k, v in ref_full.state_dict().items()}, 2, 2)
    got = state.params
    for (kp, a), (_, b_) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(got),
                   key=lambda kv: jax.tree_util.keystr(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(want),
                   key=lambda kv: jax.tree_util.keystr(kv[0]))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(kp))
