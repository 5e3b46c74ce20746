"""Checkpoint config sidecar: training saves config.json next to the
checkpoints; sampling CLIs adopt checkpoint-bound fields (architecture,
diffusion, data shapes) unless the user overrides them explicitly.
Regression for the flax ScopeParamShapeError a mismatched --ckpt used to
produce (ext4/L=128 checkpoint vs an ext0/L=64 sampling default)."""

import argparse
import dataclasses
import os

from e3diff_tpu.utils.presets import (
    CKPT_BOUND_FIELDS,
    ExperimentConfig,
    add_config_flags,
    adopt_ckpt_config,
    config_from_args,
    load_ckpt_config,
    save_config,
    structure_sample_config,
    structure_train_config,
)


def _cli(argv):
    parser = argparse.ArgumentParser()
    add_config_flags(parser, structure_sample_config())
    args = parser.parse_args(argv)
    return parser, args


def test_save_and_load_roundtrip(tmp_path):
    cfg = structure_train_config(min_epochs=8, max_epochs=8)
    path = save_config(cfg, str(tmp_path / "run"))
    assert os.path.basename(path) == "config.json"
    side = load_ckpt_config(str(tmp_path / "run"))
    assert side == dataclasses.asdict(cfg)
    # a checkpoint INSIDE the run dir resolves to the same sidecar
    os.makedirs(tmp_path / "run" / "final")
    assert load_ckpt_config(str(tmp_path / "run" / "final")) == side


def test_adopt_fills_unset_flags(tmp_path):
    save_config(structure_train_config(), str(tmp_path))  # ext4 / L=128
    parser, args = _cli([])  # sampling defaults: ext0 / L=64
    cfg = config_from_args(args)
    assert (cfg.pocket_ext, cfg.max_seq_len) == (0, 64)
    cfg, adopted = adopt_ckpt_config(cfg, parser,
                                     str(tmp_path / "final"), argv=[])
    assert (cfg.pocket_ext, cfg.max_seq_len) == (4, 128)
    assert set(adopted) == {"pocket_ext", "max_seq_len"}


def test_explicit_flag_beats_sidecar(tmp_path):
    save_config(structure_train_config(), str(tmp_path))
    argv = ["--max_seq_len", "96"]
    parser, args = _cli(argv)
    cfg = config_from_args(args)
    cfg, adopted = adopt_ckpt_config(cfg, parser, str(tmp_path),
                                     argv=argv)
    assert cfg.max_seq_len == 96          # user flag wins
    assert cfg.pocket_ext == 4            # unset flag still adopted
    assert "max_seq_len" not in adopted


def test_explicit_flag_equal_to_default_beats_sidecar(tmp_path):
    """Explicitly repeating the preset default must NOT be overridden
    by the sidecar (argv-based detection, not value-vs-default)."""
    save_config(structure_train_config(), str(tmp_path))  # trained L=128
    argv = ["--max_seq_len", "64"]  # == the sampling preset default
    parser, args = _cli(argv)
    cfg = config_from_args(args)
    cfg, adopted = adopt_ckpt_config(cfg, parser, str(tmp_path),
                                     argv=argv)
    assert cfg.max_seq_len == 64
    assert "max_seq_len" not in adopted
    assert "max_seq_len=64" not in str(adopted)


def test_no_sidecar_is_noop(tmp_path):
    parser, args = _cli([])
    cfg = config_from_args(args)
    cfg2, adopted = adopt_ckpt_config(cfg, parser,
                                      str(tmp_path / "weights.pt"),
                                      argv=[])
    assert cfg2 == cfg and adopted == {}


def test_abbreviated_flag_beats_sidecar(tmp_path):
    """argparse accepts unambiguous prefix abbreviations ('--timest 100');
    an abbreviated explicit flag must count as explicit (advisor r2)."""
    save_config(structure_train_config(), str(tmp_path))  # timesteps=1000
    argv = ["--timest", "100"]
    parser, args = _cli(argv)
    assert args.timesteps == 100  # argparse resolved the abbreviation
    cfg = config_from_args(args)
    cfg, adopted = adopt_ckpt_config(cfg, parser, str(tmp_path),
                                     argv=argv)
    assert cfg.timesteps == 100
    assert "timesteps" not in adopted


def test_ambiguous_prefix_does_not_count_as_explicit(tmp_path):
    """A token that is a prefix of several flags would be an argparse
    error — but a token matching a DIFFERENT flag exactly (e.g. '--lr'
    while checking 'lr_scheduler') must not mark lr_scheduler explicit."""
    save_config(
        structure_train_config(lr_scheduler="Custom"), str(tmp_path))
    argv = ["--lr", "1e-4"]
    parser, args = _cli(argv)
    cfg = config_from_args(args)
    cfg, adopted = adopt_ckpt_config(cfg, parser, str(tmp_path),
                                     argv=argv,
                                     fields=("lr_scheduler",))
    assert adopted == {"lr_scheduler": "Custom"}


def _resumable(run_dir):
    os.makedirs(os.path.join(run_dir, "last"), exist_ok=True)


def test_reconcile_adopts_on_flagless_resume(tmp_path):
    """Resuming without repeating the original flags must adopt the
    run's checkpoint-bound fields instead of silently overwriting the
    sidecar with defaults (advisor r2, medium)."""
    from e3diff_tpu.utils.presets import reconcile_run_config

    run = str(tmp_path / "run")
    # original run trained ext0 / L=64 (non-default flags)
    save_config(structure_train_config(pocket_ext=0, max_seq_len=64), run)
    _resumable(run)
    parser = argparse.ArgumentParser()
    add_config_flags(parser, structure_train_config())
    # resume invocation passes nothing -> preset defaults ext4 / L=128
    cfg = config_from_args(parser.parse_args([]))
    cfg2, adopted = reconcile_run_config(cfg, run, parser, argv=[])
    assert (cfg2.pocket_ext, cfg2.max_seq_len) == (0, 64)
    assert set(adopted) == {"pocket_ext", "max_seq_len"}
    # training-only knobs stay with the new invocation
    assert cfg2.max_epochs == cfg.max_epochs


def test_reconcile_refuses_explicit_mismatch(tmp_path):
    from e3diff_tpu.utils.presets import reconcile_run_config

    import pytest

    run = str(tmp_path / "run")
    save_config(structure_train_config(), run)  # max_seq_len=128
    _resumable(run)
    parser = argparse.ArgumentParser()
    add_config_flags(parser, structure_train_config())
    argv = ["--max_seq_len", "64"]
    cfg = config_from_args(parser.parse_args(argv))
    with pytest.raises(SystemExit, match="different configuration"):
        reconcile_run_config(cfg, run, parser, argv=argv)


def test_reconcile_noop_without_any_checkpoint(tmp_path):
    """A sidecar left by a run that never saved a checkpoint doesn't
    constrain a fresh invocation (nothing to protect)."""
    from e3diff_tpu.utils.presets import reconcile_run_config

    run = str(tmp_path / "run")
    save_config(structure_train_config(), run)
    parser = argparse.ArgumentParser()
    add_config_flags(parser, structure_train_config())
    argv = ["--max_seq_len", "64"]
    cfg = config_from_args(parser.parse_args(argv))
    cfg2, adopted = reconcile_run_config(cfg, run, parser, argv=argv)
    assert cfg2 == cfg and adopted == {}


def test_reconcile_protects_finished_run_without_last(tmp_path):
    """A dir holding 'final' whose multi-GB 'last' was pruned must still
    refuse a conflicting retrain (the sidecar describes the kept
    weights) and adopt checkpoint-bound fields otherwise."""
    import pytest

    from e3diff_tpu.utils.presets import reconcile_run_config

    run = str(tmp_path / "run")
    save_config(structure_train_config(), run)          # max_seq_len=128
    os.makedirs(os.path.join(run, "final"))
    parser = argparse.ArgumentParser()
    add_config_flags(parser, structure_train_config())

    argv = ["--max_seq_len", "64"]
    cfg = config_from_args(parser.parse_args(argv))
    with pytest.raises(SystemExit, match="different"):
        reconcile_run_config(cfg, run, parser, argv=argv)

    cfg = config_from_args(parser.parse_args(["--lr", "1e-4"]))
    cfg2, adopted = reconcile_run_config(cfg, run, parser,
                                         argv=["--lr", "1e-4"])
    assert cfg2.max_seq_len == 128 and cfg2.lr == 1e-4


def test_save_config_atomic_leaves_no_tmp(tmp_path):
    run = str(tmp_path / "run")
    save_config(structure_train_config(), run)
    save_config(structure_sample_config(), run)  # overwrite in place
    leftovers = [f for f in os.listdir(run) if f.endswith(".tmp")]
    assert leftovers == []
    assert load_ckpt_config(run)["pocket_ext"] == 0


def test_ckpt_bound_fields_are_config_fields():
    names = {f.name for f in dataclasses.fields(ExperimentConfig)}
    assert set(CKPT_BOUND_FIELDS) <= names
    # training-only knobs must never be adopted into sampling configs
    assert {"min_epochs", "max_epochs", "lr", "batch_size"}.isdisjoint(
        CKPT_BOUND_FIELDS)


def test_ckpt_mode_flag_roundtrip_and_loop_plumbing():
    """--ckpt_mode (r5): the Q4-faithful 'max' default is overridable to
    'min' so real runs can keep the true best-val weights (the r5
    sequence flagship overfit past epoch ~50 and the faithful mode had
    kept the WORST epoch)."""
    import argparse
    import inspect

    from e3diff_tpu.training.loop import train_loop
    from e3diff_tpu.utils.presets import (
        add_config_flags,
        config_from_args,
        structure_train_config,
    )

    p = argparse.ArgumentParser()
    add_config_flags(p, structure_train_config())
    args = p.parse_args(["--ckpt_mode", "min"])
    cfg = config_from_args(args)
    assert cfg.ckpt_mode == "min"
    assert structure_train_config().ckpt_mode == "max"  # Q4 default
    # and the loop accepts it (both train CLIs pass cfg.ckpt_mode)
    assert "ckpt_mode" in inspect.signature(train_loop).parameters
