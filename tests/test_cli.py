"""CLI regression tests: run every entry script end-to-end on tiny
synthetic configs (CPU). Mirrors a user driving the framework."""

import os
import pickle
import sys

import numpy as np
import pytest

TINY = ["--batch_size", "8", "--max_seq_len", "48", "--ligand_max_len", "16",
        "--hidden_size", "32", "--num_heads", "4", "--num_hidden_layers", "2",
        "--intermediate_size", "64", "--bf16", "false", "--pocket_ext", "1"]


def _run(module_name, argv, monkeypatch):
    import importlib

    monkeypatch.setattr(sys, "argv", argv)
    mod = importlib.import_module(module_name)
    mod.main()


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train tiny structure+sequence models once for the sampling CLIs."""
    import importlib

    base = tmp_path_factory.mktemp("cli")
    s_dir, q_dir = str(base / "s"), str(base / "q")
    for mod_name, ckpt, extra in [
        ("scripts.train_structure", s_dir, ["--timesteps", "20"]),
        ("scripts.train_sequence", q_dir, ["--timesteps", "10"]),
    ]:
        argv = [mod_name, "--data_file", "x", "--synthetic",
                "--synthetic_n", "24", "--ckpt_dir", ckpt,
                "--max_epochs", "1", "--min_epochs", "1"] + TINY + extra
        old = sys.argv
        sys.argv = argv
        try:
            importlib.import_module(mod_name).main()
        finally:
            sys.argv = old
    return base, s_dir, q_dir


def test_sample_structure_cli(trained, monkeypatch):
    base, s_dir, _ = trained
    out = str(base / "angles.pkl")
    _run("scripts.sample_structure",
         ["x", "--data_file", "x", "--synthetic", "--ckpt", f"{s_dir}/final",
          "--output", out, "--timesteps", "20", "--all_batches",
          "--no_trajectory"] + TINY, monkeypatch)
    with open(out, "rb") as f:
        sampled = pickle.load(f)
    assert len(sampled) >= 1
    assert sampled[0].ndim == 2 and sampled[0].shape[1] == 8


def test_create_pdb_and_evaluate_cli(trained, monkeypatch, capsys):
    base, s_dir, _ = trained
    angles = str(base / "angles.pkl")
    _run("scripts.create_pdb",
         ["x", "--input", angles, "--outdir", str(base / "pdbs")],
         monkeypatch)
    out = capsys.readouterr().out
    assert "PDBs" in out

    _run("scripts.evaluate",
         ["x", "--data_file", "x", "--synthetic", "--synthetic_n", "32",
          "--angles", angles] + TINY, monkeypatch)
    out = capsys.readouterr().out
    assert "TV distance" in out


def test_sample_sequence_cli(trained, monkeypatch, capsys):
    base, _, q_dir = trained
    out_path = str(base / "seqs.pkl")
    _run("scripts.sample_sequence",
         ["x", "--data_file", "x", "--synthetic", "--ckpt", f"{q_dir}/final",
          "--output", out_path, "--timesteps", "10"] + TINY, monkeypatch)
    with open(out_path, "rb") as f:
        res = pickle.load(f)
    assert len(res["recovery_rate"]) >= 1
    assert all(0 <= r <= 1 for r in res["recovery_rate"])

    _run("scripts.evaluate",
         ["x", "--data_file", "x", "--synthetic", "--synthetic_n", "32",
          "--sequences", out_path] + TINY, monkeypatch)
    assert "recovery mean" in capsys.readouterr().out


def test_sample_by_generated_angles_cli(trained, monkeypatch, capsys):
    base, _, q_dir = trained
    _run("scripts.sample_by_generated_angles",
         ["x", "--data_file", "x", "--synthetic", "--ckpt", f"{q_dir}/final",
          "--generated", str(base / "angles.pkl"),
          "--output", str(base / "gen_seqs.pkl"),
          "--timesteps", "10"] + TINY, monkeypatch)
    assert "recovery rate" in capsys.readouterr().out


def test_convert_data_cli(tmp_path, monkeypatch):
    import torch

    from e3diff_tpu.data import load_complexes, synthetic_complexes

    data = synthetic_complexes(n=4, seed=2)
    torch_data = []
    for d in data:
        td = dict(d)
        for k in ["coors", "numerical_features", "angle_features",
                  "edge_index", "ligand_idx", "pocket_idx",
                  "ligand_mask", "pocket_mask"]:
            td[k] = torch.tensor(np.asarray(d[k]))
        torch_data.append(td)
    src = str(tmp_path / "d.pt")
    dst = str(tmp_path / "d.pkl")
    torch.save(torch_data, src)

    _run("scripts.convert_data", ["x", "--input", src, "--output", dst],
         monkeypatch)
    out = load_complexes(dst)
    assert len(out) == 4
    np.testing.assert_allclose(out[0]["angle_features"],
                               data[0]["angle_features"], atol=1e-6)


def test_parse_bool_flag_strict():
    """Bool flags accept common spellings case-insensitively and reject
    junk ('--scan_layers True' silently parsing as False was an r2 review
    finding)."""
    import pytest

    from e3diff_tpu.utils.presets import parse_bool_flag

    for s in ("true", "True", "TRUE", "1", "yes", "on"):
        assert parse_bool_flag(s) is True, s
    for s in ("false", "False", "0", "no", "off"):
        assert parse_bool_flag(s) is False, s
    with pytest.raises(ValueError):
        parse_bool_flag("maybe")


def test_compile_cache_toggle(tmp_path, monkeypatch):
    import jax

    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    monkeypatch.setenv("E3DIFF_COMPILE_CACHE", "0")
    assert enable_persistent_compilation_cache() is None

    target = str(tmp_path / "xla_cache")
    monkeypatch.setenv("E3DIFF_COMPILE_CACHE", target)
    before = jax.config.jax_compilation_cache_dir
    try:
        assert enable_persistent_compilation_cache() == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_sample_structure_adopts_ckpt_sidecar(trained, monkeypatch):
    """Sampling with ONLY --ckpt (no architecture flags): the config.json
    sidecar written by training must supply the trained architecture —
    this exact flow used to die in flax param-shape errors."""
    base, s_dir, _ = trained
    out = str(base / "angles_sidecar.pkl")
    _run("scripts.sample_structure",
         ["x", "--data_file", "x", "--synthetic", "--ckpt", f"{s_dir}/final",
          "--output", out, "--batch_size", "8", "--bf16", "false",
          "--all_batches", "--no_trajectory"], monkeypatch)
    with open(out, "rb") as f:
        sampled = pickle.load(f)
    assert len(sampled) >= 1 and sampled[0].shape[1] == 8


def test_train_cli_resume_at_completion(trained, monkeypatch, capsys):
    """Re-running a finished training resumes past max_epochs: must not
    crash on the empty epoch history and must not clobber history.json."""
    import json

    base, s_dir, _ = trained
    with open(f"{s_dir}/history.json") as f:
        before = json.load(f)
    assert before  # the original run recorded epochs
    _run("scripts.train_structure",
         ["x", "--data_file", "x", "--synthetic", "--synthetic_n", "24",
          "--ckpt_dir", s_dir, "--max_epochs", "1", "--min_epochs", "1",
          "--timesteps", "20"] + TINY, monkeypatch)
    out = capsys.readouterr().out
    assert "no epochs to run" in out
    with open(f"{s_dir}/history.json") as f:
        assert json.load(f) == before  # untouched


def test_preprocess_check_env_probe(monkeypatch, capsys):
    """README runbook step 0: the --check-env probe reports which engine
    engine=auto will run. In this environment (no biopython/mkdssp) that
    is the native engine, exit code 0 (pandas present)."""
    with pytest.raises(SystemExit) as e:
        _run("scripts.preprocess", ["x", "--check-env"], monkeypatch)
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "MISS biopython" in out
    assert "native engine" in out
    assert "ok   pandas" in out


def test_train_cli_profile_dir(tmp_path, monkeypatch, capsys):
    """--profile_dir traces one epoch and prints the device-bucket digest
    (training/loop.py _log_profile_summary over utils/xplane.py)."""
    prof = str(tmp_path / "prof")
    _run("scripts.train_sequence",
         ["x", "--data_file", "x", "--synthetic", "--synthetic_n", "16",
          "--ckpt_dir", str(tmp_path / "run"), "--max_epochs", "1",
          "--min_epochs", "1", "--timesteps", "10",
          "--profile_dir", prof] + TINY, monkeypatch)
    out = capsys.readouterr().out
    assert "device buckets (ms/step)" in out
    assert "profile roofline" in out
    assert os.path.isdir(os.path.join(prof, "plugins", "profile"))


def test_sample_by_generated_angles_partial_supply(trained, monkeypatch,
                                                   capsys):
    """Fewer generated samples than test complexes: the CLI must clamp
    the kept batches' num_valid to the supply instead of crashing on a
    batch-dim mismatch (review r3)."""
    base, _, q_dir = trained
    with open(base / "angles.pkl", "rb") as f:
        angles = pickle.load(f)
    short = angles[:2]  # fewer than one full batch of valid rows
    with open(base / "angles_short.pkl", "wb") as f:
        pickle.dump(short, f)
    _run("scripts.sample_by_generated_angles",
         ["x", "--data_file", "x", "--synthetic", "--ckpt", f"{q_dir}/final",
          "--generated", str(base / "angles_short.pkl"),
          "--output", str(base / "gen_seqs_short.pkl"),
          "--timesteps", "10"] + TINY, monkeypatch)
    out = capsys.readouterr().out
    assert "restricting" in out
    with open(base / "gen_seqs_short.pkl", "rb") as f:
        res = pickle.load(f)
    assert len(res["recovery_rate"]) == 2  # exactly the supplied designs


def test_prune_ckpt_cli(trained, monkeypatch, capsys):
    """prune_ckpt removes 'last' (+ stray .tmp) but keeps the inference
    artifacts and refuses to run when nothing keepable exists."""
    import shutil

    from e3diff_tpu.utils.presets import load_ckpt_config

    base, s_dir, _ = trained
    run = str(base / "prune_me")
    shutil.copytree(s_dir, run)
    os.makedirs(os.path.join(run, "last.orbax-checkpoint-tmp.tmp"),
                exist_ok=True)

    _run("scripts.prune_ckpt", ["x", run, "--dry_run"], monkeypatch)
    assert os.path.isdir(os.path.join(run, "last"))  # dry run: untouched

    _run("scripts.prune_ckpt", ["x", run], monkeypatch)
    assert not os.path.isdir(os.path.join(run, "last"))
    assert not os.path.isdir(os.path.join(run,
                                          "last.orbax-checkpoint-tmp.tmp"))
    assert os.path.isdir(os.path.join(run, "final"))
    assert load_ckpt_config(run) is not None      # sidecar survives
    out = capsys.readouterr().out
    assert "freed" in out

    # a dir with no keepable artifact is refused
    import pytest

    empty = str(base / "empty_run")
    os.makedirs(empty, exist_ok=True)
    with pytest.raises(SystemExit, match="NO usable weights"):
        _run("scripts.prune_ckpt", ["x", empty], monkeypatch)
