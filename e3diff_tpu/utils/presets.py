"""Experiment presets reproducing the reference's module-level CONFIG dicts.

The reference has no flag system — every entry script carries an inline
CONFIG edited in place (structure_model/train_model.py:18-39,
sample.py:20-41; sequence_model/train_model.py:17-39, sample.py:28-50).
These presets are the typed equivalents; CLIs expose every field as a flag.

max_seq_len rule (reference comment, train_model.py:17): ext<=1 models use
64, larger pocket extensions use 128.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ExperimentConfig:
    # data
    pocket_ext: int = 4
    max_seq_len: int = 128
    ligand_max_len: int | None = None   # bucketed ligand padding (TPU perf);
                                        # None = max_seq_len (reference-faithful)
    # diffusion
    timesteps: int = 1000
    noise_schedule: str = "cosine"
    # model
    num_heads: int = 12
    dropout_p: float = 0.1
    hidden_size: int = 768
    num_hidden_layers: int = 12
    intermediate_size: int = 1024
    position_embedding_type: str = "relative_key"
    # optimization
    lr: float = 5e-5
    l2_norm: float = 0.1
    gradient_clip: float = 1.0
    lr_scheduler: str = "LinearWarmup"
    min_epochs: int = 150
    max_epochs: int = 350
    batch_size: int = 64
    # runtime
    bf16: bool = True
    seed: int = 0
    # save the resumable 'last' checkpoint every N epochs (the best-on-val
    # and final saves are unaffected). Full train state for the 146M model
    # is ~2.3 GB — at every-epoch cadence a slow checkpoint store (e.g. a
    # tunneled host at 5-13 MB/s) costs more than the epoch itself.
    ckpt_every: int = 1
    # best_val_model selection: "max" is Q4-faithful (the reference's
    # ModelCheckpoint(mode="max") on val_loss KEEPS THE WORST epoch —
    # quirk Q4); "min" keeps the true best-val weights. Surfaced by the
    # r5 sequence flagship: past ~epoch 50 the model overfits, and with
    # "max" the deployable best-val artifact is never saved.
    ckpt_mode: str = "max"
    # compile the transformer stacks as one nn.scan'ed layer (≈3x faster
    # cold compiles, ~7% slower steps — use for dev iteration; params get
    # a leading layer axis, converters in models/restack.py)
    scan_layers: bool = False
    # jax.checkpoint policy for layer backward: none | layer | dots
    # (measured: both LOSE at this model's size — kept for larger configs)
    remat: str = "none"
    # exponential moving average of params (0 = off, reference-faithful).
    # When on, training keeps an EMA copy updated each step and the run
    # saves a final_ema params checkpoint alongside final.
    ema_decay: float = 0.0
    # >1: split each batch into accum_steps microbatches scanned inside
    # the jitted step (gradient accumulation) — activation memory drops
    # to a batch_size/accum_steps step, so effective batches past the
    # single-shot OOM point train (--batch_size 256 --accum_steps 4 for
    # the 146M model). batch_size must be divisible by accum_steps.
    accum_steps: int = 1
    # AdamW first-moment dtype: f32 (reference-faithful) or bf16 — halves
    # the mu stream of the HBM-bandwidth-bound train step (BENCHMARKS.md)
    mu_dtype: str = "f32"
    # classifier-free guidance training knob: per-example probability of
    # replacing the conditioning with the null conditioning during
    # training (0 = off, reference-faithful). Checkpoints trained with
    # this respond to --guidance_scale on the sampling CLIs
    # (diffusion/guidance.py).
    cond_dropout: float = 0.0


def structure_train_config(**overrides) -> ExperimentConfig:
    """structure_model/train_model.py:18-39."""
    cfg = ExperimentConfig(pocket_ext=4, max_seq_len=128, timesteps=1000,
                           num_hidden_layers=12, min_epochs=150,
                           max_epochs=350)
    return dataclasses.replace(cfg, **overrides)


def structure_sample_config(**overrides) -> ExperimentConfig:
    """structure_model/sample.py:20-41 (ext0 / max_len 64 test config)."""
    cfg = ExperimentConfig(pocket_ext=0, max_seq_len=64, timesteps=1000,
                           num_hidden_layers=12)
    return dataclasses.replace(cfg, **overrides)


def sequence_train_config(**overrides) -> ExperimentConfig:
    """sequence_model/train_model.py:17-39."""
    cfg = ExperimentConfig(pocket_ext=4, max_seq_len=128, timesteps=50,
                           num_hidden_layers=6, min_epochs=100,
                           max_epochs=150)
    return dataclasses.replace(cfg, **overrides)


def sequence_sample_config(**overrides) -> ExperimentConfig:
    """sequence_model/sample.py:28-50."""
    cfg = ExperimentConfig(pocket_ext=0, max_seq_len=64, timesteps=50,
                           num_hidden_layers=6)
    return dataclasses.replace(cfg, **overrides)


def parse_bool_flag(s: str) -> bool:
    """Strict bool parser: unrecognized spellings error instead of
    silently becoming False (argparse reports the ValueError)."""
    low = s.strip().lower()
    if low in ("true", "1", "yes", "on"):
        return True
    if low in ("false", "0", "no", "off"):
        return False
    raise ValueError(f"expected true/false, got {s!r}")


def add_config_flags(parser, defaults: ExperimentConfig):
    for f in dataclasses.fields(ExperimentConfig):
        val = getattr(defaults, f.name)
        if f.type == "bool" or isinstance(val, bool):
            parser.add_argument(f"--{f.name}", type=parse_bool_flag,
                                default=val)
        else:
            typ = type(val) if val is not None else int
            parser.add_argument(f"--{f.name}", type=typ, default=val)
    return parser


# Fields that must agree with the checkpoint being restored: they size
# the parameter tree (hidden/layers/heads/relative-position table/scan
# layout) or define the diffusion process / data shapes the weights were
# trained against.
CKPT_BOUND_FIELDS = (
    "pocket_ext", "max_seq_len", "ligand_max_len", "timesteps",
    "noise_schedule", "num_heads", "hidden_size", "num_hidden_layers",
    "intermediate_size", "position_embedding_type", "scan_layers",
)

# Additionally bound for TRAIN resumes only: ema_decay on/off changes the
# train-state pytree ('last' holds an ema_params branch) and mu_dtype
# changes the opt-state dtypes, so a resume must match the original run —
# but neither sizes the inference params nor constrains sampling, so they
# stay out of CKPT_BOUND_FIELDS (which sampling CLIs adopt and the
# pipeline cross-checks between models).
TRAIN_BOUND_FIELDS = CKPT_BOUND_FIELDS + ("ema_decay", "mu_dtype")


def save_config(cfg: ExperimentConfig, ckpt_dir: str) -> str:
    """Write the experiment config next to the checkpoints so sampling
    CLIs can recover the trained architecture (config.json sidecar).

    Atomic (temp file + os.replace): concurrent writers — e.g. several
    multihost processes racing before the process-0 gate existed — can
    never leave a torn half-written sidecar."""
    import json
    import os
    import tempfile

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "config.json")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, prefix=".config.", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def reconcile_run_config(cfg: ExperimentConfig, ckpt_dir: str,
                         parser=None, argv=None
                         ) -> tuple[ExperimentConfig, dict]:
    """Make a training invocation consistent with an existing run dir.

    A resume that does not repeat the original flags must not silently
    retrain against different data shapes or clobber the sidecar the
    sampling CLIs rely on. When `ckpt_dir` holds a resumable checkpoint
    ('last') and a config.json sidecar, every CKPT_BOUND_FIELD that
    disagrees is either (a) adopted from the sidecar when the flag was
    NOT given on the command line (resume "just works"), or (b) an error
    when the flag WAS explicit — the dir contains a different run; use a
    fresh --ckpt_dir. Non-checkpoint-bound fields (lr, epochs, ...) are
    free to change. Returns (cfg, adopted)."""
    import os

    side = load_ckpt_config(ckpt_dir)
    # Reconcile against any sidecar that sits next to CHECKPOINTS, not
    # just resumable ones: a dir holding final/best whose 'last' was
    # pruned (it is the multi-GB artifact) must not have its config.json
    # clobbered by a retrain with different shapes — the sampling CLIs
    # would silently adopt wrong values for the old weights. A sidecar
    # with no checkpoint at all (run died before saving) is free.
    has_ckpt = any(os.path.isdir(os.path.join(ckpt_dir, n))
                   for n in ("last", "final", "best_val_model"))
    if side is None or not has_ckpt:
        return cfg, {}
    known = _parser_flag_names(parser)
    adopted, conflicts = {}, []
    for name in TRAIN_BOUND_FIELDS:
        if name not in side or getattr(cfg, name) == side[name]:
            continue
        if _flag_on_command_line(name, argv, known_flags=known):
            conflicts.append(
                f"--{name}={getattr(cfg, name)} vs checkpoint {side[name]}")
        else:
            adopted[name] = side[name]
    if conflicts:
        raise SystemExit(
            f"{ckpt_dir} holds a run trained with a different "
            f"configuration: {'; '.join(conflicts)}. Use a fresh "
            "--ckpt_dir for a new configuration (or drop the flag to "
            "keep the checkpoint's value).")
    if adopted:
        cfg = dataclasses.replace(cfg, **adopted)
        pairs = ", ".join(f"{k}={v}" for k, v in adopted.items())
        print(f"resume: adopted from {ckpt_dir} config.json: {pairs}")
    return cfg, adopted


def load_ckpt_config(ckpt_path: str) -> dict | None:
    """The config.json sidecar for a checkpoint path, or None. Accepts
    either the run directory or a checkpoint inside it (ckpt_dir/final),
    and is a no-op for torch .pt files without a sidecar."""
    import json
    import os

    ckpt_path = os.path.abspath(ckpt_path)
    for d in (ckpt_path, os.path.dirname(ckpt_path)):
        path = os.path.join(d, "config.json")
        if os.path.isfile(path):
            with open(path) as f:
                return json.load(f)
    return None


def _parser_flag_names(parser) -> list[str] | None:
    """All long-option names a parser knows (without the '--'), for
    prefix-abbreviation matching. None when no parser is available."""
    if parser is None:
        return None
    return [s[2:] for a in parser._actions for s in a.option_strings
            if s.startswith("--")]


def _flag_on_command_line(name: str, argv=None, known_flags=None) -> bool:
    """True when --name appeared explicitly (as '--name v' or
    '--name=v'). Value-vs-default comparison can't tell an explicit
    repeat of the default apart from an unset flag; argv can.

    argparse also accepts unambiguous prefix abbreviations ('--timest
    100' for --timesteps), so with `known_flags` (the parser's option
    names) any token that argparse would resolve to `name` counts."""
    import sys

    argv = sys.argv[1:] if argv is None else argv
    for a in argv:
        if not a.startswith("--"):
            continue
        tok = a[2:].split("=", 1)[0]
        if tok == name:
            return True
        if known_flags and tok and name.startswith(tok):
            # abbreviation: argparse resolves it iff exactly one known
            # flag has this prefix (exact matches always win)
            if tok in known_flags:
                continue
            matches = {f for f in known_flags if f.startswith(tok)}
            if matches == {name}:
                return True
    return False


def adopt_ckpt_config(cfg: ExperimentConfig, parser, ckpt_path,
                      fields=CKPT_BOUND_FIELDS, argv=None):
    """Adopt checkpoint-bound fields from the sidecar unless the flag was
    given on the command line (an explicit flag — even repeating the
    default's value — wins). Returns (cfg, adopted {field: value}) and
    prints what changed, so a mismatched --ckpt fails loudly at the flag
    level instead of as a flax shape error."""
    side = load_ckpt_config(ckpt_path)
    if side is None:
        return cfg, {}
    known = _parser_flag_names(parser)
    adopted = {}
    for name in fields:
        if name not in side:
            continue
        if _flag_on_command_line(name, argv, known_flags=known):
            continue  # explicit user override wins
        if getattr(cfg, name) != side[name]:
            adopted[name] = side[name]
    if adopted:
        cfg = dataclasses.replace(cfg, **adopted)
        pairs = ", ".join(f"{k}={v}" for k, v in adopted.items())
        print(f"adopted from {ckpt_path} config.json: {pairs}")
    return cfg, adopted


def config_from_args(args) -> ExperimentConfig:
    # every jit-running CLI funnels through here, so this is the one spot
    # that guarantees the persistent compile cache is on (30-340 s remote
    # compiles otherwise); idempotent, disabled via E3DIFF_COMPILE_CACHE=0
    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    kw = {f.name: getattr(args, f.name)
          for f in dataclasses.fields(ExperimentConfig)}
    return ExperimentConfig(**kw)
