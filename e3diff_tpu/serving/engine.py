"""Design engine: checkpoints -> batched pocket-conditioned peptide design.

One self-contained object owning both trained models and their jitted
samplers. A design request is a preprocessing-schema complex record (the
reference's biolip.pt element layout, clean_data/data_preprocessing.py:
838-893) or a bare pocket built with :func:`pocket_record`; the engine
featurizes requests into the fixed serving shapes, runs the structure
sampler (DDIM fast path by default — BENCHMARKS.md: quality parity with
the faithful 1000-step loop at 20-40x fewer forwards), rebuilds backbone
PDBs via NERF, and inverse-folds the generated angles with the uniform
transition (the reference's end-to-end pairing,
sample_by_generated_angles.py:253).

TPU serving shape discipline: every device run uses a FIXED compiled
shape — requests are padded into slots, never reshaped. The shapes are
routed per request along three bucket axes (smallest configured bucket
that fits): ligand length, receptor length, and batch size (a partial
micro-batch pads to a small batch shape instead of the full
batch_size). One jitted program per (ligand, receptor, batch, stage)
combination, all compiled at startup (`warmup`); every request
afterwards reuses them.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any, Sequence

import numpy as np

from e3diff_tpu.data.dataset import AA_VOCAB, LigandBindingSiteData
from e3diff_tpu.geometry.pdb import backbone_pdb_text


def _make_batched_nerf():
    """jit(vmap(NERF)) over (B, L, 8) sampled angles -> (B, 4L, 3) coords.

    The host-side per-design NERF loop costs ~3.4 ms/design (measured:
    130 vs 233 designs/s with/without PDBs — BENCHMARKS.md "Serving");
    the scan NERF batches the whole reconstruction into one device call.
    Column mapping = the Q1-faithful chain.py mapping (tau -> CA-C bond
    angle, CA:C:1N -> C-N, 1C:N:CA -> N-CA, CA:C:O -> C-O). Runs
    UNcentered on the padded length: the NERF recurrence at residue i
    depends only on residues <= i, so the valid prefix equals the
    trimmed-chain reconstruction exactly; the caller trims and centers.
    """
    import jax

    from e3diff_tpu.geometry.nerf import nerf_build_backbone

    def one(a):
        return nerf_build_backbone(
            phi=a[:, 0], psi=a[:, 1], omega=a[:, 2], dihedral_o=a[:, 3],
            bond_angle_ca_c=a[:, 4], bond_angle_c_n=a[:, 5],
            bond_angle_n_ca=a[:, 6], bond_angle_c_o=a[:, 7],
            center=False)

    return jax.jit(jax.vmap(one))


@dataclasses.dataclass
class DesignResult:
    sequence: str                 # inverse-folded peptide sequence
    angles: np.ndarray            # (peptide_len, 8) generated backbone angles
    pdb: str | None               # NERF-reconstructed backbone PDB text
    recovery_rate: float | None   # vs the record's true ligand sequence,
                                  # None for synthetic-ligand pocket records


def pocket_record(pocket_seq: str,
                  pocket_angles: np.ndarray,
                  peptide_length: int) -> dict:
    """Build a design-request record from a bare pocket.

    The supplied residues are used VERBATIM as the extended pocket (the
    record is marked ``already_extended`` and featurized with ext=0), so
    callers decide exactly what context the model sees; a dummy
    poly-alanine ligand of ``peptide_length`` fills the slots the sampler
    designs into (its angles start as noise, its sequence is never a
    recovery target — ``synthetic_ligand`` suppresses the metric)."""
    pocket_angles = np.asarray(pocket_angles, np.float32)
    n_pocket = len(pocket_seq)
    if pocket_angles.shape != (n_pocket, 8):
        raise ValueError(
            f"pocket_angles shape {pocket_angles.shape} != ({n_pocket}, 8)")
    if peptide_length < 1:
        raise ValueError("peptide_length must be >= 1")
    bad = sorted(set(pocket_seq) - set(AA_VOCAB))
    if bad:
        raise ValueError(f"unknown residues in pocket_seq: {bad}")
    n = n_pocket + peptide_length
    angles = np.concatenate(
        [pocket_angles, np.zeros((peptide_length, 8), np.float32)])
    lig_mask = np.zeros(n, bool)
    lig_mask[n_pocket:] = True
    return {
        "amino_acid": list(pocket_seq + "A" * peptide_length),
        "angle_features": angles,
        "ligand_mask": lig_mask,
        "pocket_mask": ~lig_mask,
        "already_extended": True,
        "synthetic_ligand": True,
        "structure_ids": {"pdb_id": "request", "ligand_chain": "A"},
    }


class DesignEngine:
    """Loads both checkpoints once and serves batched design requests."""

    def __init__(self, cfg, structure_model, structure_params,
                 structure_diffusion, sequence_model, sequence_params,
                 sequence_d3pm, *, batch_size: int = 64,
                 sampler: str = "ddim", ddim_steps: int = 25,
                 ddim_eta: float = 1.0, step: int = 1,
                 seq_skip_steps: int | None = None, diverse: bool = True,
                 guidance_scale: float = 1.0,
                 seq_guidance_scale: float = 1.0,
                 enable_cfg: bool = False,
                 ligand_buckets: Sequence[int] | None = None,
                 receptor_buckets: Sequence[int] | None = None,
                 batch_buckets: Sequence[int] | None = None, mesh=None):
        from e3diff_tpu.sampling.sequence import make_sequence_sampler
        from e3diff_tpu.sampling.structure import make_structure_sampler

        self.cfg = cfg
        self.batch_size = batch_size
        # multi-bucket ligand padding: each request routes to the
        # smallest compiled bucket that fits its peptide, so short
        # peptides keep the 4x-fewer-decoder-tokens fast path while long
        # ones still fit (a single-bucket engine must reject them). One
        # jitted program per (bucket, stage) — compiled at warmup.
        default_bucket = cfg.ligand_max_len or cfg.max_seq_len
        buckets = sorted(set(int(b) for b in (ligand_buckets or
                                              [default_bucket])))
        for b in buckets:
            if not 1 <= b <= cfg.max_seq_len:
                raise ValueError(
                    f"ligand bucket {b} outside [1, max_seq_len="
                    f"{cfg.max_seq_len}]")
        self.ligand_buckets = buckets
        # receptor-length buckets mirror the ligand ones (the reference's
        # own 64/128 max_len rule, structure_model/train_model.py:17,21):
        # requests route to the smallest compiled receptor shape that
        # fits their extended pocket, so short pockets skip the full
        # max_seq_len attention cost
        rbuckets = sorted(set(int(b) for b in (receptor_buckets or
                                               [cfg.max_seq_len])))
        for b in rbuckets:
            if not 1 <= b <= cfg.max_seq_len:
                raise ValueError(
                    f"receptor bucket {b} outside [1, max_seq_len="
                    f"{cfg.max_seq_len}]")
        self.receptor_buckets = rbuckets
        # batch-size buckets: a partial batch pads only to the smallest
        # compiled batch shape that fits it, so a lone request pays a
        # B=8-sized device run instead of the full B=64 one (the jitted
        # samplers compile per shape; warmup pre-pays every bucket).
        # The largest bucket is always batch_size (the chunking limit).
        bbuckets = sorted(set(int(b) for b in (batch_buckets or [])) |
                          {batch_size})
        for b in bbuckets:
            if not 1 <= b <= batch_size:
                raise ValueError(
                    f"batch bucket {b} outside [1, batch_size="
                    f"{batch_size}]")
        self.batch_buckets = bbuckets
        self.structure_model = structure_model
        self.structure_params = structure_params
        self.sequence_model = sequence_model
        self.sequence_params = sequence_params
        self.structure_diffusion = structure_diffusion
        self.sequence_d3pm = sequence_d3pm
        # multi-chip serving: replicate/tp-shard the params over the mesh
        # and dp-shard each request batch — the sampler jits run sharded
        # unchanged (parity pinned in tests/test_parallel.py)
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from e3diff_tpu.parallel import batch_sharding, shard_params

            dp = mesh.shape.get("dp", 1)
            for b in self.batch_buckets:
                if b % dp:
                    raise ValueError(
                        f"batch bucket {b} must be divisible by the "
                        f"mesh's dp extent {dp} (fixed serving shapes)")
            self.structure_params = shard_params(structure_params, mesh)
            self.sequence_params = shard_params(sequence_params, mesh)
            self._batch_sharding = batch_sharding(mesh)
        # classifier-free guidance: an engine is CFG-capable per sampler
        # when its default scale != 1 OR enable_cfg forces the guided
        # program at default w=1. Guided programs take the scale as a
        # traced (B,) vector, so every request in a micro-batch rides its
        # OWN w through one compiled program (no per-scale recompiles);
        # the cost is the guided 2B forward even for w=1 requests.
        self.guidance_scale = float(guidance_scale)
        self.seq_guidance_scale = float(seq_guidance_scale)
        self._struct_guided = enable_cfg or self.guidance_scale != 1.0
        self._seq_guided = enable_cfg or self.seq_guidance_scale != 1.0
        self._struct_run = make_structure_sampler(
            structure_model, structure_diffusion, step=step,
            return_trajectory=False, sampler=sampler,
            ddim_steps=ddim_steps, ddim_eta=ddim_eta,
            guidance_scale=guidance_scale, guided=self._struct_guided)
        self._seq_run = make_sequence_sampler(
            sequence_model, sequence_d3pm, diverse=diverse,
            n_steps=seq_skip_steps, guidance_scale=seq_guidance_scale,
            guided=self._seq_guided)
        # one chip, two cached jit programs: serialize device use so
        # concurrent front-end threads don't interleave dispatches
        self._device_lock = threading.Lock()
        self._nerf_run = _make_batched_nerf()
        self._warm = False

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoints(cls, structure_ckpt: str, sequence_ckpt: str,
                         **kwargs) -> "DesignEngine":
        """Build an engine from two trained checkpoints, adopting each
        architecture from its config.json sidecar (the same contract the
        sampling CLIs use — utils/presets.py)."""
        import dataclasses as dc

        import jax

        from e3diff_tpu.diffusion.d3pm import D3PMDiffusion
        from e3diff_tpu.ops.transitions import (
            BlosumTransition,
            UniformTransition,
        )
        from e3diff_tpu.utils.builders import (
            build_sequence_model,
            build_structure_diffusion,
            build_structure_model,
        )
        from e3diff_tpu.utils.params_io import (
            load_sequence_params,
            load_structure_params,
        )
        from e3diff_tpu.utils.presets import (
            CKPT_BOUND_FIELDS,
            load_ckpt_config,
            structure_sample_config,
        )

        transition = kwargs.pop("transition", "uniform")
        # parameter storage dtype per model. "bf16_matmul" is
        # sample-identical to f32 for both; FULL "bf16" is quality-safe
        # (and a measured 1.21x) only for the sequence model — so the
        # sequence dtype may be set independently (seq_params_dtype;
        # defaults to params_dtype). BENCHMARKS.md "bf16 parameter
        # storage".
        params_dtype = kwargs.pop("params_dtype", None)
        if params_dtype == "f32":
            params_dtype = None
        # None (absent OR passed as None) falls back to params_dtype —
        # CLIs pass the flag unconditionally, so a dict-default pop
        # would defeat the documented fallback
        seq_params_dtype = kwargs.pop("seq_params_dtype", None)
        if seq_params_dtype is None:
            seq_params_dtype = params_dtype
        if seq_params_dtype == "f32":
            seq_params_dtype = None
        batch_size = kwargs.get("batch_size", 64)

        sside = load_ckpt_config(structure_ckpt) or {}
        qside = load_ckpt_config(sequence_ckpt) or {}
        cfg = structure_sample_config()
        cfg_fields = {f.name for f in dc.fields(cfg)}
        cfg = dc.replace(cfg, **{k: v for k, v in sside.items()
                                 if k in cfg_fields})
        for k in CKPT_BOUND_FIELDS:
            if k in ("timesteps", "num_hidden_layers"):
                continue  # legitimately differ between the two models
            if k in qside and qside[k] != getattr(cfg, k):
                raise ValueError(
                    f"checkpoint configs disagree on {k}: structure="
                    f"{getattr(cfg, k)} vs sequence={qside[k]}")
        qcfg = dc.replace(
            cfg, timesteps=qside.get("timesteps", 50),
            num_hidden_layers=qside.get("num_hidden_layers", 6))

        smodel = build_structure_model(cfg)
        qmodel = build_sequence_model(qcfg)
        sdiff = build_structure_diffusion(cfg)
        trans = (BlosumTransition() if transition == "blosum"
                 else UniformTransition(20))
        d3pm = D3PMDiffusion.create(trans, timesteps=qcfg.timesteps)

        rng = jax.random.PRNGKey(cfg.seed)
        shapes = _batch_shapes(cfg, batch_size)
        sparams = load_structure_params(structure_ckpt, smodel, shapes, rng,
                                        params_dtype=params_dtype)
        qparams = load_sequence_params(sequence_ckpt, qmodel, shapes, rng,
                                       params_dtype=seq_params_dtype)
        return cls(cfg, smodel, sparams, sdiff, qmodel, qparams, d3pm,
                   **kwargs)

    # ------------------------------------------------------------------
    def _pick_bucket(self, record: dict) -> int:
        """Smallest serving ligand bucket that fits the request peptide."""
        n = int(np.asarray(record["ligand_mask"]).sum())
        for b in self.ligand_buckets:
            if n <= b:
                return b
        raise ValueError(
            f"request does not fit the serving shapes: peptide length "
            f"{n} exceeds the largest ligand bucket "
            f"({self.ligand_buckets[-1]} residues)")

    def _pick_receptor_bucket(self, rec_len: int) -> int:
        """Smallest receptor bucket that fits the extended pocket."""
        for b in self.receptor_buckets:
            if rec_len <= b:
                return b
        raise ValueError(
            f"request does not fit the serving shapes: extended pocket "
            f"length {rec_len} exceeds the largest receptor bucket "
            f"({self.receptor_buckets[-1]} residues)")

    def _slot_scale(self, value, default: float, guided: bool,
                    name: str) -> float:
        """Validate a per-request guidance scale against the engine's
        CFG capability (a non-guided engine compiled the plain
        conditional program — silently ignoring an override would lie)."""
        if value is None:
            return default
        w = float(value)
        if not np.isfinite(w):
            raise ValueError(f"{name} must be finite, got {value!r}")
        if not guided and w != default:
            raise ValueError(
                f"{name}={w} needs a CFG-enabled engine: start the "
                f"server with --enable_cfg (or a non-1 default scale) "
                f"and a --cond_dropout-trained checkpoint")
        return w

    def featurize(self, record: dict, *, guidance_scale=None,
                  seq_guidance_scale=None) -> dict:
        """One record -> per-slot feature dict (fixed serving shapes);
        the peptide is padded into the smallest configured ligand bucket
        it fits (slot['_bucket']). Per-request CFG scales override the
        engine defaults when the engine is CFG-enabled."""
        ext = 0 if record.get("already_extended") else self.cfg.pocket_ext
        bucket = self._pick_bucket(record)
        try:
            ds = LigandBindingSiteData(
                [record], None, max_len=self.cfg.max_seq_len,
                pocket_ext=ext, ligand_max_len=bucket)
        except RuntimeError as exc:
            # oversized pocket ("Length exceed") is a REQUEST error, not
            # a server fault — surface it as such (HTTP 400)
            raise ValueError(
                f"request does not fit the serving shapes (receptor "
                f"<= {self.cfg.max_seq_len} residues): {exc}") from exc
        slot = ds[0]
        # receptor bucket routing: padding is a zero tail, so slicing the
        # receptor arrays to the bucket keeps every valid residue
        rbucket = self._pick_receptor_bucket(int(slot["receptor_length"]))
        for k in ("receptor_angles", "receptor_attn_mask", "receptor_seq"):
            slot[k] = slot[k][:rbucket]
        slot["_synthetic_ligand"] = bool(record.get("synthetic_ligand"))
        slot["_bucket"] = bucket
        slot["_rbucket"] = rbucket
        slot["_guidance_scale"] = self._slot_scale(
            guidance_scale, self.guidance_scale, self._struct_guided,
            "guidance_scale")
        slot["_seq_guidance_scale"] = self._slot_scale(
            seq_guidance_scale, self.seq_guidance_scale, self._seq_guided,
            "seq_guidance_scale")
        return slot

    def warmup(self, key=None, shapes=None) -> None:
        """Compile the sampler programs for (ligand, receptor, batch)
        bucket combinations on dummy batches (30-340 s per cold program
        through a tunneled TPU — pay it at startup, not on request #1).

        By default warms EVERY combination — compile cost scales
        multiplicatively with the bucket axes (|rec| x |lig| x |batch|),
        so operators with many buckets can pass ``shapes``, an iterable
        of (receptor_bucket, ligand_bucket, batch_bucket) triples, to
        warm only the combinations real traffic hits; an un-warmed
        combination still works, paying its compile on first request.
        Progress (one line per combination, with wall time) goes to
        stderr so slow startups are attributable."""
        import sys
        import time as _time

        if shapes is None:
            shapes = [(rb, b, bb) for rb in self.receptor_buckets
                      for b in self.ligand_buckets
                      for bb in self.batch_buckets]
        shapes = list(shapes)
        for i, (rb, b, bb) in enumerate(shapes):
            if rb not in self.receptor_buckets or b not in self.ligand_buckets \
                    or bb not in self.batch_buckets:
                raise ValueError(
                    f"warmup shape (rec={rb}, lig={b}, batch={bb}) is not "
                    f"in the configured buckets {self.receptor_buckets} x "
                    f"{self.ligand_buckets} x {self.batch_buckets}")
            t0 = _time.monotonic()
            # a pocket of exactly rb residues routes to bucket rb
            rec = pocket_record("A" * rb, np.zeros((rb, 8), np.float32), b)
            self.design_records([rec] * bb, key=key, return_pdb=False)
            print(f"[warmup {i + 1}/{len(shapes)}] rec={rb} lig={b} "
                  f"batch={bb}: {_time.monotonic() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        self._warm = True

    @property
    def ready(self) -> bool:
        return self._warm

    # ------------------------------------------------------------------
    def design_records(self, records: Sequence[dict], key=None,
                       return_pdb: bool = True) -> list[DesignResult]:
        """Featurize request records and run the full design pipeline."""
        return self.design_slots([self.featurize(r) for r in records],
                                 key=key, return_pdb=return_pdb)

    def design_slots(self, slots: Sequence[dict], key=None,
                     return_pdb=True) -> list[DesignResult]:
        """Run the design pipeline for pre-featurized slots (the HTTP
        layer featurizes in its request threads so one bad request fails
        alone, then batches validated slots here). Slots are packed into
        fixed-shape batches — chunked at batch_size, each chunk padded
        to the smallest configured batch bucket that fits it (dead pad
        slots drop out via the all-zero attention masks). ``return_pdb``
        is a bool or a per-slot sequence of bools (coords are
        reconstructed on device when any slot wants a PDB; text is only
        formatted for the slots that asked). Mixed-bucket slot lists run
        one batched pass per (ligand, receptor) bucket group; result
        order follows the input order."""
        import jax

        if not slots:
            return []
        if isinstance(return_pdb, bool):
            return_pdb = [return_pdb] * len(slots)
        if len(return_pdb) != len(slots):
            raise ValueError("return_pdb length != slots length")
        if key is None:
            key = jax.random.PRNGKey(np.random.SeedSequence().entropy
                                     % (2 ** 32))
        results: list[DesignResult | None] = [None] * len(slots)
        for idxs in self._bucket_groups(slots):
            key, sub_key = jax.random.split(key)
            sub = self._design_bucket([slots[i] for i in idxs],
                                      [return_pdb[i] for i in idxs],
                                      sub_key)
            for i, r in zip(idxs, sub):
                results[i] = r
        return results

    def _pick_batch_bucket(self, n: int) -> int:
        """Smallest compiled batch shape that fits n slots."""
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.batch_buckets[-1]  # unreachable: chunks <= batch_size

    def _scale_kwargs(self, chunk, batch_n: int, guided: bool,
                      slot_key: str, default: float) -> dict:
        """Per-slot guidance scales as a batch-shaped (B,) vector kwarg
        for a guided sampler ({} for plain samplers — their programs take
        no scale). Pad slots get the default (their masks are all-zero)."""
        if not guided:
            return {}
        w = np.full(batch_n, default, np.float32)
        w[:len(chunk)] = [s.get(slot_key, default) for s in chunk]
        return {"scale": w}

    def _bucket_groups(self, slots) -> list[list[int]]:
        """Slot indices grouped by (ligand, receptor) bucket pair,
        ascending (deterministic; each group batches together on its own
        compiled shape)."""
        groups: dict[tuple[int, int], list[int]] = {}
        default = (self.ligand_buckets[-1], self.receptor_buckets[-1])
        for i, s in enumerate(slots):
            key = (int(s.get("_bucket", default[0])),
                   int(s.get("_rbucket", default[1])))
            groups.setdefault(key, []).append(i)
        return [groups[b] for b in sorted(groups)]

    def _design_bucket(self, slots, return_pdb, key) -> list[DesignResult]:
        """The design pipeline for same-bucket slots (one jitted shape)."""
        import jax
        import jax.numpy as jnp

        results: list[DesignResult] = []
        feat_keys = [k for k in slots[0] if not k.startswith("_")]

        for start in range(0, len(slots), self.batch_size):
            chunk = slots[start:start + self.batch_size]
            want_pdb = return_pdb[start:start + self.batch_size]
            n_valid = len(chunk)
            batch = self._stack_slots(chunk, feat_keys)
            bsz = len(batch["ligand_attn_mask"])

            key, k_struct, k_seq = jax.random.split(key, 3)
            jbatch = self._to_device(batch)
            struct_kw = self._scale_kwargs(
                chunk, bsz, self._struct_guided, "_guidance_scale",
                self.guidance_scale)
            seq_kw = self._scale_kwargs(
                chunk, bsz, self._seq_guided, "_seq_guidance_scale",
                self.seq_guidance_scale)
            with self._device_lock:
                angles_final, _ = self._struct_run(
                    self.structure_params, jbatch, k_struct, **struct_kw)
                seq_batch = dict(jbatch)
                seq_batch["ligand_angles"] = angles_final.astype(
                    jbatch["ligand_angles"].dtype)
                logits = self._seq_run(self.sequence_params, seq_batch,
                                       k_seq, **seq_kw)
                coords_b = None
                if any(want_pdb):
                    coords_b = np.asarray(self._nerf_run(
                        angles_final.astype(jnp.float32)))
                angles_np = np.asarray(angles_final, np.float32)
                pred = np.asarray(logits).argmax(-1)

            for i in range(n_valid):
                length = int(batch["ligand_attn_mask"][i].sum())
                ang = angles_np[i, :length]
                seq = "".join(AA_VOCAB[j] for j in pred[i, :length])
                pdb = None
                if want_pdb[i]:
                    coords = coords_b[i, :4 * length]
                    if length and not np.any(np.isnan(coords)):
                        # center over the valid chain (== the trimmed
                        # NERF's center=True; reference NaN guard kept)
                        pdb = backbone_pdb_text(coords - coords.mean(0))
                recovery = None
                if not chunk[i]["_synthetic_ligand"]:
                    true = batch["ligand_seq"][i, :length].argmax(-1)
                    recovery = float(
                        (pred[i, :length] == true).sum() / max(length, 1))
                results.append(DesignResult(sequence=seq, angles=ang,
                                            pdb=pdb,
                                            recovery_rate=recovery))
        return results

    _DEVICE_KEYS = ("ligand_angles", "ligand_attn_mask", "ligand_seq",
                    "receptor_angles", "receptor_attn_mask", "receptor_seq")

    def _to_device(self, batch: dict) -> dict:
        """Select the sampler inputs and place them — dp-sharded over the
        mesh when serving multi-chip, plain device arrays otherwise."""
        import jax
        import jax.numpy as jnp

        sel = {k: v for k, v in batch.items() if k in self._DEVICE_KEYS}
        if self._batch_sharding is not None:
            return {k: jax.device_put(np.asarray(v), self._batch_sharding)
                    for k, v in sel.items()}
        return {k: jnp.asarray(v) for k, v in sel.items()}

    def _stack_slots(self, chunk, feat_keys) -> dict:
        """Stack per-slot features into the smallest compiled batch shape
        that fits (zero-padding the tail; dead slots carry all-zero attn
        masks). With batch_buckets a lone request pays a small device
        run, not the full batch_size one."""
        bucket = self._pick_batch_bucket(len(chunk))
        batch = {}
        for k in feat_keys:
            stacked = np.stack([s[k] for s in chunk])
            if len(chunk) < bucket:
                pad = np.zeros(
                    (bucket - len(chunk),) + stacked.shape[1:],
                    stacked.dtype)
                stacked = np.concatenate([stacked, pad])
            batch[k] = stacked
        return batch

    def inverse_fold_slots(self, slots: Sequence[dict],
                           key=None) -> list[DesignResult]:
        """Inverse folding only: design sequences for the slots' OWN
        ligand backbone angles (the reference's sample_sequence use case,
        sequence_model/sample.py:231-258, as a service). The structure
        sampler is skipped; recovery is reported against the record's
        true sequence unless the ligand is synthetic. Mixed-bucket slot
        lists run one pass per ligand bucket, input order preserved."""
        import jax

        if not slots:
            return []
        if key is None:
            key = jax.random.PRNGKey(np.random.SeedSequence().entropy
                                     % (2 ** 32))
        results: list[DesignResult | None] = [None] * len(slots)
        for idxs in self._bucket_groups(slots):
            key, sub_key = jax.random.split(key)
            sub = self._inverse_fold_bucket([slots[i] for i in idxs],
                                            sub_key)
            for i, r in zip(idxs, sub):
                results[i] = r
        return results

    def _inverse_fold_bucket(self, slots, key) -> list[DesignResult]:
        import jax

        results: list[DesignResult] = []
        feat_keys = [k for k in slots[0] if not k.startswith("_")]
        for start in range(0, len(slots), self.batch_size):
            chunk = slots[start:start + self.batch_size]
            n_valid = len(chunk)
            batch = self._stack_slots(chunk, feat_keys)
            key, k_seq = jax.random.split(key)
            jbatch = self._to_device(batch)
            seq_kw = self._scale_kwargs(
                chunk, len(batch["ligand_attn_mask"]), self._seq_guided,
                "_seq_guidance_scale", self.seq_guidance_scale)
            with self._device_lock:
                logits = self._seq_run(self.sequence_params, jbatch, k_seq,
                                       **seq_kw)
                pred = np.asarray(logits).argmax(-1)
            for i in range(n_valid):
                length = int(batch["ligand_attn_mask"][i].sum())
                seq = "".join(AA_VOCAB[j] for j in pred[i, :length])
                recovery = None
                if not chunk[i]["_synthetic_ligand"]:
                    true = batch["ligand_seq"][i, :length].argmax(-1)
                    recovery = float(
                        (pred[i, :length] == true).sum() / max(length, 1))
                results.append(DesignResult(
                    sequence=seq,
                    angles=np.asarray(
                        batch["ligand_angles"][i, :length], np.float32),
                    pdb=None, recovery_rate=recovery))
        return results

    # convenience used by the HTTP layer -------------------------------
    def design(self, record: dict, n_designs: int = 1, key=None,
               return_pdb: bool = True) -> list[DesignResult]:
        """n_designs independent candidates for one request record (each
        occupies its own batch slot; per-slot noise is independent)."""
        return self.design_records([record] * n_designs, key=key,
                                   return_pdb=return_pdb)


def _batch_shapes(cfg, batch_size: int) -> dict:
    """Zero batch with the serving shapes — enough for eval_shape-based
    checkpoint restore (params_io) without touching any data."""
    lig = cfg.ligand_max_len or cfg.max_seq_len
    rec = cfg.max_seq_len
    return {
        "ligand_angles": np.zeros((batch_size, lig, 8), np.float32),
        "ligand_attn_mask": np.zeros((batch_size, lig), np.float32),
        "ligand_seq": np.zeros((batch_size, lig, 20), np.float32),
        "receptor_angles": np.zeros((batch_size, rec, 8), np.float32),
        "receptor_attn_mask": np.zeros((batch_size, rec), np.float32),
        "receptor_seq": np.zeros((batch_size, rec, 20), np.float32),
    }
