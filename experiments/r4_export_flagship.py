"""Export the trained flagship 146M checkpoint to a reference-layout
torch state_dict and load it into the ACTUAL reference module strict=True.

The export direction is fixture-tested at tiny sizes
(tests/test_torch_export.py); this runs the real artifact through the
same path: orbax flagship checkpoint -> export_structure_state_dict ->
torch.save -> reference ConditionalBertForDiffusionBase (imported
read-only from /root/reference) .load_state_dict(strict=True) -> one
B=1 forward compared against our flax forward on the same inputs.

CPU-only (torch has no TPU here); JAX is forced onto CPU so the two
forwards share a platform. Appends one JSON line to r4_results.jsonl.

Usage: python experiments/r4_export_flagship.py \
    --ckpt /tmp/r4_runs/structure/final --out /tmp/r4_flagship_export.pt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUTFILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r4_results.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/r4_runs/structure/final")
    ap.add_argument("--out", default="/tmp/r4_flagship_export.pt")
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp
    import torch

    from e3diff_tpu.utils.builders import build_structure_model
    from e3diff_tpu.utils.params_io import load_structure_params
    from e3diff_tpu.utils.presets import (
        load_ckpt_config,
        structure_sample_config,
    )
    from e3diff_tpu.utils.torch_port import export_structure_state_dict

    side = load_ckpt_config(args.ckpt)
    base = structure_sample_config()
    known = {f.name for f in dataclasses.fields(base)}
    cfg = dataclasses.replace(
        base, **{k: v for k, v in (side or {}).items() if k in known})
    model = build_structure_model(cfg)

    b, lig, rec = 1, cfg.ligand_max_len or cfg.max_seq_len, cfg.max_seq_len
    shapes = {
        "ligand_angles": np.zeros((b, lig, 8), np.float32),
        "ligand_attn_mask": np.ones((b, lig), np.float32),
        "receptor_seq": np.zeros((b, rec, 20), np.float32),
        "receptor_angles": np.zeros((b, rec, 8), np.float32),
        "receptor_attn_mask": np.ones((b, rec), np.float32),
    }
    t0 = time.time()
    params = load_structure_params(args.ckpt, model, shapes,
                                   jax.random.PRNGKey(0))
    sd = export_structure_state_dict(params)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               args.out)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"exported {len(sd)} tensors, {size_mb:.0f} MB -> {args.out}")

    # load into the real reference module, strict=True
    from tests.reference_compat import load_reference_module
    from transformers import BertConfig

    ref_model_mod = load_reference_module("structure_model", "model")

    def bert_config(cross):
        c = BertConfig(
            max_position_embeddings=cfg.max_seq_len,
            num_attention_heads=cfg.num_heads,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            position_embedding_type=cfg.position_embedding_type,
            hidden_dropout_prob=cfg.dropout_p,
            attention_probs_dropout_prob=cfg.dropout_p,
            use_cache=False, is_decoder=cross, add_cross_attention=cross)
        c._attn_implementation = "eager"
        return c

    tmodel = ref_model_mod.ConditionalBertForDiffusion(
        bert_config(False), bert_config(True),
        feature_names=["phi", "psi", "omega", "dihedral_o",
                       "tau", "CA:C:1N", "1C:N:CA", "CA:C:O"],
        loss_func=[]).eval()
    tmodel.load_state_dict(torch.load(args.out), strict=True)
    print("reference load_state_dict strict=True: ok")

    # one B=1 forward, both frameworks, same inputs
    rng = np.random.default_rng(0)
    lig_ang = rng.uniform(-np.pi, np.pi, (b, lig, 8)).astype(np.float32)
    rec_ang = rng.uniform(-np.pi, np.pi, (b, rec, 8)).astype(np.float32)
    rec_seq = np.eye(20, dtype=np.float32)[rng.integers(0, 20, (b, rec))]
    t_step = np.full((b,), 500, np.int64)

    ours = model.apply(
        {"params": params}, jnp.asarray(t_step, jnp.int32),
        jnp.asarray(lig_ang), jnp.ones((b, lig)), jnp.asarray(rec_seq),
        jnp.asarray(rec_ang), jnp.ones((b, rec)), deterministic=True)
    ours = np.asarray(ours, np.float32)

    with torch.no_grad():
        theirs = tmodel(
            torch.from_numpy(t_step), torch.from_numpy(lig_ang),
            torch.ones(b, lig), torch.from_numpy(rec_seq),
            torch.from_numpy(rec_ang), torch.ones(b, rec)).numpy()

    diff = np.abs(ours - theirs)
    rel = diff.mean() / (np.abs(theirs).mean() + 1e-9)
    rec_line = {"exp": "r4_export_flagship", "ckpt": args.ckpt,
                "tensors": len(sd), "size_mb": round(size_mb, 1),
                "max_abs_diff": round(float(diff.max()), 6),
                "rel_err": round(float(rel), 6),
                "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(rec_line))
    assert rel < 5e-2, rel  # bf16-trained weights, f32 compare
    with open(OUTFILE, "a") as f:
        f.write(json.dumps(rec_line) + "\n")


if __name__ == "__main__":
    main()
