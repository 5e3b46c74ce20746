"""Measure the reference implementation's CPU training/sampling throughput.

BASELINE.md's target is >=10x the reference-code-on-CPU training
throughput; this script produces that denominator by running the actual
reference model (loaded read-only from /root/reference, lightning stubbed)
under torch CPU with the canonical config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    import numpy as np
    import torch

    from reference_compat import load_reference_module

    torch.set_num_threads(os.cpu_count() or 1)
    torch.set_float32_matmul_precision("medium")

    ref = load_reference_module("structure_model", "model")
    from transformers import BertConfig

    b, l = 64, 64

    def cfg(cross):
        c = BertConfig(
            max_position_embeddings=l, num_attention_heads=12,
            hidden_size=768, intermediate_size=1024, num_hidden_layers=12,
            position_embedding_type="relative_key",
            hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
            use_cache=False, is_decoder=cross, add_cross_attention=cross)
        c._attn_implementation = "eager"
        return c

    model = ref.ConditionalBertForDiffusionBase(cfg(False), cfg(True), 8)
    opt = torch.optim.AdamW(model.parameters(), lr=5e-5, weight_decay=0.1)

    rng = np.random.default_rng(0)
    t = torch.zeros((b, 1), dtype=torch.long)
    lig = torch.tensor(rng.uniform(-3, 3, (b, l, 8)).astype(np.float32))
    ligm = torch.ones(b, l)
    rseq = torch.tensor(np.eye(20, dtype=np.float32)[
        rng.integers(0, 20, (b, l))])
    rang = torch.tensor(rng.uniform(-3, 3, (b, l, 8)).astype(np.float32))
    rm = torch.ones(b, l)

    def train_step():
        opt.zero_grad()
        pred = model(t, lig, ligm, rseq, rang, rm)
        loss = torch.nn.functional.smooth_l1_loss(pred, lig)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    train_step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        train_step()
    train_dt = (time.perf_counter() - t0) / n

    model.eval()
    with torch.no_grad():
        model(t, lig, ligm, rseq, rang, rm)
        t0 = time.perf_counter()
        for _ in range(n):
            model(t, lig, ligm, rseq, rang, rm)
        fwd_dt = (time.perf_counter() - t0) / n

    print(json.dumps({
        "torch_cpu_train_steps_per_sec_b64_len64": round(1.0 / train_dt, 4),
        "torch_cpu_forward_per_sec_b64_len64": round(1.0 / fwd_dt, 4),
        "torch_cpu_train_step_seconds": round(train_dt, 3),
        "torch_cpu_forward_seconds": round(fwd_dt, 3),
        "threads": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
