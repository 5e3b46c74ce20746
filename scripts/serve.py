"""Serve peptide design over HTTP from two trained checkpoints.

Production path the reference lacks (its inference surface is offline
scripts only): loads the structure + sequence checkpoints (architectures
from their config.json sidecars), compiles both samplers at startup, and
serves micro-batched design requests on fixed TPU shapes.

Example:
    python scripts/serve.py --structure_ckpt runs/structure/final \
        --sequence_ckpt runs/sequence/final --port 8000

    curl -s localhost:8000/design -d '{"pocket": {"sequence": "ACDEF",
        "angles": [[0,0,0,0,2,2,2,2], ...], "peptide_length": 8},
        "n_designs": 4}'
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--structure_ckpt", required=True)
    parser.add_argument("--sequence_ckpt", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--serve_batch_size", type=int, default=64,
                        help="TPU batch slots per device run (B=64 is the "
                             "measured throughput sweet spot)")
    parser.add_argument("--sampler", choices=["ddpm", "ddim"],
                        default="ddim",
                        help="ddim (default) is the production fast path: "
                             "measured quality parity with the faithful "
                             "1000-step loop at 20-40x fewer forwards")
    parser.add_argument("--ddim_steps", type=int, default=25)
    parser.add_argument("--ddim_eta", type=float, default=1.0)
    parser.add_argument("--seq_skip_steps", type=int, default=25,
                        help="D3PM skip-step ladder for inverse folding "
                             "(default 25: recovery parity with the full "
                             "loop at half the forwards, quality pinned "
                             "by tests/test_sampler_quality.py; 0 = full "
                             "T-step loop)")
    parser.add_argument("--transition", choices=["uniform", "blosum"],
                        default="uniform",
                        help="the reference's end-to-end pipeline pairs "
                             "generated angles with the uniform transition")
    parser.add_argument("--ligand_buckets", default=None,
                        help="comma-separated ligand padding buckets "
                             "(e.g. '16,64'): each request routes to the "
                             "smallest compiled bucket that fits its "
                             "peptide. Default: the checkpoint's single "
                             "ligand_max_len/max_seq_len bucket")
    parser.add_argument("--guidance_scale", type=float, default=1.0,
                        help="classifier-free guidance scale for the "
                             "structure sampler (1 = off; needs a "
                             "--cond_dropout-trained checkpoint)")
    parser.add_argument("--seq_guidance_scale", type=float, default=1.0,
                        help="CFG scale for the inverse-folding sampler")
    parser.add_argument("--enable_cfg", action="store_true",
                        help="compile the guided samplers even at "
                             "default scale 1 so requests may send "
                             "per-request guidance_scale/"
                             "seq_guidance_scale (the scale is a traced "
                             "(B,) vector: mixed scales batch together "
                             "with no recompiles; costs the 2B guided "
                             "forward even for w=1 requests)")
    parser.add_argument("--params_dtype", choices=["f32", "bf16", "bf16_matmul", "int8_matmul"],
                        default="f32",
                        help="load-time parameter storage dtype for both "
                             "models. bf16_matmul (kernels only) is "
                             "sample-identical to f32; FULL bf16 "
                             "degrades STRUCTURE quality (BENCHMARKS.md)")
    parser.add_argument("--seq_params_dtype",
                        choices=["f32", "bf16", "bf16_matmul", "int8_matmul"],
                        default=None,
                        help="override for the sequence model only "
                             "(default: follow --params_dtype). Full "
                             "bf16 is quality-neutral AND 1.21x for the "
                             "inverse-folding sampler")
    parser.add_argument("--max_wait_ms", type=float, default=25.0,
                        help="micro-batching window cap after the first "
                             "request of a batch")
    parser.add_argument("--linger_ms", type=float, default=2.0,
                        help="per-slot arrival gap that keeps a batch "
                             "collecting (bursts coalesce; a lone "
                             "request dispatches after one linger "
                             "instead of the whole window)")
    parser.add_argument("--batch_buckets", default=None,
                        help="comma-separated batch-size buckets (e.g. "
                             "'8,64'): a partial micro-batch pads only "
                             "to the smallest compiled batch shape that "
                             "fits it, so a lone request pays a small "
                             "device run (unloaded latency) while full "
                             "batches keep peak throughput. Default: "
                             "one shape at serve_batch_size")
    parser.add_argument("--receptor_buckets", default=None,
                        help="comma-separated receptor padding buckets "
                             "(e.g. '64,128'): each request routes to "
                             "the smallest compiled receptor shape that "
                             "fits its extended pocket, so short pockets "
                             "skip the full max_seq_len cost. Default: "
                             "one bucket at the checkpoint's max_seq_len")
    parser.add_argument("--max_queue", type=int, default=None,
                        help="bound on pending request slots per queue "
                             "(default 4 x serve_batch_size); overload "
                             "beyond it gets an immediate 429 + "
                             "Retry-After instead of queueing toward a "
                             "timeout. 0 = unbounded (pre-r5 behavior)")
    parser.add_argument("--warmup_shapes", default=None,
                        help="comma-separated rec:lig:batch triples "
                             "(e.g. '64:16:8,64:16:64') to warm only "
                             "those bucket combinations at startup "
                             "instead of the full cartesian product "
                             "(compile cost scales as |rec| x |lig| x "
                             "|batch|); un-warmed combinations compile "
                             "on first request")
    parser.add_argument("--dp", type=int, default=None,
                        help="serve over a device mesh: data-parallel "
                             "extent (default: all devices when >1 are "
                             "visible; batches dp-shard, params replicate; "
                             "--dp 1 --tp 1 forces single-device)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel extent of the serving mesh")
    args = parser.parse_args()

    from e3diff_tpu.serving import DesignEngine, DesignServer
    from e3diff_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import jax

    mesh = None
    devices = jax.devices()
    if args.dp is not None or args.tp > 1:
        # explicit extents: mesh over the first dp*tp devices (dp
        # defaults to the remaining extent); dp=1 tp=1 = single-device
        dp = args.dp if args.dp is not None else len(devices) // args.tp
        n = dp * args.tp
        if n > len(devices):
            parser.error(f"--dp {dp} x --tp {args.tp} needs {n} devices, "
                         f"only {len(devices)} visible")
        if n > 1:
            from e3diff_tpu.parallel import make_mesh

            mesh = make_mesh(dp=dp, tp=args.tp, devices=devices[:n])
    elif len(devices) > 1:
        from e3diff_tpu.parallel import make_mesh

        mesh = make_mesh()   # all devices, dp-only
    if mesh is not None:
        print(f"serving mesh: {dict(mesh.shape)}")
    print("loading checkpoints ...")
    engine = DesignEngine.from_checkpoints(
        args.structure_ckpt, args.sequence_ckpt,
        batch_size=args.serve_batch_size, sampler=args.sampler,
        ddim_steps=args.ddim_steps, ddim_eta=args.ddim_eta,
        seq_skip_steps=args.seq_skip_steps or None,
        transition=args.transition,
        guidance_scale=args.guidance_scale,
        seq_guidance_scale=args.seq_guidance_scale,
        enable_cfg=args.enable_cfg,
        params_dtype=args.params_dtype,
        seq_params_dtype=args.seq_params_dtype,
        ligand_buckets=([int(b) for b in args.ligand_buckets.split(",")]
                        if args.ligand_buckets else None),
        receptor_buckets=([int(b) for b in
                           args.receptor_buckets.split(",")]
                          if args.receptor_buckets else None),
        batch_buckets=([int(b) for b in args.batch_buckets.split(",")]
                       if args.batch_buckets else None),
        mesh=mesh)
    print("compiling samplers (warmup) ...")
    shapes = None
    if args.warmup_shapes:
        shapes = [tuple(int(x) for x in t.split(":"))
                  for t in args.warmup_shapes.split(",")]
    engine.warmup(shapes=shapes)
    server = DesignServer(engine, host=args.host, port=args.port,
                          max_wait_ms=args.max_wait_ms,
                          linger_ms=args.linger_ms,
                          max_queue=args.max_queue)
    print(f"serving on http://{args.host}:{server.port}  "
          f"(POST /design, GET /healthz, GET /stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
