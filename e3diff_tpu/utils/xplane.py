"""Dependency-free XPlane (jax.profiler) trace analysis.

``jax.profiler.start_trace`` writes TensorBoard XSpace protos
(``plugins/profile/<run>/<host>.xplane.pb``); reading them normally needs
tensorflow + tensorboard_plugin_profile, neither of which exists in this
environment. This module decodes the protobuf wire format directly (the
XSpace schema is small and stable — tensorflow/core/profiler/protobuf/
xplane.proto) and aggregates per-op device time, so the BENCHMARKS.md
"profile bucket" tables (matmuls / reduce fusions / reshapes / ...) are
produced by a reproducible tool instead of by hand.

Typical use (see experiments/r3_seq_perf.py):

    with jax.profiler.trace(logdir):
        run_steps()
    from e3diff_tpu.utils.xplane import device_op_totals, bucketize
    totals = device_op_totals(logdir)      # {op name: (ps, count)}
    print(bucketize(totals, steps=N))      # {category: ms_per_step}

The decoder is generic: `parse_message` returns {field_number: [values]}
trees, `xspace_planes` shapes them into plane/line/event dicts.
"""

from __future__ import annotations

import glob
import gzip
import os
import re
import struct


# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_message(buf: bytes) -> dict:
    """Decode one message into {field_number: [raw values]}: varints as
    ints, length-delimited fields as bytes (caller recurses), 64/32-bit
    fixed as ints."""
    out: dict = {}
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            val = buf[pos:pos + length]
            pos += length
        elif wire == 1:
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wire == 5:
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        out.setdefault(field, []).append(val)
    return out


def _sint(v: int) -> int:
    """Interpret a varint as two's-complement int64 (protobuf int64)."""
    return v - (1 << 64) if v >= 1 << 63 else v


# ---------------------------------------------------------------------------
# XSpace schema (field numbers from xplane.proto)
# ---------------------------------------------------------------------------

def _parse_event(buf: bytes) -> dict:
    m = parse_message(buf)
    return {
        "metadata_id": m.get(1, [0])[0],
        "offset_ps": _sint(m.get(2, [0])[0]),
        "duration_ps": _sint(m.get(3, [0])[0]),
        "num_occurrences": m.get(5, [1])[0],
    }


def _parse_line(buf: bytes) -> dict:
    m = parse_message(buf)
    return {
        "id": m.get(1, [0])[0],
        "name": m.get(2, [b""])[0].decode("utf-8", "replace"),
        "events": [_parse_event(e) for e in m.get(4, [])],
    }


def _parse_stat(buf: bytes, stat_names: dict) -> tuple[str, object]:
    """One XStat -> (stat name, value). Value field is whichever of
    double(2)/uint64(3)/int64(4)/str(5)/bytes(6)/ref(7) is present; a ref
    points back into the plane's stat_metadata table."""
    m = parse_message(buf)
    name = stat_names.get(m.get(1, [0])[0], "?")
    if 5 in m:
        val = m[5][0].decode("utf-8", "replace")
    elif 2 in m:
        val = struct.unpack("<d", m[2][0].to_bytes(8, "little"))[0]
    elif 7 in m:
        val = stat_names.get(m[7][0], m[7][0])
    elif 4 in m:
        val = _sint(m[4][0])
    elif 3 in m:
        val = m[3][0]
    elif 6 in m:
        val = m[6][0]
    else:
        val = None
    return name, val


def _parse_event_metadata(buf: bytes, stat_names: dict) -> dict:
    m = parse_message(buf)
    return {
        "id": m.get(1, [0])[0],
        "name": m.get(2, [b""])[0].decode("utf-8", "replace"),
        "display_name": m.get(4, [b""])[0].decode("utf-8", "replace"),
        "stats": dict(_parse_stat(s, stat_names) for s in m.get(5, [])),
    }


def _parse_map_entry(buf: bytes, value_parser) -> tuple[int, dict]:
    m = parse_message(buf)
    key = m.get(1, [0])[0]
    val = value_parser(m.get(2, [b""])[0])
    return key, val


def _parse_stat_metadata(buf: bytes) -> str:
    return parse_message(buf).get(2, [b"?"])[0].decode("utf-8", "replace")


def _parse_plane(buf: bytes) -> dict:
    m = parse_message(buf)
    stat_names = dict(_parse_map_entry(e, _parse_stat_metadata)
                      for e in m.get(5, []))
    event_meta = dict(
        _parse_map_entry(e, lambda b: _parse_event_metadata(b, stat_names))
        for e in m.get(4, []))
    return {
        "id": m.get(1, [0])[0],
        "name": m.get(2, [b""])[0].decode("utf-8", "replace"),
        "lines": [_parse_line(ln) for ln in m.get(3, [])],
        "event_metadata": event_meta,
        "stat_metadata": stat_names,
    }


def xspace_planes(path: str) -> list[dict]:
    """All XPlanes in one .xplane.pb file."""
    with open(path, "rb") as f:
        buf = f.read()
    if path.endswith(".gz"):
        buf = gzip.decompress(buf)
    return [_parse_plane(p) for p in parse_message(buf).get(1, [])]


def find_xplane_files(logdir: str) -> list[str]:
    return sorted(glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb")))


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

# whole-program / step-marker lines would double-count the op lines, and
# "Async XLA Ops" events span their full in-flight window (overlapping
# compute and each other) — summing them inflates device time ~8x
# (measured: 1322 ms of async-copy spans over a 184 ms exclusive-op
# trace). They are overlap, not exclusive time; see async_copy_totals.
_NON_OP_LINES = {"Steps", "XLA Modules", "TC Overlay", "Framework Ops",
                 "Source code", "Async XLA Ops"}

# control-flow ops appear on the op line with a span covering their whole
# body, whose inner ops are ALSO on the line (measured on a lax.scan
# sampler: 'while' span 2.61 ms/step next to 2.66 ms/step of inner ops —
# a clean 2x double count). Parent spans, not exclusive time.
_CONTROL_FLOW_CATEGORIES = {"while", "conditional", "call", "fusion input"}


def latest_run_files(logdir: str) -> list[str]:
    """xplane files of only the most recent trace run under logdir.

    jax.profiler.trace creates a fresh timestamped run directory per
    trace; aggregating a logdir that was traced twice would silently mix
    runs (measured: a tiny-model smoke merged into a full-size profile)."""
    files = find_xplane_files(logdir)
    if not files:
        return []
    latest = os.path.dirname(sorted(files)[-1])
    return [f for f in files if os.path.dirname(f) == latest]


def device_op_totals(logdir_or_file: str,
                     plane_pattern: str = r"TPU|/device:") -> dict:
    """Aggregate device-plane exclusive op time:
    {op name: {ps, count, category, flops, bytes}}.

    Uses the op lines (Steps/XLA Modules/Async excluded — they re-cover
    or overlap the same time) of every plane matching `plane_pattern`
    (TPU device planes; pass r'' for all), from the LATEST trace run
    only. `category` is the profiler's per-op `hlo_category` stat when
    present ('convolution fusion', 'loop fusion', ...), `flops`/`bytes`
    its static cost stats — enough for per-bucket roofline arithmetic
    without tensorboard.

    CPU fallback: the CPU (host-platform) backend writes no /device:
    plane at all — HLO op events land on the '/host:CPU' plane's
    'tf_XLAPjRtCpuClient/<tid>' thread lines (no category/flops stats,
    but real op names + durations). When the device scan comes up empty,
    aggregate those instead so --profile_dir digests work in CPU tests
    too."""
    files = ([logdir_or_file] if logdir_or_file.endswith((".pb", ".pb.gz"))
             else latest_run_files(logdir_or_file))
    planes = [p for path in files for p in xspace_planes(path)]
    totals = _op_totals_from(
        [p for p in planes if re.search(plane_pattern, p["name"])],
        lambda line: line["name"] not in _NON_OP_LINES)
    if not totals and plane_pattern == r"TPU|/device:":
        totals = _op_totals_from(
            [p for p in planes if p["name"] == "/host:CPU"],
            lambda line: line["name"].startswith("tf_XLAPjRtCpuClient"))
    return totals


def _op_totals_from(planes: list[dict], line_filter) -> dict:
    totals: dict = {}
    for plane in planes:
        meta = plane["event_metadata"]
        for line in plane["lines"]:
            if not line_filter(line):
                continue
            for ev in line["events"]:
                m = meta.get(ev["metadata_id"], {})
                # TPU device planes often carry a numeric `name` with
                # the real HLO op text in `display_name` — prefer it
                name = m.get("display_name") or m.get("name", "?")
                stats = m.get("stats", {})
                if stats.get("hlo_category") in _CONTROL_FLOW_CATEGORIES:
                    continue
                # CPU-plane bookkeeping events, not op time
                if name.startswith(("ThreadpoolListener::", "end: ")):
                    continue
                fl = float(stats.get("flops", 0) or 0)
                by = float(stats.get("bytes_accessed", 0) or 0)
                # same op NAME from different XLA modules/planes can carry
                # different per-execution flops/bytes — merging them under
                # one slot would pair one module's flops with both
                # modules' time (skewing every derived rate); split such
                # collisions into name#2, name#3, ...
                key, suffix = name, 2
                slot = totals.get(key)
                while slot is not None and (slot["flops"],
                                            slot["bytes"]) != (fl, by):
                    key = f"{name}#{suffix}"
                    slot = totals.get(key)
                    suffix += 1
                if slot is None:
                    slot = totals[key] = {
                        "ps": 0, "count": 0,
                        "category": stats.get("hlo_category", ""),
                        "flops": fl, "bytes": by,
                    }
                slot["ps"] += ev["duration_ps"]
                slot["count"] += 1
    return totals


_BUCKET_RULES = [
    ("matmul", r"^%?(fusion\.)?(dot|convolution)"),
    ("reduce_fusion", r"^%?(loop_|bitcast_)*(reduce|convert)[-_.]"
                      r"|reduce_fusion"),
    ("reshape_copy", r"^%?(reshape|copy|transpose|bitcast)"),
    ("elementwise_fusion", r"^%?(loop_)?fusion"),
    ("dynamic_slice", r"dynamic[-_]?(update[-_]?)?slice"),
    ("rng", r"rng|random"),
    ("infeed_outfeed", r"infeed|outfeed"),
]


def bucketize(totals: dict, steps: int = 1) -> dict:
    """Collapse per-op totals into coarse buckets (ms per step), keyed by
    the profiler's own hlo_category when present ('convolution fusion' =
    MXU matmul/conv work, 'loop fusion' = elementwise, ...), else by op
    name regex. Ops matching nothing land in 'other'."""
    out: dict = {}
    for name, info in totals.items():
        bucket = info["category"] or "other"
        if bucket == "other":
            for b, pat in _BUCKET_RULES:
                if re.search(pat, name):
                    bucket = b
                    break
        out[bucket] = out.get(bucket, 0.0) + info["ps"]
    return {k: round(v / 1e9 / max(steps, 1), 6)
            for k, v in sorted(out.items(), key=lambda kv: -kv[1])}


def top_ops(totals: dict, n: int = 20, steps: int = 1) -> list[tuple]:
    """The n most expensive ops:
    (name, category, ms_per_step, count_per_step, GFLOP/s achieved)."""
    rows = sorted(totals.items(), key=lambda kv: -kv[1]["ps"])[:n]
    # achieved rate = TOTAL flops / TOTAL time — steps cancels out of the
    # ratio (dividing only the numerator by steps understated the rate by
    # exactly `steps`, making hot ops look slower than the aggregate)
    return [(name, info["category"],
             round(info["ps"] / 1e9 / max(steps, 1), 4),
             round(info["count"] / max(steps, 1), 1),
             round(info["flops"] * info["count"]
                   / (info["ps"] / 1e12) / 1e9, 1) if info["ps"] else 0.0)
            for name, info in rows]


def async_copy_totals(logdir_or_file: str,
                      plane_pattern: str = r"TPU|/device:") -> dict:
    """Span-time of the "Async XLA Ops" line (latest run), per category:
    {category: {ps, count}}. These are in-flight windows of async copies
    (HBM prefetches etc.) that OVERLAP compute — report them next to, not
    inside, exclusive device time."""
    files = ([logdir_or_file] if logdir_or_file.endswith((".pb", ".pb.gz"))
             else latest_run_files(logdir_or_file))
    out: dict = {}
    for path in files:
        for plane in xspace_planes(path):
            if not re.search(plane_pattern, plane["name"]):
                continue
            meta = plane["event_metadata"]
            for line in plane["lines"]:
                if line["name"] != "Async XLA Ops":
                    continue
                for ev in line["events"]:
                    m = meta.get(ev["metadata_id"], {})
                    cat = (m.get("stats", {}).get("hlo_category", "")
                           or "async")
                    slot = out.setdefault(cat, {"ps": 0, "count": 0})
                    slot["ps"] += ev["duration_ps"]
                    slot["count"] += 1
    return out


def roofline(totals: dict, steps: int = 1) -> dict:
    """Aggregate achieved FLOP/s and bytes/s over the op lines — the
    numerator for an MFU estimate that excludes host gaps."""
    ps = sum(i["ps"] for i in totals.values())
    flops = sum(i["flops"] * i["count"] for i in totals.values())
    byts = sum(i["bytes"] * i["count"] for i in totals.values())
    sec = ps / 1e12
    return {
        "device_ms_per_step": round(ps / 1e9 / max(steps, 1), 3),
        "gflops_per_step": round(flops / 1e9 / max(steps, 1), 4),
        "achieved_tflops_per_s": round(flops / sec / 1e12, 3) if sec else 0,
        "achieved_gbytes_per_s": round(byts / sec / 1e9, 1) if sec else 0,
    }
