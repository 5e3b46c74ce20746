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


def _parse_event_metadata(buf: bytes) -> dict:
    m = parse_message(buf)
    return {
        "id": m.get(1, [0])[0],
        "name": m.get(2, [b""])[0].decode("utf-8", "replace"),
        "display_name": m.get(4, [b""])[0].decode("utf-8", "replace"),
    }


def _parse_map_entry(buf: bytes, value_parser) -> tuple[int, dict]:
    m = parse_message(buf)
    key = m.get(1, [0])[0]
    val = value_parser(m.get(2, [b""])[0])
    return key, val


def _parse_plane(buf: bytes) -> dict:
    m = parse_message(buf)
    event_meta = dict(_parse_map_entry(e, _parse_event_metadata)
                      for e in m.get(4, []))
    return {
        "id": m.get(1, [0])[0],
        "name": m.get(2, [b""])[0].decode("utf-8", "replace"),
        "lines": [_parse_line(ln) for ln in m.get(3, [])],
        "event_metadata": event_meta,
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

def device_op_totals(logdir_or_file: str,
                     plane_pattern: str = r"TPU|/device:") -> dict:
    """Aggregate device-plane op time: {event name: [total_ps, count]}.

    Uses the XLA-op lines of every plane whose name matches
    `plane_pattern` (TPU device planes; pass r'' for all). Events on a
    device plane are HLO op executions; the same op name accumulates
    across lines/steps."""
    files = ([logdir_or_file] if logdir_or_file.endswith((".pb", ".pb.gz"))
             else find_xplane_files(logdir_or_file))
    totals: dict = {}
    for path in files:
        for plane in xspace_planes(path):
            if not re.search(plane_pattern, plane["name"]):
                continue
            meta = plane["event_metadata"]
            for line in plane["lines"]:
                for ev in line["events"]:
                    name = meta.get(ev["metadata_id"], {}).get("name", "?")
                    slot = totals.setdefault(name, [0, 0])
                    slot[0] += ev["duration_ps"]
                    slot[1] += 1
    return totals


_BUCKET_RULES = [
    ("matmul", r"^(fusion\.)?(dot|convolution)|^%?dot"),
    ("reduce_fusion", r"^(loop_)?(reduce|convert)[-_.]|reduce_fusion"),
    ("reshape_copy", r"^(reshape|copy|transpose|bitcast)"),
    ("elementwise_fusion", r"^(loop_)?fusion"),
    ("dynamic_slice", r"dynamic[-_]?(update[-_]?)?slice"),
    ("rng", r"rng|random"),
    ("infeed_outfeed", r"infeed|outfeed|copy[-_]?(start|done)"),
]


def bucketize(totals: dict, steps: int = 1) -> dict:
    """Collapse per-op totals into coarse buckets (ms per step).

    TPU HLO names are stable enough for regex bucketing: 'fusion.N' with
    a dot root shows up as 'fusion.N' only, so when available prefer the
    category embedded in names like 'fusion.3' + display names. Ops that
    match no rule land in 'other'."""
    out: dict = {}
    for name, (ps, _cnt) in totals.items():
        bucket = "other"
        for b, pat in _BUCKET_RULES:
            if re.search(pat, name):
                bucket = b
                break
        out[bucket] = out.get(bucket, 0.0) + ps
    return {k: round(v / 1e9 / max(steps, 1), 6)
            for k, v in sorted(out.items(), key=lambda kv: -kv[1])}


def top_ops(totals: dict, n: int = 20, steps: int = 1) -> list[tuple]:
    """The n most expensive ops: (name, ms_per_step, count_per_step)."""
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])[:n]
    return [(name, round(ps / 1e9 / max(steps, 1), 4),
             round(cnt / max(steps, 1), 1)) for name, (ps, cnt) in rows]
