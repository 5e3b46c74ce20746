"""utils/xplane.py: wire-format decode + aggregation, pinned against a
hand-encoded XSpace proto (no tensorflow in this environment — the module
exists precisely because of that)."""

import os
import struct

import numpy as np

from e3diff_tpu.utils.xplane import (
    bucketize,
    device_op_totals,
    parse_message,
    top_ops,
    xspace_planes,
)


# --- tiny protobuf writer (wire format) ---

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _int_field(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v & (1 << 64) - 1)


def _event(meta_id, offset_ps, duration_ps) -> bytes:
    return (_int_field(1, meta_id) + _int_field(2, offset_ps)
            + _int_field(3, duration_ps))


def _event_metadata(mid, name) -> bytes:
    return _int_field(1, mid) + _len_field(2, name.encode())


def _map_entry(key, value_bytes) -> bytes:
    return _int_field(1, key) + _len_field(2, value_bytes)


def build_xspace(plane_name, ops, async_ops=()):
    """ops: list of (name, [durations_ps]); async_ops land on the
    "Async XLA Ops" line that exclusive-time totals must skip."""
    meta = b""
    lines_events = b""
    mid = 0
    for mid, (name, durs) in enumerate(ops, start=1):
        meta += _len_field(4, _map_entry(mid, _event_metadata(mid, name)))
        for k, d in enumerate(durs):
            lines_events += _len_field(4, _event(mid, 1000 * k, d))
    line = _int_field(1, 7) + _len_field(2, b"XLA Ops") + lines_events
    plane = (_int_field(1, 1) + _len_field(2, plane_name.encode())
             + _len_field(3, line))
    if async_ops:
        async_events = b""
        for j, (name, durs) in enumerate(async_ops, start=mid + 1):
            meta += _len_field(4, _map_entry(j, _event_metadata(j, name)))
            for k, d in enumerate(durs):
                async_events += _len_field(4, _event(j, 1000 * k, d))
        aline = (_int_field(1, 8) + _len_field(2, b"Async XLA Ops")
                 + async_events)
        plane += _len_field(3, aline)
    plane += meta
    return _len_field(1, plane)


def test_parse_roundtrip(tmp_path):
    ops = [
        ("fusion.1", [500_000, 500_000]),       # elementwise fusion
        ("dot.7", [2_000_000]),                 # matmul
        ("reduce.3", [300_000]),                # reduce
        ("reshape.9", [100_000, 100_000, 100_000]),
        ("exotic-op.2", [50_000]),              # lands in 'other'
    ]
    space = build_xspace("/device:TPU:0", ops)
    # a host plane that must be EXCLUDED by the device pattern
    space += build_xspace("/host:CPU", [("python", [9_999_999])])

    run = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(run)
    path = str(run / "host.xplane.pb")
    with open(path, "wb") as f:
        f.write(space)

    planes = xspace_planes(path)
    assert [p["name"] for p in planes] == ["/device:TPU:0", "/host:CPU"]
    assert planes[0]["lines"][0]["name"] == "XLA Ops"
    assert len(planes[0]["lines"][0]["events"]) == 8

    totals = device_op_totals(str(tmp_path))
    assert (totals["dot.7"]["ps"], totals["dot.7"]["count"]) == (2_000_000, 1)
    assert (totals["fusion.1"]["ps"],
            totals["fusion.1"]["count"]) == (1_000_000, 2)
    assert "python" not in totals  # host plane filtered out

    buckets = bucketize(totals, steps=1)
    np.testing.assert_allclose(buckets["matmul"], 2e6 / 1e9)
    np.testing.assert_allclose(buckets["elementwise_fusion"], 1e6 / 1e9)
    np.testing.assert_allclose(buckets["reshape_copy"], 3e5 / 1e9)
    np.testing.assert_allclose(buckets["other"], 5e4 / 1e9)

    top = top_ops(totals, n=2)
    assert top[0][0] == "dot.7" and top[1][0] == "fusion.1"
    # achieved GFLOP/s is a rate: it must NOT change with the steps
    # divisor (a past bug divided only the flops numerator by steps,
    # understating every op's rate by exactly `steps`)
    top5 = top_ops(totals, n=2, steps=5)
    assert top5[0][4] == top[0][4] and top5[1][4] == top[1][4]
    np.testing.assert_allclose(top5[0][2], top[0][2] / 5)  # ms/step scales


def test_async_line_excluded_from_exclusive_totals(tmp_path):
    """Async XLA Ops spans overlap compute — they must not inflate
    device_op_totals, but async_copy_totals must see them."""
    from e3diff_tpu.utils.xplane import async_copy_totals

    space = build_xspace(
        "/device:TPU:0", [("dot.1", [1_000_000])],
        async_ops=[("copy.5", [40_000_000, 40_000_000])])
    run = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(run)
    with open(run / "h.xplane.pb", "wb") as f:
        f.write(space)

    totals = device_op_totals(str(tmp_path))
    assert set(totals) == {"dot.1"}
    assert totals["dot.1"]["ps"] == 1_000_000
    spans = async_copy_totals(str(tmp_path))
    assert sum(v["ps"] for v in spans.values()) == 80_000_000
    assert sum(v["count"] for v in spans.values()) == 2


def test_latest_run_only(tmp_path):
    """Two trace runs under one logdir: totals must come from the newest
    run directory only (mixing runs double-counts)."""
    for run_name, dur in [("run_a_old", 7_000_000), ("run_b_new", 1_000_000)]:
        run = tmp_path / "plugins" / "profile" / run_name
        os.makedirs(run)
        with open(run / "h.xplane.pb", "wb") as f:
            f.write(build_xspace("/device:TPU:0", [("dot.1", [dur])]))

    totals = device_op_totals(str(tmp_path))
    assert totals["dot.1"]["ps"] == 1_000_000  # newest run only


def _stat_str(mid, s) -> bytes:
    return _int_field(1, mid) + _len_field(5, s.encode())


def _stat_uint(mid, v) -> bytes:
    return _int_field(1, mid) + _int_field(3, v)


def test_event_metadata_stats_decode(tmp_path):
    """hlo_category / flops / bytes_accessed stats (the TPU profiler's
    per-op annotations) are decoded and drive bucketize + roofline."""
    from e3diff_tpu.utils.xplane import roofline

    # stat_metadata table: 24=hlo_category, 28=flops, 33=bytes_accessed
    stat_meta = b"".join(
        _len_field(5, _map_entry(k, _int_field(1, k)
                                 + _len_field(2, n.encode())))
        for k, n in [(24, "hlo_category"), (28, "flops"),
                     (33, "bytes_accessed")])
    em = (_int_field(1, 1) + _len_field(2, b"1")
          + _len_field(4, b"fusion.42")          # display_name
          + _len_field(5, _stat_str(24, "convolution fusion"))
          + _len_field(5, _stat_uint(28, 2_000_000))
          + _len_field(5, _stat_uint(33, 4096)))
    line = (_int_field(1, 7) + _len_field(2, b"XLA Ops")
            + _len_field(4, _event(1, 0, 1_000_000)))   # 1 us
    mods = (_int_field(1, 8) + _len_field(2, b"XLA Modules")
            + _len_field(4, _event(1, 0, 999_000_000)))  # must be ignored
    plane = (_int_field(1, 1) + _len_field(2, b"/device:TPU:0")
             + _len_field(3, line) + _len_field(3, mods)
             + _len_field(4, _map_entry(1, em)) + stat_meta)
    run = tmp_path / "plugins" / "profile" / "r"
    os.makedirs(run)
    with open(run / "h.xplane.pb", "wb") as f:
        f.write(_len_field(1, plane))

    totals = device_op_totals(str(tmp_path))
    info = totals["fusion.42"]
    assert info["category"] == "convolution fusion"
    assert info["flops"] == 2_000_000
    assert info["bytes"] == 4096
    assert info["ps"] == 1_000_000  # XLA Modules line NOT double-counted

    assert bucketize(totals) == {"convolution fusion": 1e6 / 1e9}
    r = roofline(totals, steps=1)
    assert r["gflops_per_step"] == 2e6 / 1e9 * 1  # 0.002 GFLOP
    # 2 MFLOP in 1 us = 2 TFLOP/s
    np.testing.assert_allclose(r["achieved_tflops_per_s"], 2.0)


def test_control_flow_spans_excluded(tmp_path):
    """A 'while' (lax.scan) op's span covers its body, whose inner ops
    are also on the op line — the parent span must not double-count."""
    stat_meta = _len_field(5, _map_entry(
        24, _int_field(1, 24) + _len_field(2, b"hlo_category")))
    ems = b""
    for mid, (name, cat) in [(1, (b"while.1", "while")),
                             (2, (b"fusion.9", "loop fusion"))]:
        em = (_int_field(1, mid) + _len_field(2, str(mid).encode())
              + _len_field(4, name)
              + _len_field(5, _stat_str(24, cat)))
        ems += _len_field(4, _map_entry(mid, em))
    line = (_int_field(1, 7) + _len_field(2, b"XLA Ops")
            + _len_field(4, _event(1, 0, 5_000_000))    # while span
            + _len_field(4, _event(2, 100, 4_000_000)))  # inner op
    plane = (_int_field(1, 1) + _len_field(2, b"/device:TPU:0")
             + _len_field(3, line) + ems + stat_meta)
    run = tmp_path / "plugins" / "profile" / "r"
    os.makedirs(run)
    with open(run / "h.xplane.pb", "wb") as f:
        f.write(_len_field(1, plane))

    totals = device_op_totals(str(tmp_path))
    assert set(totals) == {"fusion.9"}
    assert totals["fusion.9"]["ps"] == 4_000_000


def test_varint_multibyte():
    payload = _int_field(3, 300) + _int_field(3, 2 ** 40)
    m = parse_message(payload)
    assert m[3] == [300, 2 ** 40]


def test_real_trace_smoke(tmp_path):
    """An actual jax.profiler trace on CPU parses and aggregates (plane
    naming differs across backends — just require non-empty planes)."""
    import jax
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((128, 128))
    float(f(x))  # compile outside the trace
    jax.profiler.start_trace(logdir)
    float(f(x))
    jax.profiler.stop_trace()

    from e3diff_tpu.utils.xplane import find_xplane_files

    files = find_xplane_files(logdir)
    assert files, "no xplane files written"
    planes = xspace_planes(files[0])
    assert planes
    totals = device_op_totals(logdir, plane_pattern=r"")
    assert totals  # something executed somewhere
