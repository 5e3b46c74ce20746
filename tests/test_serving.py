"""Serving subsystem: engine featurization/design, micro-batcher, HTTP
server round-trip, and checkpoint-based construction."""

import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e3diff_tpu.data import LigandBindingSiteData, synthetic_complexes
from e3diff_tpu.data.dataset import AA_VOCAB
from e3diff_tpu.diffusion import D3PMDiffusion, GaussianAngleDiffusion
from e3diff_tpu.models import (
    SequenceDenoiser,
    StructureDenoiser,
    TransformerConfig,
)
from e3diff_tpu.ops import UniformTransition
from e3diff_tpu.serving import DesignEngine, DesignServer, MicroBatcher
from e3diff_tpu.serving.engine import pocket_record
from e3diff_tpu.utils.presets import ExperimentConfig

MAXLEN = 32


def _tiny_cfg(cross, init_style="torch_default"):
    return TransformerConfig(
        hidden_size=32, num_heads=4, num_layers=2, intermediate_size=64,
        max_position_embeddings=MAXLEN, dropout=0.0, attention_dropout=0.0,
        add_cross_attention=cross, init_style=init_style)


def _tiny_engine(batch_size=4, **kwargs):
    cfg = ExperimentConfig(pocket_ext=1, max_seq_len=MAXLEN,
                           ligand_max_len=16, timesteps=8, bf16=False)
    ds = LigandBindingSiteData(
        synthetic_complexes(n=4, seed=3, receptor_len_range=(8, 14),
                            ligand_len_range=(5, 8)),
        None, max_len=MAXLEN, pocket_ext=1, ligand_max_len=16)
    batch = next(ds.batches(2))

    smodel = StructureDenoiser(_tiny_cfg(False), _tiny_cfg(True))
    sparams = smodel.init(
        jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32),
        jnp.asarray(batch["ligand_angles"]),
        jnp.asarray(batch["ligand_attn_mask"]),
        jnp.asarray(batch["receptor_seq"]),
        jnp.asarray(batch["receptor_angles"]),
        jnp.asarray(batch["receptor_attn_mask"]))["params"]

    qmodel = SequenceDenoiser(_tiny_cfg(False, "xavier_all"),
                              _tiny_cfg(True, "xavier_all"))
    qparams = qmodel.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 1)),
        jnp.asarray(batch["ligand_seq"]),
        jnp.asarray(batch["ligand_angles"]),
        jnp.asarray(batch["ligand_attn_mask"]),
        jnp.asarray(batch["receptor_seq"]),
        jnp.asarray(batch["receptor_angles"]),
        jnp.asarray(batch["receptor_attn_mask"]))["params"]

    diffusion = GaussianAngleDiffusion.cosine(8)
    d3pm = D3PMDiffusion.create(UniformTransition(20), timesteps=6)
    return DesignEngine(cfg, smodel, sparams, diffusion, qmodel, qparams,
                        d3pm, batch_size=batch_size, sampler="ddim",
                        ddim_steps=3, **kwargs)


def _pocket(n_pocket=6, peptide_length=7, seed=0):
    rng = np.random.default_rng(seed)
    seq = "".join(AA_VOCAB[i] for i in rng.integers(0, 20, n_pocket))
    angles = rng.uniform(-np.pi, np.pi, (n_pocket, 8)).astype(np.float32)
    return pocket_record(seq, angles, peptide_length)


# ---------------------------------------------------------------- records

def test_pocket_record_validation():
    with pytest.raises(ValueError, match="unknown residues"):
        pocket_record("AXZ", np.zeros((3, 8), np.float32), 5)
    with pytest.raises(ValueError, match="shape"):
        pocket_record("ACD", np.zeros((2, 8), np.float32), 5)
    with pytest.raises(ValueError, match="peptide_length"):
        pocket_record("ACD", np.zeros((3, 8), np.float32), 0)


def test_pocket_record_featurization_is_verbatim():
    eng = _tiny_engine()
    rec = _pocket(n_pocket=6, peptide_length=7)
    slot = eng.featurize(rec)
    # already_extended: the pocket residues pass through exactly, no Q2
    # extension bleeding the dummy ligand into the receptor features
    assert slot["receptor_attn_mask"].sum() == 6
    assert slot["ligand_attn_mask"].sum() == 7
    np.testing.assert_allclose(
        slot["receptor_angles"][:6],
        np.asarray(rec["angle_features"][:6]), rtol=1e-6)


# ----------------------------------------------------------------- engine

def test_engine_design_mixed_requests():
    eng = _tiny_engine(batch_size=4)
    real = synthetic_complexes(n=1, seed=9, receptor_len_range=(8, 12),
                               ligand_len_range=(5, 8))[0]
    records = [_pocket(6, 7, seed=0), _pocket(5, 5, seed=1), real]
    results = eng.design_records(records, key=jax.random.PRNGKey(42))
    assert len(results) == 3
    for res, rec in zip(results, records):
        want_len = int(np.asarray(rec["ligand_mask"]).sum())
        assert len(res.sequence) == want_len
        assert set(res.sequence) <= set(AA_VOCAB)
        assert res.angles.shape == (want_len, 8)
        assert np.all(np.abs(res.angles) <= np.pi + 1e-5)
        assert res.pdb is not None and res.pdb.startswith("ATOM")
        # 4 atoms per residue in the reconstructed backbone
        assert res.pdb.count("\nATOM") + 1 == 4 * want_len
    assert results[0].recovery_rate is None      # synthetic ligand
    assert results[1].recovery_rate is None
    assert 0.0 <= results[2].recovery_rate <= 1.0


def test_engine_chunks_past_batch_size():
    eng = _tiny_engine(batch_size=2)
    records = [_pocket(5, 6, seed=s) for s in range(5)]
    results = eng.design_records(records, key=jax.random.PRNGKey(0),
                                 return_pdb=False)
    assert len(results) == 5
    assert all(r.pdb is None for r in results)
    # independent slots: designs differ across requests
    assert len({r.sequence for r in results}) > 1


def test_engine_n_designs_are_independent():
    eng = _tiny_engine(batch_size=4)
    results = eng.design(_pocket(6, 8), n_designs=4,
                         key=jax.random.PRNGKey(7), return_pdb=False)
    assert len(results) == 4
    angles = np.stack([r.angles for r in results])
    assert np.std(angles, axis=0).max() > 1e-3   # not identical noise


# ---------------------------------------------------------------- batcher

def test_microbatcher_coalesces_and_orders():
    calls = []

    def run(items):
        calls.append(len(items))
        time.sleep(0.01)
        return [x * 10 for x in items]

    b = MicroBatcher(run, max_batch=8, max_wait_ms=30.0)
    futs = [b.submit(i) for i in range(20)]
    assert [f.result(timeout=5) for f in futs] == [i * 10 for i in range(20)]
    stats = b.stats()
    assert stats["requests"] == 20
    assert stats["batches"] == len(calls) < 20   # actually batched
    assert max(calls) <= 8
    assert stats["mean_batch_occupancy"] > 1.0
    assert stats["latency_ms_p50"] > 0
    b.shutdown()


def test_microbatcher_propagates_errors_and_recovers():
    def run(items):
        if any(x < 0 for x in items):
            raise RuntimeError("boom")
        return items

    b = MicroBatcher(run, max_batch=4, max_wait_ms=5.0)
    bad = b.submit(-1)
    with pytest.raises(RuntimeError, match="boom"):
        bad.result(timeout=5)
    good = b.submit(3)
    assert good.result(timeout=5) == 3           # worker thread survived
    assert b.stats()["errors"] == 1
    b.shutdown()
    with pytest.raises(RuntimeError):
        b.submit(1)


def test_microbatcher_concurrent_submitters():
    b = MicroBatcher(lambda xs: [x + 1 for x in xs], max_batch=16,
                     max_wait_ms=10.0)
    out = {}

    def client(i):
        out[i] = b.submit(i).result(timeout=5)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert out == {i: i + 1 for i in range(32)}
    b.shutdown()


# ----------------------------------------------------------------- server

def _http(method, url, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_end_to_end():
    eng = _tiny_engine(batch_size=4)
    server = DesignServer(eng, port=0, max_wait_ms=5.0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        code, body = _http("GET", f"{base}/healthz")
        assert code == 503 and body["ok"] is False   # not warmed up yet
        eng.warmup(key=jax.random.PRNGKey(0))
        code, body = _http("GET", f"{base}/healthz")
        assert code == 200 and body["ok"] is True

        pocket = _pocket(6, 7)
        payload = {
            "pocket": {"sequence": "".join(pocket["amino_acid"][:6]),
                       "angles": np.asarray(
                           pocket["angle_features"][:6]).tolist(),
                       "peptide_length": 7},
            "n_designs": 2, "return_angles": True,
        }
        code, body = _http("POST", f"{base}/design", payload)
        assert code == 200, body
        assert len(body["designs"]) == 2
        for d in body["designs"]:
            assert len(d["sequence"]) == 7
            assert set(d["sequence"]) <= set(AA_VOCAB)
            assert d["pdb"].startswith("ATOM")
            assert np.asarray(d["angles"]).shape == (7, 8)
            assert "recovery_rate" not in d      # synthetic ligand
        assert body["latency_ms"] > 0

        code, body = _http("POST", f"{base}/design", {"n_designs": 1})
        assert code == 400 and "error" in body
        code, body = _http("GET", f"{base}/nope")
        assert code == 404
        code, body = _http("GET", f"{base}/stats")
        assert code == 200 and body["batches"] >= 1
    finally:
        server.shutdown()


# ------------------------------------------------------- from_checkpoints

def test_engine_from_checkpoints(tmp_path):
    import dataclasses

    from e3diff_tpu.training.checkpoint import CheckpointManager
    from e3diff_tpu.utils.builders import (
        build_sequence_model,
        build_structure_model,
    )
    from e3diff_tpu.utils.presets import save_config

    cfg = ExperimentConfig(pocket_ext=1, max_seq_len=MAXLEN,
                           ligand_max_len=16, timesteps=8,
                           num_heads=4, hidden_size=32,
                           num_hidden_layers=2, intermediate_size=64,
                           bf16=False)
    qcfg = dataclasses.replace(cfg, timesteps=6, num_hidden_layers=1)

    smodel = build_structure_model(cfg)
    qmodel = build_sequence_model(qcfg)
    b, lig, rec = 2, 16, MAXLEN
    sparams = smodel.init(
        jax.random.PRNGKey(0), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, lig, 8)), jnp.ones((b, lig)),
        jnp.zeros((b, rec, 20)), jnp.zeros((b, rec, 8)),
        jnp.ones((b, rec)))["params"]
    qparams = qmodel.init(
        jax.random.PRNGKey(1), jnp.zeros((b, 1)),
        jnp.zeros((b, lig, 20)), jnp.zeros((b, lig, 8)),
        jnp.ones((b, lig)), jnp.zeros((b, rec, 20)),
        jnp.zeros((b, rec, 8)), jnp.ones((b, rec)))["params"]

    sdir, qdir = str(tmp_path / "structure"), str(tmp_path / "sequence")
    for d, p, c in ((sdir, sparams, cfg), (qdir, qparams, qcfg)):
        mgr = CheckpointManager(d)
        mgr.save_final(p)
        mgr.close()
        save_config(c, d)

    eng = DesignEngine.from_checkpoints(
        f"{sdir}/final", f"{qdir}/final", batch_size=2, sampler="ddim",
        ddim_steps=3)
    assert eng.cfg.max_seq_len == MAXLEN
    assert eng.cfg.ligand_max_len == 16
    assert eng.sequence_d3pm.timesteps == 6
    results = eng.design(_pocket(6, 7), n_designs=2,
                         key=jax.random.PRNGKey(5))
    assert len(results) == 2 and all(len(r.sequence) == 7 for r in results)

    # params_dtype="bf16": load-time cast applies to both models and the
    # engine still designs end-to-end
    eng16 = DesignEngine.from_checkpoints(
        f"{sdir}/final", f"{qdir}/final", batch_size=2, sampler="ddim",
        ddim_steps=3, params_dtype="bf16")
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(eng16.structure_params))
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(eng16.sequence_params))
    r16 = eng16.design(_pocket(6, 7), n_designs=1,
                       key=jax.random.PRNGKey(6), return_pdb=False)
    assert len(r16) == 1 and len(r16[0].sequence) == 7

    # independent sequence dtype: structure stays f32, sequence bf16
    # (the measured quality-safe + 1.21x serving combination)
    eng_mix = DesignEngine.from_checkpoints(
        f"{sdir}/final", f"{qdir}/final", batch_size=2, sampler="ddim",
        ddim_steps=3, params_dtype="f32", seq_params_dtype="bf16")
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(eng_mix.structure_params))
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(eng_mix.sequence_params))

    # disagreeing shared fields must be rejected
    save_config(dataclasses.replace(qcfg, max_seq_len=64), qdir)
    with pytest.raises(ValueError, match="disagree on max_seq_len"):
        DesignEngine.from_checkpoints(f"{sdir}/final", f"{qdir}/final",
                                      batch_size=2)


def test_engine_empty_and_oversized_requests():
    eng = _tiny_engine(batch_size=2)
    assert eng.design_records([]) == []
    with pytest.raises(ValueError, match="serving shapes"):
        eng.featurize(_pocket(6, 40))      # peptide > ligand bucket (16)
    with pytest.raises(ValueError, match="serving shapes"):
        eng.featurize(_pocket(MAXLEN + 8, 5))   # pocket > receptor bucket


def test_engine_device_nerf_matches_host_path(tmp_path):
    """The engine's batched on-device NERF (padded length, trimmed +
    centered on host) must reproduce the host chain.py reconstruction."""
    from e3diff_tpu.geometry.chain import backbone_coords_from_angles

    eng = _tiny_engine(batch_size=2)
    results = eng.design_records([_pocket(6, 9), _pocket(5, 12, seed=4)],
                                 key=jax.random.PRNGKey(3))
    for res in results:
        host = backbone_coords_from_angles(res.angles)   # float64 oracle
        got = np.array([[float(l[30:38]), float(l[38:46]), float(l[46:54])]
                        for l in res.pdb.splitlines()
                        if l.startswith("ATOM")])
        assert got.shape == host.shape
        np.testing.assert_allclose(got, host, atol=2e-3)  # PDB has 3 dp


def test_design_slots_per_slot_pdb_choice():
    eng = _tiny_engine(batch_size=4)
    slots = [eng.featurize(_pocket(5, 6, seed=s)) for s in range(3)]
    res = eng.design_slots(slots, key=jax.random.PRNGKey(0),
                           return_pdb=[True, False, True])
    assert res[0].pdb is not None and res[2].pdb is not None
    assert res[1].pdb is None


def test_server_invalid_request_is_a_400_not_a_batch_poison():
    eng = _tiny_engine(batch_size=4)
    eng.warmup(key=jax.random.PRNGKey(0))
    server = DesignServer(eng, port=0, max_wait_ms=5.0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        bad = _pocket(6, 40)   # peptide > ligand bucket
        payload = {"pocket": {
            "sequence": "".join(bad["amino_acid"][:6]),
            "angles": np.asarray(bad["angle_features"][:6]).tolist(),
            "peptide_length": 40}}
        code, body = _http("POST", f"{base}/design", payload)
        assert code == 400 and "serving shapes" in body["error"]
        # the engine still serves valid requests afterwards
        good = _pocket(6, 7)
        code, body = _http("POST", f"{base}/design", {"pocket": {
            "sequence": "".join(good["amino_acid"][:6]),
            "angles": np.asarray(good["angle_features"][:6]).tolist(),
            "peptide_length": 7}})
        assert code == 200 and len(body["designs"][0]["sequence"]) == 7
        # invalid requests never became batches
        assert server.batcher.stats()["errors"] == 0
    finally:
        server.shutdown()


def test_engine_inverse_fold_real_records():
    eng = _tiny_engine(batch_size=2)
    records = synthetic_complexes(n=3, seed=6, receptor_len_range=(8, 12),
                                  ligand_len_range=(5, 8))
    slots = [eng.featurize(r) for r in records]
    results = eng.inverse_fold_slots(slots, key=jax.random.PRNGKey(1))
    assert len(results) == 3
    for res, rec in zip(results, records):
        want_len = int(np.asarray(rec["ligand_mask"]).sum())
        assert len(res.sequence) == want_len
        assert set(res.sequence) <= set(AA_VOCAB)
        assert 0.0 <= res.recovery_rate <= 1.0
        # the angles echoed back are the record's own ligand angles
        true_angles = np.asarray(rec["angle_features"])[
            np.asarray(rec["ligand_mask"], bool)]
        np.testing.assert_allclose(res.angles, true_angles, rtol=1e-6)
    assert eng.inverse_fold_slots([]) == []


def test_server_inverse_fold_endpoint():
    eng = _tiny_engine(batch_size=4)
    eng.warmup(key=jax.random.PRNGKey(0))
    server = DesignServer(eng, port=0, max_wait_ms=5.0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        rec = synthetic_complexes(n=1, seed=8, receptor_len_range=(8, 12),
                                  ligand_len_range=(5, 8))[0]
        payload = {"record": {
            "amino_acid": list(rec["amino_acid"]),
            "angle_features": np.asarray(rec["angle_features"]).tolist(),
            "ligand_mask": np.asarray(rec["ligand_mask"]).astype(int).tolist(),
            "pocket_mask": np.asarray(rec["pocket_mask"]).astype(int).tolist(),
        }, "n_samples": 3}
        code, body = _http("POST", f"{base}/inverse_fold", payload)
        assert code == 200, body
        want_len = int(np.asarray(rec["ligand_mask"]).sum())
        assert len(body["sequences"]) == 3
        for d in body["sequences"]:
            assert len(d["sequence"]) == want_len
            assert 0.0 <= d["recovery_rate"] <= 1.0
        code, body = _http("GET", f"{base}/stats")
        assert body["inverse_fold"]["batches"] >= 1
    finally:
        server.shutdown()


def test_server_config_endpoint():
    eng = _tiny_engine(batch_size=4)
    server = DesignServer(eng, port=0)
    server.start()
    try:
        code, body = _http("GET",
                           f"http://127.0.0.1:{server.port}/config")
        assert code == 200
        assert body["batch_size"] == 4
        assert body["experiment"]["ligand_max_len"] == 16
        assert body["structure_timesteps"] == 8
        assert body["sequence_timesteps"] == 6
    finally:
        server.shutdown()


def test_engine_serves_from_device_mesh():
    """mesh= serves the same design pipeline sharded over dp x tp: params
    carry mesh shardings, request batches dp-shard, results are valid,
    and the inverse-fold logits match the single-device engine bit-for-
    bit (same programs, sharded — tests/test_parallel.py pins sampler
    parity; here we pin the engine wiring)."""
    from e3diff_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    e1 = _tiny_engine(batch_size=4)
    e2 = _tiny_engine(batch_size=4, mesh=mesh)

    # params actually sharded over the mesh
    leaf = jax.tree.leaves(e2.structure_params)[0]
    assert set(leaf.sharding.mesh.shape) == {"dp", "tp"}

    records = [_pocket(6, 7, seed=0), _pocket(5, 5, seed=1)]
    r1 = e1.design_records(records, key=jax.random.PRNGKey(3))
    r2 = e2.design_records(records, key=jax.random.PRNGKey(3))
    assert len(r2) == 2
    for a, b in zip(r1, r2):
        assert len(b.sequence) == len(a.sequence)
        assert set(b.sequence) <= set(AA_VOCAB)
        assert b.pdb is not None and b.pdb.startswith("ATOM")
        np.testing.assert_allclose(np.asarray(b.angles),
                                   np.asarray(a.angles),
                                   atol=1e-4, rtol=1e-3)

    # inverse folding through the mesh too
    real = synthetic_complexes(n=2, seed=11, receptor_len_range=(8, 12),
                               ligand_len_range=(5, 8))
    s1 = e1.inverse_fold_slots([e1.featurize(r) for r in real],
                               key=jax.random.PRNGKey(4))
    s2 = e2.inverse_fold_slots([e2.featurize(r) for r in real],
                               key=jax.random.PRNGKey(4))
    assert [x.sequence for x in s1] == [x.sequence for x in s2]


def test_engine_mesh_batch_size_divisibility():
    from e3diff_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="divisible"):
        _tiny_engine(batch_size=3, mesh=make_mesh(dp=4, tp=2))


# ----------------------------------------------------- multi-bucket routing

def test_multi_bucket_routing_and_order():
    """Requests route to the smallest bucket that fits; mixed-bucket
    batches return results in input order; per-bucket outputs equal a
    single-bucket engine's for the same key discipline."""
    eng = _tiny_engine(batch_size=4, ligand_buckets=[8, 16])
    assert eng.ligand_buckets == [8, 16]

    short = _pocket(6, 5, seed=0)     # fits bucket 8
    long = _pocket(6, 12, seed=1)     # needs bucket 16
    s_short = eng.featurize(short)
    s_long = eng.featurize(long)
    assert s_short["_bucket"] == 8 and s_long["_bucket"] == 16
    assert s_short["ligand_attn_mask"].shape == (8,)
    assert s_long["ligand_attn_mask"].shape == (16,)

    res = eng.design_slots([s_long, s_short, s_long],
                           key=jax.random.PRNGKey(7), return_pdb=False)
    assert [len(r.sequence) for r in res] == [12, 5, 12]
    for r in res:
        assert set(r.sequence) <= set(AA_VOCAB)
        assert np.isfinite(r.angles).all()

    # too long for every bucket -> request error mentioning the shapes
    with pytest.raises(ValueError, match="serving shapes"):
        eng.featurize(_pocket(6, 20, seed=2))
    # bucket outside the model's position table -> constructor error
    with pytest.raises(ValueError, match="outside"):
        _tiny_engine(ligand_buckets=[8, MAXLEN * 2])


def test_multi_bucket_warmup_and_inverse_fold():
    eng = _tiny_engine(batch_size=2, ligand_buckets=[8, 16])
    eng.warmup(key=jax.random.PRNGKey(0))
    assert eng.ready

    real = synthetic_complexes(n=3, seed=13, receptor_len_range=(8, 12),
                               ligand_len_range=(5, 8))
    slots = [eng.featurize(r) for r in real]
    # ligand lengths 5-8 all fit the small bucket
    assert all(s["_bucket"] == 8 for s in slots)
    out = eng.inverse_fold_slots(slots, key=jax.random.PRNGKey(1))
    assert len(out) == 3
    for r, rec in zip(out, real):
        n = int(np.asarray(rec["ligand_mask"]).sum())
        assert len(r.sequence) == n
        assert r.recovery_rate is not None


def test_receptor_bucket_routing():
    """Receptor-length buckets mirror the ligand ones: requests route to
    the smallest compiled receptor shape that fits the extended pocket,
    mixed (lig, rec) groups preserve input order, and oversized pockets
    are request errors."""
    eng = _tiny_engine(batch_size=4, ligand_buckets=[8, 16],
                       receptor_buckets=[8, MAXLEN])
    assert eng.receptor_buckets == [8, MAXLEN]

    small = _pocket(6, 5, seed=0)      # pocket 6 -> rec bucket 8
    big = _pocket(12, 5, seed=1)       # pocket 12 -> rec bucket MAXLEN
    s_small = eng.featurize(small)
    s_big = eng.featurize(big)
    assert s_small["_rbucket"] == 8 and s_big["_rbucket"] == MAXLEN
    assert s_small["receptor_attn_mask"].shape == (8,)
    assert s_big["receptor_attn_mask"].shape == (MAXLEN,)
    assert s_small["receptor_attn_mask"].sum() == 6
    # the slice keeps every valid residue's features
    np.testing.assert_allclose(
        s_small["receptor_angles"][:6],
        np.asarray(small["angle_features"][:6]), rtol=1e-6)

    res = eng.design_slots([s_big, s_small, s_big],
                           key=jax.random.PRNGKey(7), return_pdb=False)
    assert [len(r.sequence) for r in res] == [5, 5, 5]
    for r in res:
        assert set(r.sequence) <= set(AA_VOCAB)
        assert np.isfinite(r.angles).all()
    # inverse folding routes over the same groups
    out = eng.inverse_fold_slots([s_small, s_big],
                                 key=jax.random.PRNGKey(8))
    assert len(out) == 2 and all(len(r.sequence) == 5 for r in out)

    # a pocket larger than every receptor bucket -> request error
    small_only = _tiny_engine(batch_size=2, receptor_buckets=[8])
    with pytest.raises(ValueError, match="receptor bucket|serving shapes"):
        small_only.featurize(_pocket(12, 5, seed=2))
    # bucket beyond max_seq_len -> constructor error
    with pytest.raises(ValueError, match="outside"):
        _tiny_engine(receptor_buckets=[MAXLEN * 2])


def test_receptor_bucket_warmup_compiles_all_pairs():
    eng = _tiny_engine(batch_size=2, ligand_buckets=[8, 16],
                       receptor_buckets=[8, MAXLEN])
    eng.warmup(key=jax.random.PRNGKey(0))
    assert eng.ready
    # post-warmup requests on every shape work
    recs = [_pocket(6, 5, seed=0), _pocket(12, 5, seed=1),
            _pocket(6, 12, seed=2), _pocket(12, 12, seed=3)]
    res = eng.design_records(recs, key=jax.random.PRNGKey(4),
                             return_pdb=False)
    assert [len(r.sequence) for r in res] == [5, 5, 12, 12]


def test_batch_bucket_routing():
    """A partial batch pads to the smallest compiled batch shape, a full
    one to batch_size; results match the single-shape engine's contract
    (order, lengths, finite angles)."""
    eng = _tiny_engine(batch_size=4, batch_buckets=[2, 4])
    assert eng.batch_buckets == [2, 4]
    assert eng._pick_batch_bucket(1) == 2
    assert eng._pick_batch_bucket(2) == 2
    assert eng._pick_batch_bucket(3) == 4

    # lone request -> bucket-2 shape under the hood
    one = eng.design_records([_pocket(6, 5, seed=0)],
                             key=jax.random.PRNGKey(0), return_pdb=False)
    assert len(one) == 1 and len(one[0].sequence) == 5
    # 3 requests -> bucket-4; 5 requests -> chunk of 4 + chunk of 1 (->2)
    five = eng.design_records([_pocket(5, 6, seed=s) for s in range(5)],
                              key=jax.random.PRNGKey(1), return_pdb=False)
    assert [len(r.sequence) for r in five] == [6] * 5
    assert all(np.isfinite(r.angles).all() for r in five)

    with pytest.raises(ValueError, match="batch bucket"):
        _tiny_engine(batch_size=4, batch_buckets=[8])

    # warmup compiles every (lig, rec, batch) combination and requests
    # still work afterwards
    eng.warmup(key=jax.random.PRNGKey(2))
    assert eng.ready


def test_microbatcher_linger_dispatches_lone_request_early():
    """A lone request must not sleep the whole max_wait window: with
    linger_ms << max_wait_ms it dispatches after one linger gap."""
    mb = MicroBatcher(lambda items: list(items), max_batch=8,
                      max_wait_ms=2000.0, linger_ms=5.0)
    try:
        t0 = time.monotonic()
        fut = mb.submit("only")
        assert fut.result(timeout=10.0) == "only"
        elapsed = time.monotonic() - t0
        # would be >= 2 s if the batcher slept the full window
        assert elapsed < 1.0, elapsed
    finally:
        mb.shutdown()

    # a negative linger must clamp to 0, not kill the worker thread
    # (queue.get raises on negative timeouts)
    mb = MicroBatcher(lambda items: list(items), max_batch=8,
                      max_wait_ms=100.0, linger_ms=-3.0)
    try:
        assert mb._linger_s == 0.0
        assert mb.submit("x").result(timeout=10.0) == "x"
    finally:
        mb.shutdown()


def test_microbatcher_linger_still_coalesces_bursts():
    batches = []
    mb = MicroBatcher(lambda items: (batches.append(list(items)),
                                     list(items))[1],
                      max_batch=8, max_wait_ms=2000.0, linger_ms=200.0)
    try:
        futs = [mb.submit(i) for i in range(8)]
        assert [f.result(timeout=10.0) for f in futs] == list(range(8))
        # a back-to-back burst of max_batch coalesces into ONE batch
        assert len(batches) == 1 and len(batches[0]) == 8
    finally:
        mb.shutdown()


def test_guided_engine_runs():
    """A guidance_scale != 1 engine runs the 2B guided samplers
    end-to-end (quality needs a cond_dropout-trained model; here we pin
    wiring: shapes, finiteness, and that w=2 differs from w=1)."""
    eng1 = _tiny_engine(batch_size=2)
    eng2 = _tiny_engine(batch_size=2, guidance_scale=2.0,
                        seq_guidance_scale=2.0)
    # same params for a controlled comparison
    eng2.structure_params = eng1.structure_params
    eng2.sequence_params = eng1.sequence_params
    rec = _pocket(6, 7, seed=5)
    r1 = eng1.design_records([rec], key=jax.random.PRNGKey(2),
                             return_pdb=False)[0]
    r2 = eng2.design_records([rec], key=jax.random.PRNGKey(2),
                             return_pdb=False)[0]
    assert len(r2.sequence) == len(r1.sequence) == 7
    assert np.isfinite(r2.angles).all()
    assert not np.allclose(r1.angles, r2.angles)


def test_per_request_guidance_needs_cfg_engine():
    """A plain engine compiled the conditional program only — it must
    REJECT a per-request scale override (400) rather than silently
    ignore it; the engine-default value passes through."""
    eng = _tiny_engine(batch_size=2)
    rec = _pocket(6, 7)
    with pytest.raises(ValueError, match="CFG-enabled"):
        eng.featurize(rec, guidance_scale=2.0)
    with pytest.raises(ValueError, match="CFG-enabled"):
        eng.featurize(rec, seq_guidance_scale=2.0)
    slot = eng.featurize(rec, guidance_scale=1.0, seq_guidance_scale=1.0)
    assert slot["_guidance_scale"] == 1.0
    with pytest.raises(ValueError, match="finite"):
        _tiny_engine(batch_size=2, enable_cfg=True).featurize(
            rec, guidance_scale=float("nan"))


def test_per_request_guidance_mixed_batch():
    """enable_cfg engine: requests with different w batch together (the
    scale is a per-example vector of ONE compiled program) and each
    request's w is honored — w=1 and w=4 slots differ, equal-w slots at
    the same batch position reproduce."""
    eng = _tiny_engine(batch_size=4, enable_cfg=True)
    assert eng._struct_guided and eng._seq_guided
    rec = _pocket(6, 7, seed=9)
    key = jax.random.PRNGKey(3)
    slots = [eng.featurize(rec, guidance_scale=w, seq_guidance_scale=w)
             for w in (1.0, 4.0, 1.0)]
    out = eng.design_slots(slots, key=key, return_pdb=False)
    # control: the same 3-slot batch with all scales = 1 and the same
    # key shares the batch-wide sampling noise position-for-position, so
    # any per-position difference is the scale's doing
    base = eng.design_slots(
        [eng.featurize(rec, guidance_scale=1.0, seq_guidance_scale=1.0)
         for _ in range(3)], key=key, return_pdb=False)
    np.testing.assert_allclose(out[0].angles, base[0].angles, atol=1e-6)
    np.testing.assert_allclose(out[2].angles, base[2].angles, atol=1e-6)
    assert not np.allclose(out[1].angles, base[1].angles)


def test_server_per_request_guidance_scale():
    eng = _tiny_engine(batch_size=4, enable_cfg=True)
    server = DesignServer(eng, port=0, max_wait_ms=5.0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        eng.warmup(key=jax.random.PRNGKey(0))
        pocket = _pocket(6, 7)
        payload = {
            "pocket": {"sequence": "".join(pocket["amino_acid"][:6]),
                       "angles": np.asarray(
                           pocket["angle_features"][:6]).tolist(),
                       "peptide_length": 7},
            "n_designs": 1, "guidance_scale": 2.5,
            "seq_guidance_scale": 1.5, "return_pdb": False,
        }
        code, body = _http("POST", f"{base}/design", payload)
        assert code == 200, body
        assert len(body["designs"][0]["sequence"]) == 7
        code, body = _http("GET", f"{base}/config")
        assert code == 200
        assert body["cfg_enabled"] == {"structure": True, "sequence": True}
    finally:
        server.shutdown()


def test_server_guidance_scale_rejected_without_cfg():
    eng = _tiny_engine(batch_size=4)
    server = DesignServer(eng, port=0, max_wait_ms=5.0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        pocket = _pocket(6, 7)
        payload = {
            "pocket": {"sequence": "".join(pocket["amino_acid"][:6]),
                       "angles": np.asarray(
                           pocket["angle_features"][:6]).tolist(),
                       "peptide_length": 7},
            "n_designs": 1, "guidance_scale": 2.5,
        }
        code, body = _http("POST", f"{base}/design", payload)
        assert code == 400 and "CFG-enabled" in body["error"]
    finally:
        server.shutdown()


# ----------------------------------------------- overload backpressure (r5)

def test_microbatcher_bounded_queue_rejects_and_recovers():
    """Submits beyond max_queue raise QueueFullError immediately; every
    ACCEPTED request still completes once the worker drains (no stuck
    futures), and the queue depth never exceeds the bound."""
    from e3diff_tpu.serving.batcher import QueueFullError

    gate = threading.Event()

    def run(items):
        gate.wait(timeout=10)
        return list(items)

    mb = MicroBatcher(run, max_batch=2, max_wait_ms=1.0, max_queue=4)
    try:
        first = mb.submit("w")           # occupies the worker at the gate
        time.sleep(0.1)                  # let the worker pick it up
        accepted = [mb.submit(i) for i in range(4)]   # fills the queue
        with pytest.raises(QueueFullError) as exc:
            mb.submit("overflow")
        assert exc.value.retry_after_s > 0
        assert mb.stats()["rejected"] == 1
        assert mb.stats()["queue_depth"] <= 4
        gate.set()                       # drain
        assert first.result(timeout=10) == "w"
        assert [f.result(timeout=10) for f in accepted] == list(range(4))
        # capacity freed: new submits are accepted again
        assert mb.submit("after").result(timeout=10) == "after"
    finally:
        gate.set()
        mb.shutdown()


def test_microbatcher_submit_many_is_atomic():
    """A multi-slot submit either fits entirely or rejects entirely —
    no partial admission."""
    from e3diff_tpu.serving.batcher import QueueFullError

    gate = threading.Event()
    mb = MicroBatcher(lambda items: (gate.wait(10), list(items))[1],
                      max_batch=2, max_wait_ms=1.0, max_queue=4)
    try:
        mb.submit("w")
        time.sleep(0.1)
        mb.submit_many([1, 2])           # 2/4 slots used
        depth_before = mb.stats()["queue_depth"]
        with pytest.raises(QueueFullError):
            mb.submit_many([3, 4, 5])    # 3 more would exceed 4
        assert mb.stats()["queue_depth"] == depth_before   # none enqueued
        assert mb.stats()["rejected"] == 3
        futs = mb.submit_many([6, 7])    # exactly fills — accepted
        gate.set()
        assert [f.result(timeout=10) for f in futs] == [6, 7]
    finally:
        gate.set()
        mb.shutdown()


def test_microbatcher_unbounded_opt_out():
    mb = MicroBatcher(lambda items: list(items), max_batch=2,
                      max_wait_ms=1.0, max_queue=0)
    try:
        futs = [mb.submit(i) for i in range(64)]   # >> any bound
        assert [f.result(timeout=10) for f in futs] == list(range(64))
        assert mb.stats()["rejected"] == 0
        assert mb.stats()["max_queue"] == 0
    finally:
        mb.shutdown()


def test_server_overload_returns_429_with_retry_after():
    """Sustained load beyond queue capacity gets an immediate 429 +
    Retry-After (not a slow timeout), accepted requests all complete,
    and /stats reports the rejection."""
    eng = _tiny_engine(batch_size=2)
    eng.warmup(key=jax.random.PRNGKey(0))

    # gate the device path so the queue can deterministically fill
    gate = threading.Event()
    real = eng.design_slots

    def gated(slots, **kw):
        gate.wait(timeout=30)
        return real(slots, **kw)

    eng.design_slots = gated
    server = DesignServer(eng, port=0, max_wait_ms=1.0, max_queue=2)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    pocket = _pocket(6, 7)
    payload = {
        "pocket": {"sequence": "".join(pocket["amino_acid"][:6]),
                   "angles": np.asarray(
                       pocket["angle_features"][:6]).tolist(),
                   "peptide_length": 7},
        "n_designs": 1, "return_pdb": False,
    }
    results = []

    def client():
        results.append(_http("POST", f"{base}/design", payload))

    try:
        # first request occupies the worker at the gate; two more fill
        # the bounded queue
        threads = [threading.Thread(target=client) for _ in range(3)]
        for t in threads:
            t.start()
            time.sleep(0.2)   # let each land (worker holds the first)

        # queue is now full: a synchronous request must 429 fast
        req = urllib.request.Request(
            f"{base}/design", data=json.dumps(payload).encode(),
            method="POST")
        t0 = time.monotonic()
        try:
            with urllib.request.urlopen(req, timeout=30):
                raise AssertionError("expected HTTP 429")
        except urllib.error.HTTPError as e:
            assert e.code == 429
            assert int(e.headers["Retry-After"]) >= 1
            body = json.loads(e.read())
            assert "queue full" in body["error"]
            assert body["retry_after_s"] > 0
        assert time.monotonic() - t0 < 5.0   # fast rejection, no timeout

        code, stats = _http("GET", f"{base}/stats")
        assert stats["rejected"] >= 1
        assert stats["queue_depth"] <= stats["max_queue"] == 2

        gate.set()
        for t in threads:
            t.join(timeout=30)
        assert [c for c, _ in results] == [200, 200, 200]   # no stuck work
    finally:
        gate.set()
        server.shutdown()


def test_server_multi_slot_request_rejects_whole():
    """n_designs > remaining capacity: the whole request 429s; nothing
    is partially admitted."""
    eng = _tiny_engine(batch_size=2)
    eng.warmup(key=jax.random.PRNGKey(0))
    gate = threading.Event()
    real = eng.design_slots
    eng.design_slots = lambda slots, **kw: (gate.wait(30),
                                            real(slots, **kw))[1]
    server = DesignServer(eng, port=0, max_wait_ms=1.0, max_queue=3)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    pocket = _pocket(6, 7)

    def payload(n):
        return {"pocket": {"sequence": "".join(pocket["amino_acid"][:6]),
                           "angles": np.asarray(
                               pocket["angle_features"][:6]).tolist(),
                           "peptide_length": 7},
                "n_designs": n, "return_pdb": False}

    try:
        t = threading.Thread(
            target=lambda: _http("POST", f"{base}/design", payload(1)))
        t.start()
        time.sleep(0.3)                   # worker holds it at the gate
        th2 = threading.Thread(
            target=lambda: _http("POST", f"{base}/design", payload(2)))
        th2.start()
        time.sleep(0.3)                   # 2/3 queue slots used
        code, body = _http("POST", f"{base}/design", payload(2))
        assert code == 429                # 2 more don't fit atomically
        code, stats = _http("GET", f"{base}/stats")
        assert stats["queue_depth"] == 2  # rejected request left no slot
        gate.set()
        t.join(timeout=30)
        th2.join(timeout=30)
    finally:
        gate.set()
        server.shutdown()


def test_engine_runs_with_int8_params():
    """The full design pipeline (structure DDIM + NERF + inverse fold)
    runs on int8_matmul-packed params for BOTH models — the serving-side
    wiring of the scan-body dequantization (utils/quant.py)."""
    from e3diff_tpu.utils.quant import is_quantized, quantize_params_int8

    eng = _tiny_engine(batch_size=2)
    eng.structure_params = quantize_params_int8(eng.structure_params)
    eng.sequence_params = quantize_params_int8(eng.sequence_params)
    assert is_quantized(eng.structure_params)
    results = eng.design_records([_pocket(6, 7), _pocket(5, 6, seed=1)],
                                 key=jax.random.PRNGKey(0))
    assert len(results) == 2
    for r in results:
        assert len(r.sequence) > 0
        assert r.pdb and "ATOM" in r.pdb
