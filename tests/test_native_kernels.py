"""C++ kernel (e3diff_tpu/native) vs pure-numpy engine parity.

The C++ library accelerates the two hot loops of the DSSP feature
extraction (Kabsch-Sander H-bond scan, Shrake-Rupley ASA). These tests
pin that both code paths produce the same bonds in the same order (so
the downstream best-two selection and secondary-structure assignment are
engine-independent) and per-residue ASA within fp tolerance. Skipped
when no C++ toolchain is available (the numpy fallback is then the only
path, covered by test_native_dssp.py).
"""

import numpy as np
import pytest

from e3diff_tpu.data import dssp as D
from e3diff_tpu.data.native_structure import parse_pdb_chains
from e3diff_tpu.native import load_native_lib
from test_native_dssp import build_chain, write_chains_pdb

pytestmark = pytest.mark.skipif(
    load_native_lib() is None, reason="C++ kernel unavailable")


@pytest.fixture(scope="module")
def mixed_structure(tmp_path_factory):
    """Helix + strand pair + short ligand: exercises H/E/turn bonds and
    inter-chain ASA burial."""
    folder = tmp_path_factory.mktemp("native_kernels")
    chains = {
        "A": build_chain(-57, -47, n=40, chain_id="A"),
        "B": build_chain(-139, 135, n=12, chain_id="B",
                         offset=(12.0, 2.0, 0.0)),
        "C": build_chain(-70, -40, n=8, chain_id="C",
                         offset=(-12.0, -3.0, 1.0)),
    }
    path = write_chains_pdb(chains, str(folder / "mixed.pdb"))
    return parse_pdb_chains(path)


def _numpy_only(monkeypatch):
    import e3diff_tpu.native as N
    monkeypatch.setattr(N, "_LIB", None)
    monkeypatch.setattr(N, "_TRIED", True)


def test_hbond_scan_matches_numpy(mixed_structure, monkeypatch):
    entries = D._flatten(mixed_structure)
    D._mark_connectivity(entries)
    native = D._hbond_scan_native(entries)
    assert native is not None and len(native) > 50

    acc_c, don_c = D.compute_hbonds(entries)
    _numpy_only(monkeypatch)
    assert D._hbond_scan_native(entries) is None
    acc_np, don_np = D.compute_hbonds(entries)

    # identical partner selection, energies within BLAS-rounding noise
    for a, b in [(acc_c, acc_np), (don_c, don_np)]:
        assert [[p[0] for p in row] for row in a] == \
               [[p[0] for p in row] for row in b]
        ea = np.array([[p[1] for p in row] for row in a])
        eb = np.array([[p[1] for p in row] for row in b])
        np.testing.assert_allclose(ea, eb, atol=1e-9)


def test_secondary_structure_engine_independent(mixed_structure,
                                                monkeypatch):
    entries = D._flatten(mixed_structure)
    D._mark_connectivity(entries)
    acc, _ = D.compute_hbonds(entries)
    ss_c = D.assign_secondary_structure(entries, acc)
    assert "H" in ss_c  # the helix actually registered

    _numpy_only(monkeypatch)
    acc_np, _ = D.compute_hbonds(entries)
    assert ss_c == D.assign_secondary_structure(entries, acc_np)


def test_asa_matches_numpy(mixed_structure, monkeypatch):
    asa_c = D.shrake_rupley_asa(mixed_structure)
    _numpy_only(monkeypatch)
    asa_np = D.shrake_rupley_asa(mixed_structure)
    assert asa_c.keys() == asa_np.keys()
    va = np.array(list(asa_c.values()))
    vb = np.array([asa_np[k] for k in asa_c])
    assert (va > 0).any()
    np.testing.assert_allclose(va, vb, atol=1e-9)


def test_full_features_engine_independent(mixed_structure, monkeypatch):
    """End-to-end native_dssp_features: same SS string, same H-bond
    partners, ASA/energies equal after the schema's 0.1 rounding."""
    feats_c = D.native_dssp_features(mixed_structure)
    _numpy_only(monkeypatch)
    feats_np = D.native_dssp_features(mixed_structure)
    assert feats_c.keys() == feats_np.keys()
    for chain in feats_c:
        for fc, fn in zip(feats_c[chain], feats_np[chain]):
            for key in fc:
                if key == "res":
                    assert fc[key] is fn[key]
                elif key == "relative_ASA":
                    assert abs(fc[key] - fn[key]) < 1e-9
                else:
                    assert fc[key] == fn[key], key


def test_hbond_capacity_regrowth(tmp_path, monkeypatch):
    """The native scan retries with a larger buffer when the bond count
    exceeds the initial capacity guess."""
    path = write_chains_pdb(
        {"A": build_chain(-57, -47, n=30, chain_id="A")},
        str(tmp_path / "h.pdb"))
    entries = D._flatten(parse_pdb_chains(path))
    D._mark_connectivity(entries)
    full = D._hbond_scan_native(entries)
    assert full

    real_lib = load_native_lib()
    calls = []

    class OverflowOnce:
        def ks_hbond_scan(self, *args):
            calls.append(args[-1])  # cap
            if len(calls) == 1:
                return -1  # simulate a too-small buffer
            return real_lib.ks_hbond_scan(*args)

    import e3diff_tpu.native as N
    monkeypatch.setattr(N, "_LIB", OverflowOnce())
    monkeypatch.setattr(N, "_TRIED", True)
    assert D._hbond_scan_native(entries) == full
    assert len(calls) == 2 and calls[1] == 4 * calls[0]
