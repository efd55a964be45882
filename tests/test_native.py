"""Native host-runtime library tests (builds with g++ on first use)."""

import bz2 as py_bz2
import struct

import numpy as np
import pytest

from liorf_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library could not be built")
    return lib


def test_pc2_extract_matches_numpy(lib, rng):
    n, step = 500, 22
    data = bytearray(n * step)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    inten = rng.uniform(size=n).astype(np.float32)
    ring = rng.integers(0, 64, size=n).astype(np.uint16)
    t = rng.uniform(0, 0.1, size=n).astype(np.float32)
    for i in range(n):
        struct.pack_into("<ffffHf", data, i * step, xyz[i, 0], xyz[i, 1], xyz[i, 2], inten[i], ring[i], t[i])
    # fields: x(0,f32) y(4) z(8) intensity(12) ring(16,u16=4) time(18)
    out = native.pc2_extract(bytes(data), n, step, [(0, 7), (4, 7), (8, 7), (12, 7), (16, 4), (18, 7)])
    assert out is not None
    np.testing.assert_allclose(out[0], xyz[:, 0], atol=1e-7)
    np.testing.assert_allclose(out[2], xyz[:, 2], atol=1e-7)
    np.testing.assert_allclose(out[3], inten, atol=1e-7)
    np.testing.assert_allclose(out[4], ring.astype(np.float32))
    np.testing.assert_allclose(out[5], t, atol=1e-7)


def test_bz2_decompress(lib):
    raw = b"liorf-tpu native runtime " * 100
    comp = py_bz2.compress(raw)
    out = native.bz2_decompress(comp, len(raw))
    if out is None:
        pytest.skip("libbz2 not found at runtime")
    assert out == raw


def test_prefetcher_roundtrip(lib, tmp_path, rng):
    paths = []
    contents = []
    for i in range(10):
        p = tmp_path / f"f{i}.bin"
        c = rng.bytes(1000 + i * 17)
        p.write_bytes(c)
        paths.append(str(p))
        contents.append(c)
    pf = native.FilePrefetcher(paths, n_threads=2, depth=4)
    # consume out of order within the window
    assert pf.get(1) == contents[1]
    assert pf.get(0) == contents[0]
    for i in range(2, 10):
        assert pf.get(i) == contents[i]
    pf.close()


def test_pack_scan_matches_numpy(lib, rng):
    """ln_pack_scan parity with the numpy _pack_scan filter, including
    NaN/inf points, ring decimation, and point stride."""
    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig

    n = 7000
    xyz = rng.normal(scale=30.0, size=(n, 3)).astype(np.float32)
    xyz[::13] = np.nan
    xyz[1::97] = np.inf
    rel = rng.random(n).astype(np.float64) * 0.1
    ring = (np.arange(n) % 16).astype(np.int32)

    cfg = SlamConfig(scan_capacity=2048, downsampleRate=2, point_filter_num=3)
    pipe = ResidentPipeline(cfg)

    class Scan:
        pass

    s = Scan()
    s.xyz, s.rel_time, s.ring = xyz, rel, ring
    xyz_ref, rts_ref, msk_ref = pipe._pack_scan(s)

    S = cfg.scan_capacity
    buf = np.empty(5 * S, np.float32)
    kept = native.pack_scan_into(
        xyz, rel, ring, cfg.lidarMinRange**2, cfg.lidarMaxRange**2,
        cfg.downsampleRate, cfg.point_filter_num,
        buf[: 3 * S].reshape(S, 3), buf[3 * S : 4 * S], buf[4 * S : 5 * S],
    )
    assert kept == int(msk_ref.sum())
    np.testing.assert_array_equal(buf[: 3 * S].reshape(S, 3), xyz_ref)
    np.testing.assert_array_equal(buf[3 * S : 4 * S], rts_ref)
    np.testing.assert_array_equal(buf[4 * S : 5 * S], msk_ref.astype(np.float32))


def test_pack_scan_truncation_and_null_mask(lib, rng):
    """Overflowing the pack buffer returns the TOTAL passing count (> cap)
    with exactly cap points written compactly; msk_out=None skips mask
    writes; malformed inputs fall back (-1) instead of reading OOB."""
    n = 5000
    xyz = rng.normal(scale=20.0, size=(n, 3)).astype(np.float32)
    rel = rng.random(n).astype(np.float64) * 0.1

    cap = 512
    xyz_out = np.empty((cap, 3), np.float32)
    rts_out = np.empty(cap, np.float32)
    tot = native.pack_scan_into(
        xyz, rel, None, 1.0, 1.0e6, 1, 1, xyz_out, rts_out, None
    )
    n_pass = int(
        np.sum(np.einsum("ij,ij->i", xyz, xyz) >= 1.0)
    )
    assert tot == n_pass > cap
    assert np.isfinite(xyz_out).all() and (np.abs(xyz_out) < 1.0e6).all()

    # length-mismatched rel must NOT be read out of bounds: falls back
    assert native.pack_scan_into(
        xyz, rel[: n // 2], None, 1.0, 1.0e6, 1, 1, xyz_out, rts_out, None
    ) == -1
    # ring=None with downsampleRate>1 diverged from numpy (which raises):
    # now falls back so both paths fail loudly
    assert native.pack_scan_into(
        xyz, rel, None, 1.0, 1.0e6, 2, 1, xyz_out, rts_out, None
    ) == -1
