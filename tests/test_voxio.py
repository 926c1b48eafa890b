"""`.vox` format round-trip and byte-layout tests (reference: io.clj:9-33)."""

import struct

import numpy as np
import pytest

from raymarchcl_tpu.io import voxio


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vox = rng.integers(0, 256, size=4 * 5 * 6, dtype=np.uint8)
    p = tmp_path / "t.vox"
    voxio.save_volume(p, (4, 5, 6), vox)
    out, res = voxio.load_volume(p)
    assert res == (4, 5, 6)
    np.testing.assert_array_equal(out, vox)


def test_exact_header_layout(tmp_path):
    """Byte-level compat: magic "VOXEL", 3x big-endian int32, elem size 1
    (io.clj:12-16 uses Java DataOutputStream = big-endian)."""
    vox = np.arange(8, dtype=np.uint8)
    p = tmp_path / "t.vox"
    voxio.save_volume(p, 2, vox)
    raw = p.read_bytes()
    assert raw[:5] == b"VOXEL"
    assert struct.unpack(">iii", raw[5:17]) == (2, 2, 2)
    assert raw[17] == 1
    assert raw[18:] == vox.tobytes()


def test_signed_byte_values_read_unsigned(tmp_path):
    """Values the reference writes as Java signed bytes 64/-128/-1
    (generators.clj:40-41) must read back as device uchar 64/128/255."""
    signed = np.array([64, -128, -1, 0, 127, -127], dtype=np.int8)
    p = tmp_path / "t.vox"
    voxio.save_volume(p, (6, 1, 1), signed.view(np.uint8))
    out, _ = voxio.load_volume(p)
    np.testing.assert_array_equal(out, [64, 128, 255, 0, 127, 129])


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.vox"
    p.write_bytes(b"NOPE!" + b"\x00" * 13)
    with pytest.raises(ValueError):
        voxio.load_volume(p)


def test_size_mismatch_rejected(tmp_path):
    with pytest.raises(ValueError):
        voxio.save_volume(tmp_path / "x.vox", (4, 4, 4), np.zeros(10, np.uint8))
