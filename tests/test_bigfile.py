"""bigfile format tests: round-trip + cross-validation against the C tools.

The C reference utilities (built from the vendored bigfile sources into
/tmp/bigfile_build) are used, when present, to verify on-disk format
compatibility in both directions.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from shenqi_tpu.io.bigfile import BigFile, BigBlock, _sysv_checksum

CTOOLS = "/tmp/bigfile_build"
HAVE_CTOOLS = os.path.exists(os.path.join(CTOOLS, "bigfile-cat"))


def test_roundtrip_basic(tmp_path):
    root = str(tmp_path / "snap")
    bf = BigFile(root, create=True)
    pos = np.random.RandomState(42).uniform(0, 100, (1000, 3))
    blk = bf.create_block("1/Position", "<f8", 1000, nmemb=3, nfile=3)
    blk.write(0, pos)
    blk.attrs["BoxSize"] = np.array([100.0])
    blk.flush()

    bf2 = BigFile(root)
    blk2 = bf2["1/Position"]
    assert blk2.size == 1000
    assert blk2.nmemb == 3
    assert blk2.dtype == "<f8"
    np.testing.assert_array_equal(blk2.read(), pos)
    np.testing.assert_array_equal(blk2.read(100, 50), pos[100:150])
    np.testing.assert_allclose(blk2.attrs["BoxSize"], [100.0])


def test_roundtrip_dtypes(tmp_path):
    root = str(tmp_path / "snap")
    bf = BigFile(root, create=True)
    rng = np.random.RandomState(1)
    cases = {
        "ID": (rng.randint(0, 2 ** 62, 100).astype("<u8"), 1),
        "Mass": (rng.uniform(size=100).astype("<f4"), 1),
        "Vel": (rng.normal(size=(100, 3)).astype("<f4"), 3),
        "Type": (rng.randint(0, 6, 100).astype("<i4"), 1),
    }
    for name, (data, nmemb) in cases.items():
        blk = bf.create_block(name, data.dtype, 100, nmemb=nmemb)
        blk.write(0, data)
        blk.flush()
    bf2 = BigFile(root)
    for name, (data, nmemb) in cases.items():
        np.testing.assert_array_equal(bf2[name].read(), data)


def test_partial_writes(tmp_path):
    """Writes by chunks spanning file boundaries (the MPI-writer pattern)."""
    root = str(tmp_path / "snap")
    bf = BigFile(root, create=True)
    data = np.arange(1003, dtype="<f8")
    blk = bf.create_block("X", "<f8", 1003, nfile=4)
    # write in uneven chunks
    for s, e in [(0, 311), (311, 700), (700, 1003)]:
        blk.write(s, data[s:e])
    blk.flush()
    np.testing.assert_array_equal(BigFile(root)["X"].read(), data)


def test_attrs_roundtrip(tmp_path):
    root = str(tmp_path / "snap")
    bf = BigFile(root, create=True)
    blk = bf.create_block("Header", "<i8", 0)
    blk.attrs["TotNumPart"] = np.array([64 ** 3, 0, 0, 0, 0, 0],
                                       dtype="<u8")
    blk.attrs["BoxSize"] = np.array([64000.0])
    blk.attrs["CodeVersion"] = "shenqi-tpu 0.1"
    blk.flush()
    attrs = BigFile(root)["Header"].attrs
    np.testing.assert_array_equal(attrs["TotNumPart"],
                                  [64 ** 3, 0, 0, 0, 0, 0])
    assert attrs["CodeVersion"] == "shenqi-tpu 0.1"


def test_sysv_checksum():
    assert _sysv_checksum(b"") == 0
    assert _sysv_checksum(b"\x01\x02") == 3
    assert _sysv_checksum(b"\xff" * 100000) == 255 * 100000


def test_blocks_listing(tmp_path):
    root = str(tmp_path / "snap")
    bf = BigFile(root, create=True)
    for name in ["Header", "0/Position", "0/Velocity", "1/Position"]:
        bf.create_block(name, "<f4", 10).flush()
    assert bf.blocks() == sorted(["Header", "0/Position", "0/Velocity",
                                  "1/Position"])


@pytest.mark.skipif(not HAVE_CTOOLS, reason="C bigfile tools not built")
def test_c_reads_python_written(tmp_path):
    """The reference C library must read what we write."""
    root = str(tmp_path / "snap")
    bf = BigFile(root, create=True)
    data = np.arange(300, dtype="<f8").reshape(100, 3)
    blk = bf.create_block("0/Position", "<f8", 100, nmemb=3, nfile=2)
    blk.write(0, data)
    blk.attrs["BoxSize"] = np.array([42.0])
    blk.flush()
    out = subprocess.run(
        [os.path.join(CTOOLS, "bigfile-cat"), root, "0/Position"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    rows = [list(map(float, l.split())) for l in
            out.stdout.strip().splitlines()]
    np.testing.assert_allclose(np.array(rows), data)


@pytest.mark.skipif(not HAVE_CTOOLS, reason="C bigfile tools not built")
def test_python_reads_c_written(tmp_path):
    """We must read what the reference C library writes."""
    root = str(tmp_path / "csnap")
    # bigfile-create usage: [-n nmemb] filepath block dtype, raw binary
    # rows on stdin.
    create = os.path.join(CTOOLS, "bigfile-create")
    data = np.arange(20, dtype="<f8").reshape(10, 2)
    out = subprocess.run([create, "-n", "2", root, "testblock", "<f8"],
                         input=data.tobytes(), capture_output=True)
    assert out.returncode == 0, out.stderr
    blk = BigFile(root)["testblock"]
    np.testing.assert_allclose(blk.read(), data)
