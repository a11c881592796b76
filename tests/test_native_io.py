"""Native C++ bigfile I/O: format compatibility with the Python layer."""

import os
import numpy as np
import pytest

from shenqi_tpu.io.native import available, write_block, read_block
from shenqi_tpu.io.bigfile import BigBlock, BigFile, _sysv_checksum

pytestmark = pytest.mark.skipif(not available(),
                                reason="native lib not built")


def test_native_write_python_read(tmp_path):
    path = str(tmp_path / "blk")
    rng = np.random.RandomState(0)
    data = rng.normal(size=(777, 3)).astype("<f4")
    assert write_block(path, "<f4", data, nfile=3)
    blk = BigBlock.open(path)
    assert blk.dtype == "<f4"
    assert blk.nmemb == 3
    assert blk.size == 777
    np.testing.assert_array_equal(blk.read(), data)
    # checksums in the header are correct sysv sums
    import re
    lines = open(os.path.join(path, "header")).read().splitlines()
    fsz = [l for l in lines if ":" in l and l.split(":")[0].strip()
           not in ("DTYPE", "NMEMB", "NFILE")]
    assert len(fsz) == 3


def test_python_write_native_read(tmp_path):
    root = str(tmp_path / "snap")
    bf = BigFile(root, create=True)
    data = np.arange(500, dtype="<u8")
    blk = bf.create_block("ID", "<u8", 500, nmemb=1, nfile=2)
    blk.write(0, data)
    blk.flush()
    out = read_block(os.path.join(root, "ID"), "<u8", 1)
    np.testing.assert_array_equal(out, data)
    out2 = read_block(os.path.join(root, "ID"), "<u8", 1, start=100,
                      count=33)
    np.testing.assert_array_equal(out2, data[100:133])


def test_native_checksum_matches_python():
    from shenqi_tpu.io import native
    lib = native._find_lib()
    data = np.random.RandomState(1).bytes(100000)
    import ctypes
    got = lib.bf_sysv_checksum(data, len(data))
    assert got == _sysv_checksum(data)
