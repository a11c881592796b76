"""Walltime, HCI, stats utility tests (test_hci analog with fake clock)."""

import io
import os
import time

import numpy as np
import pytest

from shenqi_tpu.utils.walltime import Walltime
from shenqi_tpu.utils.hci import (HCI, HCI_NO_ACTION, HCI_STOP,
                                  HCI_CHECKPOINT, HCI_TERMINATE,
                                  HCI_TIMEOUT, HCI_AUTO_CHECKPOINT)


def test_walltime_accumulates():
    w = Walltime()
    time.sleep(0.01)
    dt = w.measure("/Grav/Tree")
    assert dt >= 0.01
    time.sleep(0.005)
    w.measure("/SPH/Density")
    assert w.total_acc["/Grav/Tree"] >= 0.01
    assert w.total_acc["/SPH/Density"] >= 0.005
    buf = io.StringIO()
    w.write_cpu_log(buf, atime=0.5)
    out = buf.getvalue()
    # cpu.txt rows use the reference format: indented name without
    # the leading slash (walltime.cpp:185-205), parseable by
    # tools/parsebench.py
    assert "Grav/Tree" in out and "Step 0" in out
    assert "MPIs: 1 Threads: 1 Elapsed:" in out
    w.reset_step()
    assert w.step_acc == {}
    assert w.total_acc["/Grav/Tree"] >= 0.01


def test_hci_files(tmp_path):
    h = HCI(str(tmp_path), time_limit_cpu=1e9)
    assert h.query() == HCI_NO_ACTION
    (tmp_path / "checkpoint").touch()
    assert h.query() == HCI_CHECKPOINT
    assert not (tmp_path / "checkpoint").exists()  # consumed
    (tmp_path / "stop").touch()
    assert h.query() == HCI_STOP
    (tmp_path / "terminate").touch()
    assert h.query() == HCI_TERMINATE


def test_hci_timeout_fake_clock(tmp_path):
    """The timeout fires when the longest PM gap no longer fits
    (hci_override_now-style fake clock)."""
    h = HCI(str(tmp_path), time_limit_cpu=100.0)
    h.override_now(0.0)
    h._t_begin = 0.0
    h._t_last_query = 0.0
    h._t_last_checkpoint = 0.0
    assert h.query() == HCI_NO_ACTION
    h.override_now(40.0)   # a 40s PM step observed
    assert h.query() == HCI_NO_ACTION   # 40 + 40 < 100
    h.override_now(80.0)
    assert h.query() == HCI_TIMEOUT     # 80 + 40 > 100


def test_hci_auto_checkpoint(tmp_path):
    h = HCI(str(tmp_path), time_limit_cpu=1e9, auto_checkpoint_time=50)
    h.override_now(0.0)
    h._t_begin = 0.0
    h._t_last_query = 0.0
    h._t_last_checkpoint = 0.0
    assert h.query() == HCI_NO_ACTION
    h.override_now(60.0)
    assert h.query() == HCI_AUTO_CHECKPOINT
    h.override_now(70.0)
    assert h.query() == HCI_NO_ACTION


def test_blackhole_statistics(tmp_path):
    """blackholes.txt line + binary BH details roundtrip."""
    import io
    from shenqi_tpu.utils.stats import blackhole_statistics, bh_details
    from shenqi_tpu.utils.units import default_units
    units = default_units()
    buf = io.StringIO()
    bh_mass = np.array([1e-4, 0.0, 5e-4], np.float32)
    bh_mdot = np.array([1e-6, 0.0, 2e-6], np.float32)
    alive = np.array([True, True, True])
    blackhole_statistics(buf, 0.5, bh_mass, bh_mdot, alive, units)
    parts = buf.getvalue().split()
    assert int(parts[1]) == 2                       # two live BHs
    assert float(parts[2]) == pytest.approx(6e-4, rel=1e-5)
    assert float(parts[3]) == pytest.approx(3e-6, rel=1e-5)
    assert float(parts[4]) > 0 and float(parts[5]) > 0

    fn = tmp_path / "bhdet.bin"
    with open(fn, "wb") as f:
        n = bh_details(f, 0.5, np.array([7, 8, 9], np.uint64),
                       bh_mass, bh_mdot,
                       np.array([1e-8, 0, 2e-8], np.float32),
                       np.zeros((3, 3), np.float32),
                       np.ones((3, 3), np.float32), alive)
    assert n == 2
    rec = np.fromfile(fn, dtype=[
        ("ID", "<u8"), ("Time", "<f8"), ("Mass", "<f4"),
        ("Mdot", "<f4"), ("Density", "<f4"), ("Pos", "<f4", 3),
        ("Vel", "<f4", 3)])
    assert list(rec["ID"]) == [7, 9]
    assert rec["Time"][0] == 0.5
    assert rec["Mass"][1] == pytest.approx(5e-4)
