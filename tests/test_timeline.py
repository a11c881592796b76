"""Integer timeline tests (mirrors reference test_timebinmgr coverage)."""

import numpy as np
import pytest

from shenqi_tpu.core.timeline import (Timeline, TIMEBASE, TIMEBINS,
                                      dti_from_timebin,
                                      round_down_power_of_two,
                                      timebin_from_dti)


OUTPUTS = [0.1, 0.2, 0.8]
TimeIC, TimeMax = 0.05, 1.0


def make_timeline():
    return Timeline.setup(OUTPUTS, TimeIC, TimeMax)


def test_sync_points_built():
    tl = make_timeline()
    # TimeIC + 3 outputs + TimeMax
    assert tl.nsync == 5
    assert tl.syncpoints[0].loga == pytest.approx(np.log(TimeIC))
    assert tl.syncpoints[-1].loga == pytest.approx(np.log(TimeMax))
    assert not tl.syncpoints[0].write_snapshot
    assert tl.syncpoints[1].write_snapshot


def test_loga_ti_roundtrip():
    tl = make_timeline()
    for loga in np.log([0.06, 0.1, 0.15, 0.5, 0.9]):
        ti = tl.ti_from_loga(loga)
        assert tl.loga_from_ti(ti) == pytest.approx(loga, abs=1e-10)


def test_sync_point_queries():
    tl = make_timeline()
    # at ti=0 (TimeIC) the current sync point is the first
    assert tl.find_current_sync_point(0) is tl.syncpoints[0]
    assert tl.find_current_sync_point(1) is None
    nxt = tl.find_next_sync_point(0)
    assert nxt is tl.syncpoints[1]
    assert tl.find_next_ti_sync(0) == TIMEBASE
    assert tl.find_next_ti_sync(TIMEBASE + 5) == 2 * TIMEBASE
    # past the end
    assert tl.find_next_sync_point(5 * TIMEBASE) is None


def test_dloga_segments_differ():
    tl = make_timeline()
    # ticks in segment [0.05,0.1] are finer than [0.2,0.8]
    d0 = tl.dloga_interval_ti(0)
    d2 = tl.dloga_interval_ti(2 * TIMEBASE)
    assert d0 > 0 and d2 > 0
    assert d0 != d2
    assert d0 * TIMEBASE == pytest.approx(np.log(0.1 / 0.05))
    assert d2 * TIMEBASE == pytest.approx(np.log(0.8 / 0.2))


def test_dti_from_dloga_inverse():
    tl = make_timeline()
    ti = TIMEBASE // 2
    dloga = tl.get_dloga_for_bin(10, ti)
    dti = tl.dti_from_dloga(dloga, ti)
    assert dti == pytest.approx(dti_from_timebin(10), abs=1)
    assert tl.dloga_from_dti(dti, ti) == pytest.approx(dloga, rel=1e-6)


def test_power_of_two_helpers():
    assert dti_from_timebin(0) == 0
    assert dti_from_timebin(5) == 32
    assert round_down_power_of_two(0) == 0
    assert round_down_power_of_two(31) == 16
    assert round_down_power_of_two(32) == 32
    assert round_down_power_of_two(10 ** 30) == TIMEBASE
    assert timebin_from_dti(0) == 0
    assert timebin_from_dti(1) == 0
    assert timebin_from_dti(2) == 1
    assert timebin_from_dti(31) == 4
    assert timebin_from_dti(32) == 5


def test_drift_factor_matches_cosmology():
    from shenqi_tpu.cosmology import Cosmology
    from shenqi_tpu.utils.units import default_units
    cp = Cosmology(Omega0=1.0, OmegaLambda=0.0, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0)
    cp.init(TimeBegin=TimeIC, units=default_units())
    tl = make_timeline()
    ti0, ti1 = 0, TIMEBASE // 4
    a0, a1 = tl.atime_from_ti(ti0), tl.atime_from_ti(ti1)
    assert tl.exact_drift_factor(cp, ti0, ti1) == pytest.approx(
        cp.exact_drift_factor(a0, a1))


def test_predictor_tables_signs():
    """predictor_tables: factors are signed integrals from Ti_kick[bin]
    to the drift time (VelPred semantics)."""
    from shenqi_tpu.core.integrate import (DriftKickTimes,
                                           predictor_tables)
    from shenqi_tpu.cosmology import Cosmology
    from shenqi_tpu.utils.units import default_units
    import numpy as np

    cp = Cosmology(Omega0=1.0, OmegaLambda=0.0, OmegaBaryon=0.05,
                   HubbleParam=0.7, RadiationOn=0, CMBTemperature=0.0)
    cp.init(TimeBegin=0.1, units=default_units())
    tl = Timeline.setup([1.0], 0.1, 1.0)
    ti = TIMEBASE // 4
    times = DriftKickTimes.init(ti)
    # bin 3 kicked half-step ahead; bin 5 lags behind
    from shenqi_tpu.core.timeline import dti_from_timebin
    times.ti_kick[3] = ti + dti_from_timebin(3) // 2
    times.ti_kick[5] = ti - dti_from_timebin(5) // 2
    gk, hk, de, gk_pm = predictor_tables(cp, tl, times)
    gk, hk, de = np.asarray(gk), np.asarray(hk), np.asarray(de)
    # ahead of drift time -> negative (roll back), behind -> positive
    assert gk[3] < 0 and hk[3] < 0 and de[3] < 0
    assert gk[5] > 0 and hk[5] > 0 and de[5] > 0
    # exact values match the quadrature directly
    a0 = tl.atime_from_ti(times.ti_kick[3])
    a1 = tl.atime_from_ti(ti)
    assert gk[3] == pytest.approx(cp.exact_gravkick_factor(a0, a1),
                                  rel=1e-5)
    # in-sync bins predict zero
    assert gk[1] == 0 and de[1] == 0 and gk_pm == 0.0
