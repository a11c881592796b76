"""CLASS transfer-table loading tests (per-species ICs)."""

import numpy as np
import pytest

from shenqi_tpu.cosmology import Cosmology
from shenqi_tpu.cosmology.power import (InputPower, DELTA_BAR,
                                        DELTA_CDM, DELTA_NU, DELTA_CB,
                                        VEL_BAR, VEL_CDM, VEL_TOT)
from shenqi_tpu.utils.units import default_units

TK = "/root/reference/examples/class_tk_99.dat"
PK = "/root/reference/examples/dm-small/class_pk_9.dat"


def test_load_class_transfer():
    units = default_units()
    cp = Cosmology(Omega0=0.288, OmegaLambda=0.712, OmegaBaryon=0.0472,
                   HubbleParam=0.7, RadiationOn=1)
    a_ic = 0.01  # z=99
    cp.init(TimeBegin=a_ic, units=units)
    power = InputPower.from_file(PK, cp, units.UnitLength_in_cm)
    power.load_transfer(TK, a_ic)

    assert power.scale_dep_velocity
    tr = power.transfer_ratio
    # ratios are relative to the total: the CDM/baryon weighted sum
    # should reconstruct ~1 (no massive nu in this cosmology)
    w = (cp.OmegaBaryon * tr[DELTA_BAR] + cp.OmegaCDM * tr[DELTA_CDM]) \
        / (cp.OmegaBaryon + cp.OmegaCDM)
    np.testing.assert_allclose(w, 1.0, rtol=1e-10)
    # at z=99 baryons are smoother than CDM below the sound horizon
    assert tr[DELTA_BAR][-1] < tr[DELTA_CDM][-1]
    # on the largest scales they agree within a few percent
    assert tr[DELTA_BAR][0] == pytest.approx(tr[DELTA_CDM][0], rel=0.05)
    # delta_spec per species differs at high k
    k_int = 10 ** power.logk[-1] / power.mpc_scale
    db = power.delta_spec(k_int, DELTA_BAR)
    dc = power.delta_spec(k_int, DELTA_CDM)
    assert db < dc

    # velocity growth ratios exist and are positive on large scales
    gr = power.growth_ratio
    assert (gr[VEL_TOT][:10] > 0).all()
    dg = power.dlog_growth(k_int, DELTA_BAR)
    assert np.isfinite(dg) and dg > 0
