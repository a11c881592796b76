# Verify the eEOS thermostat pins the traced runaway state once the
# source dtime is the particle's OWN bin dloga.
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp, jax
from shenqi_tpu.physics.sfr import SFRParams, CoolingUnits, starformation_step
from shenqi_tpu.physics.cooling_rates import CoolingParams, TreeCool, UVBG
from shenqi_tpu.cli.params import gadget_params

from shenqi_tpu.utils.units import get_unitsystem
from shenqi_tpu.cosmology.background import Cosmology

ps = gadget_params()
ps.parse_file("/tmp/star_small_r3f_1/paramfile.gadget", strict=False)
units = get_unitsystem(ps.get_double("UnitLength_in_cm"),
                       ps.get_double("UnitMass_in_g"),
                       ps.get_double("UnitVelocity_in_cm_per_s"))
from shenqi_tpu.io.snapshot import SnapshotHeader
from shenqi_tpu.io.bigfile import BigFile
hdr = SnapshotHeader.read(BigFile("/tmp/star_small_r3f_1/IC/IC"))
from shenqi_tpu.cli.gadget_main import load_cosmology
cp = load_cosmology(ps, hdr, 0.1, units)
coolpar = CoolingParams(
    CMBTemperature=ps.get_double("CMBTemperature"),
    MinGasTemp=ps.get_double("MinGasTemp"),
    PhotoIonizeFactor=ps.get_double("PhotoIonizeFactor"),
    SelfShieldingOn=bool(ps.get_int("SelfShieldingOn")),
    PhotoIonizationOn=bool(ps.get_int("PhotoIonizationOn")),
    UVRedshiftThreshold=ps.get_double("UVRedshiftThreshold"),
    fBar=cp.OmegaBaryon/max(cp.Omega0-cp.OmegaBaryon,1e-10))
cu = CoolingUnits.create(units, cp.HubbleParam)
sp = SFRParams(CritOverDensity=ps.get_double("CritOverDensity"),
               CritPhysDensity=ps.get_double("CritPhysDensity"),
               FactorSN=ps.get_double("FactorSN"),
               FactorEVP=ps.get_double("FactorEVP"),
               TempSupernova=ps.get_double("TempSupernova"),
               TempClouds=ps.get_double("TempClouds"),
               MaxSfrTimescale=ps.get_double("MaxSfrTimescale"),
               Generations=int(ps.get_double("Generations")),
               MinGasTemp=ps.get_double("MinGasTemp"),
               BHFeedbackUseTcool=ps.get_int("BHFeedbackUseTcool"))
avg_bar = 1.8e-5  # approx; only sets star masses, not the thermostat
sp.init(cp, units, avg_bar, UVBG(), coolpar)
tc = TreeCool(ps.get_string("TreeCoolFile"), coolpar.PhotoIonizeFactor) if ps.get_string("TreeCoolFile") else None

a = 0.110978
a3inv = 1/a**3
z = 1/a - 1
uvbg = tc.uvbg(z, coolpar) if tc else UVBG()
H = float(cp.hubble_function(a))
print(f"a={a} H={H:.4f} PhysDensThresh={sp.PhysDensThresh:.4e} OverDensThresh={sp.OverDensThresh:.4e}")

# the traced states of id 441738 at steps 79..84
ents = np.array([8.8569e4, 3.344e6, 6.2102e7, 1.9459e10, 2.487e11, 6.5145e17], np.float32)
dens = np.full_like(ents, 1.5e-6)
n = len(ents)
key = jax.random.PRNGKey(0)
for dloga_bin in (2.16e-4, 0.021):   # global-min (old behaviour) vs bin-36 (new)
    dt = jnp.full((n,), dloga_bin / H, jnp.float32)
    res = starformation_step(key, jnp.asarray(dens), jnp.asarray(dens),
                             jnp.asarray(ents), jnp.full((n,), 1.8e-5, jnp.float32),
                             jnp.ones(n, jnp.float32), jnp.zeros(n, jnp.float32),
                             jnp.zeros(n, jnp.int32), dt, a3inv, z, uvbg,
                             sp, coolpar, cu, jnp.ones(n, bool))
    print(f"dloga={dloga_bin:g}: ent_in -> ent_out")
    for ei, eo, s in zip(ents, np.asarray(res.entropy), np.asarray(res.sfr)):
        print(f"  {ei:.3e} -> {eo:.3e}  (sfr {s:.3g})")
