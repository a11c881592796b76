import os, sys
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from shenqi_tpu.cli.genic_main import run_genic
from shenqi_tpu.cli.gadget_main import run_gadget
import shenqi_tpu.parallel.slab_sim as ss

out = "/tmp/nu_reuse_e2e"
os.makedirs(out, exist_ok=True)
open(f"{out}/p.genic","w").write(f"""
OutputDir = {out}/IC
FileBase = IC
Ngrid = 12
BoxSize = 64000
Omega0 = 0.288
OmegaLambda = 0.712
OmegaBaryon = 0.0472
ProduceGas = 0
HubbleParam = 0.7
Redshift = 9
FileWithInputSpectrum = /root/reference/examples/dm-small/class_pk_9.dat
DifferentTransferFunctions = 0
UsePeculiarVelocity = 1
Seed = 181170
UnitaryAmplitude = 1
""")
run_genic(f"{out}/p.genic")
G = """
InitCondFile = {out}/IC/IC
OutputDir = {outdir}
OutputList = 0.125
TimeMax = 0.125
Omega0 = 0.288
MassiveNuLinRespOn = 1
MNue = 0.3
HydroOn = 0
CoolingOn = 0
StarformationOn = 0
DensityIndependentSphOn = 0
SnapshotWithFOF = 0
PartAllocFactor = 2.0
BlackHoleOn = 0
MetalReturnOn = 0
WindOn = 0
Nmesh = 24
"""
open(f"{out}/single.gadget","w").write(G.format(out=out, outdir=f"{out}/single"))
sim1 = run_gadget(f"{out}/single.gadget")

calls = []
orig = ss.pm_forces_slab
ss.pm_forces_slab = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
open(f"{out}/mesh.gadget","w").write(G.format(out=out, outdir=f"{out}/mesh"))
sim2 = run_gadget(f"{out}/mesh.gadget", mesh_devices=8)
assert not calls, f"nu mesh run traced pm_forces_slab {len(calls)}x (no reuse!)"
nt1, nt2 = sim1.nu_table, sim2.nu_table
assert nt2.delta_tot is not None and nt2.delta_tot.shape[1] >= 2
np.testing.assert_allclose(nt2.delta_tot[:, -1], nt1.delta_tot[:, -1], rtol=5e-2)
a1, k1, pk1, nm1 = sim1.power_history[-1]
a2, k2, pk2, nm2 = sim2.power_history[-1]
sel = (nm1 > 0) & (nm2 > 0)
np.testing.assert_allclose(pk2[sel], pk1[sel], rtol=5e-2)
print("NU-REUSE E2E PASS: no second deposit; delta_nu history and P(k) match single-device")
