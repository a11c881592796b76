import os, sys
import numpy as np
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"]="cpu"
from shenqi_tpu.io.bigfile import BigFile
GAMMA=5.0/3.0; GM1=GAMMA-1.0
snap=sys.argv[1]; focal=int(sys.argv[2])
bf=BigFile(snap)
g={c:np.asarray(bf[f"0/{c}"].read()) for c in ("ID","Position","Velocity","InternalEnergy","Density","EgyWtDensity","SmoothingLength","Mass")}
hdr=bf["Header"].attrs
a=float(np.atleast_1d(hdr["Time"])[0]); box=float(np.atleast_1d(hdr["BoxSize"])[0])
from shenqi_tpu.cosmology.background import Cosmology
from shenqi_tpu.utils.units import get_unitsystem
units=get_unitsystem(3.085678e21,1.989e43,1e5)
cp=Cosmology(Omega0=0.288,OmegaLambda=0.712,OmegaBaryon=0.0472,HubbleParam=0.7,RadiationOn=1)
cp.init(0.1,units)
hub=float(cp.hubble_function(a))
i=int(np.nonzero(g["ID"]==focal)[0][0])
pos=g["Position"].astype(np.float64); vel=g["Velocity"].astype(np.float64)
u=g["InternalEnergy"].astype(np.float64); rho=g["Density"].astype(np.float64)
egyw=np.maximum(g["EgyWtDensity"].astype(np.float64),1e-35)
H=g["SmoothingLength"].astype(np.float64); m=g["Mass"].astype(np.float64)
# entropy wrt comoving egywt density (DensityIndependentSph): u = A egyw^GM1 / GM1 ... actually
# code: press=(entvar*egyw)^GAMMA with entvar=A^(1/GAMMA); recover A from u & rho (plain density convention sfr_eff:637):
A=u*GM1/np.maximum(rho,1e-35)**GM1
entvar=np.maximum(A,1e-35)**(1.0/GAMMA)
press=np.maximum(entvar*egyw,1e-35)**GAMMA
cs=np.sqrt(GAMMA*press/egyw)
dp=pos-pos[i]; dp=(dp+box/2)%box-box/2
r2=(dp**2).sum(1); Hi=H[i]
nbr=np.nonzero((r2>0)&(r2<np.maximum(Hi,H)**2))[0]
r=np.sqrt(r2[nbr])
fac_mu=a**(3*GM1/2)/a; hubble_a2=hub*a*a
dv=vel[i]-vel[nbr]
vdotr=(dp[nbr]*(-dv)).sum(1)*-1.0  # dx = pos_nbr - pos_i; formula uses dx_i - dx_j... match analyzer: dx=pos-pos[i] rows nbr => dx_j; analyzer: dx = pos - pos[row] then dv=vel[i]-vel[nbr]; vdotr=(dx[nbr]*dv).sum
vdotr=(dp[nbr]*dv).sum(1)
vdotr2=vdotr+hubble_a2*r2[nbr]
mu=fac_mu*vdotr2/r
vsig=cs[i]+cs[nbr]-3*mu
approach=vdotr2<0
rho_ij=0.5*(rho[i]+rho[nbr])
visc=np.where(approach,0.25*0.75*vsig*(-mu)/rho_ij*2.0,0.0)  # f1+f2 = 2 upper bound
sig=8.0/np.pi
def dwk(q,Hh):
    q=np.minimum(q,1.0)
    return sig/Hh**4*np.where(q<0.5,6*q*(3*q-2),-6*(1-q)**2)
hfc=0.5*m[nbr]*visc*(dwk(r/Hi,Hi)+dwk(r/H[nbr],H[nbr]))/r
contrib=0.5*hfc*vdotr2
conv=GM1/(hubble_a2*np.maximum(rho[i],1e-35)**GM1)
dts=contrib.sum()*conv
print(f"a={a} id={focal} row={i} A={A[i]:.4e} u={u[i]:.4e} rho={rho[i]:.4e} cs={cs[i]:.4g} h={Hi:.4g} nngb={len(nbr)}")
pass
# dt_entropy is dA/dt internal; per-dloga: /(H)
print(f"dts (dA/dt internal) = {dts:.4e}; A e-fold dloga = {A[i]/max(dts,1e-300)*hub:.4g}")
# observed growth: 6.17x over dloga=ln(0.12/0.115)
dlobs=np.log(0.12/0.115)
print(f"observed dlnA/dloga (PART_002->003) = {1.816/dlobs:.3g}; required dA/dt = {A[i]*1.816/dlobs*hub:.4e}")
print(f"ratio required/recomputed-upper = {A[i]*1.816/dlobs*hub/max(dts,1e-300):.3g}")
