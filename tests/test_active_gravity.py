"""Active-subset stencil gravity equals the full eval on active rows
(run.cpp:488 ActiveParticles semantics: per-step short-range forces
are computed for the active bins only; sources stay ALL particles).
Round-5: the non-hierarchical single-device loop uses this for every
small-bin step (simulation._compute_tree)."""
import numpy as np, jax, jax.numpy as jnp
from shenqi_tpu.gravity.stencil import stencilgrav
from shenqi_tpu.gravity.shortrange import ShortRangeParams
from shenqi_tpu.core.particles import float_to_ipos


def test_active_subset_matches_full():
    rng=np.random.RandomState(0)
    n=4096; box=10000.0
    pos=rng.uniform(0,box,(n,3)).astype(np.float64)
    # add a clustered clump
    pos[:512]=pos[0]+rng.normal(0,150,(512,3))
    ipos=jnp.asarray(float_to_ipos(pos%box,box))
    mass=jnp.ones(n,jnp.float32)
    nmesh=64; cell=box/nmesh
    sp=ShortRangeParams(boxsize=box,cellsize=cell,rcut=6*cell,asmth=1.5,use_bh=0,softening=box/n**(1/3)/30*2.8,G=43007.1)
    from shenqi_tpu.gravity.window import window_polynomials
    wt=window_polynomials(sp.asmth)
    tc,cc={},{}
    acc_full,_,_=stencilgrav(ipos,mass,sp,wt,tier_cache=tc,caps_cache=cc)
    act=np.zeros(n,bool); act[rng.choice(n,137,replace=False)]=True
    acc_act,_,_=stencilgrav(ipos,mass,sp,wt,n_targets=137,active=jnp.asarray(act),tier_cache=tc,caps_cache=cc)
    a1=np.asarray(acc_full)[act]; a2=np.asarray(acc_act)[act]
    scale=np.abs(a1).max()
    err=np.abs(a2-a1).max()/scale
    print(f"max rel diff on active rows: {err:.2e}")
    assert err<1e-5, err
    print("ok")
