"""Tiled-warp (D, tile) parameter sweep on the mixed-block flow (r5
follow-up; run when the tunnel is up)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from scipy.ndimage import gaussian_filter as gf
from tpuflow.solvers.farneback import _warp_tiled, _pack_bilinear
print("devices:", jax.devices(), flush=True)
h, w = 1080, 1920
rng = np.random.default_rng(3)
fields = [jnp.asarray(gf(rng.normal(0,1,(h,w)), 2).astype(np.float32)) for _ in range(5)]
u_m = np.full((h, w), -16.0, np.float32); v_m = np.zeros((h, w), np.float32)
u_m[400:700, 300:800] = 10.0; v_m[400:700, 300:800] = 8.0
u = jnp.asarray(gf(u_m, 8)); v = jnp.asarray(gf(v_m, 8))
packed = _pack_bilinear(fields)

def timeit(D, th, tw, reps=10):
    @jax.jit
    def run(u, v, *Fs):
        out = _warp_tiled(Fs, u, v, packed, D=D, th=th, tw=tw)
        return sum(jnp.sum(o) for o in out)
    float(run(u, v, *fields))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps): out = run(u, v, *fields)
        float(out)
        best = min(best, (time.perf_counter()-t0)/reps)
    return best*1e3

for D, th, tw in [(3,32,256),(2,32,256),(2,64,256),(3,64,256),(2,32,512),(2,64,512),(3,72,1920),(2,72,1920),(2,120,1920)]:
    print(f"D={D} th={th} tw={tw}: {timeit(D,th,tw):.1f} ms", flush=True)
