import time, sys
import jax, jax.numpy as jnp
from tpu_pathtracer.render.integrator import RenderConfig, render
from tpu_pathtracer.scenes import load_scene

n = int(sys.argv[1]); res = int(sys.argv[2]); spp = int(sys.argv[3]); depth = int(sys.argv[4])
cfg = RenderConfig(width=res, height=res, spp=spp, max_depth=depth,
                   strategy="mis", sampler="sobol", seed=0)
scene, meta, cam = load_scene(n, res, res, table_res=16)
t0=time.perf_counter()
img = render(scene, meta, cam, cfg); img.block_until_ready()
print(f"scene{n} {res}x{res}x{spp} d{depth}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
img = render(scene, meta, cam, cfg); img.block_until_ready()
print(f"  steady: {time.perf_counter()-t0:.3f}s mean={float(img.mean()):.4f}", flush=True)
