import numpy as np, sys
sys.path.insert(0,'/root/repo')
import jax; jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp, dataclasses
from examples.cornell import build_scene
from hikari_tpu import Camera, HikariSettings, Renderer
from hikari_tpu.config import Taa, Upscale
from hikari_tpu.ops.trace import make_tracer
from hikari_tpu.ops.sampling import select_light_candidate, occlude_hit_info
from hikari_tpu.ops.shading import input_radiance, shading, retrieve_surface
from hikari_tpu.utils.math import luminance, normalize, dot3
import hikari_tpu.ops.restir as R

settings = dataclasses.replace(HikariSettings(), clear_color=(0.,0.,0.,1.),
                               taa=Taa.NONE, upscale=Upscale.none())
cam = Camera.from_look_at(width=160, height=120, eye=(0.,1.,4.), target=(0.,1.,0.))
r = Renderer(build_scene(), cam, settings)
for i in range(24):
    r.render_frame()
dbg = r.render_dissection()
y, x = 106, 76
print("steady channel value at (106,76):", dbg["emissive_raw"][y,x,:3],
      "denoised:", dbg["emissive_denoised"][y,x,:3])

scene = {k: jnp.asarray(v) for k, v in r.gpu_scene.arrays.items()}
tracer = make_tracer(r.gpu_scene.num_triangles)
P = dbg["gbuffer_position"][y,x,:3]; Nv = dbg["gbuffer_normal"][y,x,:3]
K = 4000
rng = np.random.default_rng(5)
pos = jnp.tile(jnp.asarray(P)[None,:], (K,1))
nrm = jnp.tile(jnp.asarray(Nv)[None,:], (K,1))
inst = jnp.zeros((K,), jnp.int32)
r4 = jnp.asarray(rng.random((K,4)), jnp.float32)
cand, info = select_light_candidate(scene, tracer, r4, pos, nrm, inst,
                                    jnp.float32(0.046), sample_emissive=True)
ro = pos + nrm * R.RAY_BIAS
rd = cand["direction"]
ok = (dot3(rd, nrm) > 0.0) & (cand["p"] > 0.0) & (cand["emissive_instance"] >= 0)
hit = tracer(scene, ro, rd, cand["max_distance"], cand["emissive_instance"], None, cand["min_distance"])
info2 = occlude_hit_info(ro, rd, hit, info)
rad = input_radiance(scene, rd, info2["instance"], info2["material"], info2["uv"],
                     sample_directional=False, sample_emissive=cand["emissive_instance"],
                     sample_ambient=False, solar_angle=jnp.float32(0.046), no_texture=True)
rad = jnp.where(ok[:,None], rad, 0.0)
mat = jnp.full((K,), 6, jnp.int32)
surface = retrieve_surface(scene, mat, jnp.zeros((K,2)), True)
view_dir = normalize(jnp.asarray([0.,1.,4.])[None,:]-pos)
out = shading(scene, view_dir, nrm, rd, surface, rad)
est = np.asarray(out[:, :3]) / np.maximum(np.asarray(cand["p"])[:,None], 1e-30)
est = np.where(np.asarray(ok)[:,None], est, 0.0)
print(f"MC truth at (106,76): {est.mean(0)}  (occluded frac: {1-np.asarray(ok & (luminance(rad[:,:3])>0)).mean():.3f})")
