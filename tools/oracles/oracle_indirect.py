import numpy as np, sys
sys.path.insert(0,'/root/repo')
import jax; jax.config.update('jax_platforms','cpu')
import jax.numpy as jnp, dataclasses
from examples.cornell import build_scene
from hikari_tpu import Camera, HikariSettings, Renderer
from hikari_tpu.config import Taa, Upscale
from hikari_tpu.ops.trace import make_tracer
from hikari_tpu.ops.sampling import select_light_candidate, occlude_hit_info
from hikari_tpu.utils.math import sample_cosine_hemisphere
from hikari_tpu.ops.shading import input_radiance, shading, retrieve_surface
from hikari_tpu.utils.math import luminance, normalize, dot3, apply_normal_basis
import hikari_tpu.ops.restir as R

settings = dataclasses.replace(HikariSettings(), clear_color=(0.,0.,0.,1.),
                               taa=Taa.NONE, upscale=Upscale.none())
cam = Camera.from_look_at(width=160, height=120, eye=(0.,1.,4.), target=(0.,1.,0.))
r = Renderer(build_scene(), cam, settings)
for i in range(24):
    r.render_frame()
dbg = r.render_dissection()
y, x = 106, 76
print("channel indirect raw/denoised:", dbg["indirect_raw"][y,x,:3], dbg["indirect_denoised"][y,x,:3])

scene = {k: jnp.asarray(v) for k, v in r.gpu_scene.arrays.items()}
tracer = make_tracer(r.gpu_scene.num_triangles)
P = dbg["gbuffer_position"][y,x,:3]; Nv = dbg["gbuffer_normal"][y,x,:3]
K = 4000
rng = np.random.default_rng(7)
pos = jnp.tile(jnp.asarray(P)[None,:], (K,1))
nrm = jnp.tile(jnp.asarray(Nv)[None,:], (K,1))
r4 = jnp.asarray(rng.random((K,4)), jnp.float32)

local, bpdf = sample_cosine_hemisphere(r4[:, :2])
rd = apply_normal_basis(nrm, local)
ro = pos + nrm * R.RAY_BIAS
info = tracer.with_info(scene, ro, rd, jnp.full((K,), 3.4e38))
hit_ok = info["instance"] >= 0
surf_b = dict(retrieve_surface(scene, info["material"], info["uv"], True))
surf_b["roughness"] = jnp.ones_like(surf_b["roughness"])
r4b = jnp.asarray(rng.random((K,4)), jnp.float32)
cand, cinfo = select_light_candidate(scene, tracer, r4b, info["position"][:, :3],
                                     info["normal"], info["instance"],
                                     jnp.float32(0.046), sample_emissive=True)
nee_ok = (dot3(cand["direction"], info["normal"]) > 0.0) & (cand["p"] > 0.0)
ro2 = info["position"][:, :3] + info["normal"] * R.RAY_BIAS
hit2 = tracer(scene, ro2, cand["direction"], cand["max_distance"],
              cand["emissive_instance"], None, cand["min_distance"])
cinfo = occlude_hit_info(ro2, cand["direction"], hit2, cinfo)
in_rad = input_radiance(scene, cand["direction"], cinfo["instance"], cinfo["material"],
                        cinfo["uv"], sample_directional=True,
                        sample_emissive=cand["emissive_instance"], sample_ambient=False,
                        solar_angle=jnp.float32(0.046), no_texture=True)
sample_dir = cand["emissive_instance"] < 0
in_rad = jnp.where(sample_dir[:,None] | (cinfo["instance"]==cand["emissive_instance"])[:,None],
                   in_rad, jnp.concatenate([jnp.zeros((K,3)), in_rad[:,3:4]],-1))
bounce_view = normalize(pos - info["position"][:, :3])
out_b = shading(scene, bounce_view, info["normal"], cand["direction"], surf_b, in_rad)
out_b = out_b / jnp.maximum(cand["p"][:,None], 1e-30)
srad = jnp.where((hit_ok & nee_ok)[:,None],
                 jnp.concatenate([out_b[:,:3], jnp.ones((K,1))],-1), 0.0)
# visible-surface shading
mat = jnp.full((K,), 6, jnp.int32)
surface = retrieve_surface(scene, mat, jnp.zeros((K,2)), True)
view_dir = normalize(jnp.asarray([0.,1.,4.])[None,:]-pos)
out_vis = shading(scene, view_dir, nrm, rd, surface, srad)
est = np.asarray(out_vis[:, :3]) / np.maximum(np.asarray(bpdf)[:,None], 1e-30)
print("MC 1-bounce indirect truth:", est.mean(0))
