import numpy as np, sys
sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms','cpu')
from examples.cornell import build_scene
sc = build_scene()
gpu = sc.compile()
a = gpu.arrays
em_inst = int(a["em_instance"][0])
mask = np.round(a["tri_pos_flat"][:,9]).astype(int) == em_inst
tris = a["tri_pos_flat"][mask][:, :9].reshape(-1,3,3)
print("light tris:\n", tris)
print("light area:", a["em_surface_area"][0], "em pos:", a["em_position"][0])
# floor: find lowest y geometry
ys = a["tri_pos_flat"][:len(a["tri_pos_flat"])//1, 1::3]
print("scene y range:", a["tri_pos_flat"][:, [1,4,7]].min(), a["tri_pos_flat"][:, [1,4,7]].max())
# pick shading point on floor under light
light_c = a["em_position"][0]
p = np.array([light_c[0], a["tri_pos_flat"][:, [1,4,7]].min(), light_c[2]], np.float32)
print("floor point:", p)
# analytic irradiance from rect light (Monte Carlo over the 2 tris)
rng = np.random.default_rng(0)
N = 200000
# sample uniform over both triangles by area
areas = 0.5*np.linalg.norm(np.cross(tris[:,1]-tris[:,0], tris[:,2]-tris[:,0]),axis=-1)
pick = rng.random(N) < areas[0]/areas.sum()
b1 = rng.random(N); b2 = rng.random(N)
sw = b1+b2>1; b1[sw]=1-b1[sw]; b2[sw]=1-b2[sw]
t = np.where(pick[:,None,None], tris[0][None], tris[1][None])
x = t[:,0] + b1[:,None]*(t[:,1]-t[:,0]) + b2[:,None]*(t[:,2]-t[:,0])
d = x - p; dist2 = (d*d).sum(-1); dn = d/np.sqrt(dist2)[:,None]
# light normal: from tri 0
n_l = np.cross(tris[0,1]-tris[0,0], tris[0,2]-tris[0,0]); n_l/=np.linalg.norm(n_l)
cos_l = np.abs(dn @ n_l)
cos_s = dn[:,1]  # floor normal +y
L = 255.0  # white emissive radiance
E = (L * cos_s.clip(0) * cos_l / dist2).mean() * areas.sum()
print(f"analytic irradiance at floor point: {E:.3f}")
# floor material base color:
# find material of lowest tri
fl = np.argmin(a["tri_pos_flat"][:, 1])
m = int(a["tri_attr"][fl, 16])
bc = a["mat_packed"][m, 0:4]
print("floor material base:", bc, "metallic:", a["mat_packed"][m,9])
alb = bc[:3]*(1-a["mat_packed"][m,9])
rad = alb/np.pi * E
lum = 0.2126*rad[0]+0.7152*rad[1]+0.0722*rad[2]
print(f"analytic outgoing radiance: {rad}, lum={lum:.3f}, post-reinhard={lum/(1+lum):.3f}")
