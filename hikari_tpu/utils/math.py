"""Device math helpers (jnp, batched over trailing ... x3 / ... x4 axes).

Behavioral contract follows reference src/shaders/utils.wgsl and the Bevy PBR
lighting library used by light.wgsl (Fd_Burley, GGX specular, EnvBRDFApprox),
re-derived from their public equations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32_EPSILON = 1.1920929e-7
F32_MAX = 3.402823466e38
TAU = 6.283185307
INV_TAU = 0.159154943
PI = 3.14159265358979
GOLDEN_RATIO = 1.618033989

# Rec. 709 luminance coefficients (utils.wgsl:62-65).
_LUMA = jnp.array([0.2126, 0.7152, 0.0722], dtype=jnp.float32)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance over the trailing rgb axis."""
    return jnp.einsum("...c,c->...", rgb[..., :3], _LUMA)


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps=1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(dot3(v, v), eps))[..., None]


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def cross(a, b):
    return jnp.cross(a, b)


def reflect(i, n):
    return i - 2.0 * dot3(i, n)[..., None] * n


def pcg_hash(value: jnp.ndarray) -> jnp.ndarray:
    """Integer hash (utils.wgsl:15-25) on uint32 arrays."""
    state = value.astype(jnp.uint32)
    state = state ^ jnp.uint32(2747636419)
    state = state * jnp.uint32(2654435769)
    state = state ^ (state >> 16)
    state = state * jnp.uint32(2654435769)
    state = state ^ (state >> 16)
    state = state * jnp.uint32(2654435769)
    return state


def random_float(value: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> [0,1] float (utils.wgsl:27-29)."""
    return pcg_hash(value).astype(jnp.float32) / 4294967295.0


def clip_to_uv(clip: jnp.ndarray) -> jnp.ndarray:
    """Clip-space position -> texture uv, y flipped (utils.wgsl:31-36)."""
    uv = clip[..., :2] / clip[..., 3:4]
    uv = (uv + 1.0) * 0.5
    return uv.at[..., 1].set(1.0 - uv[..., 1])


def coords_to_uv(coords: jnp.ndarray, size) -> jnp.ndarray:
    """Pixel coords -> texel-center uv (utils.wgsl:38-40). size = (w, h)."""
    return (coords.astype(jnp.float32) + 0.5) / jnp.asarray(size, dtype=jnp.float32)


def apply_normal_basis(n: jnp.ndarray, local: jnp.ndarray) -> jnp.ndarray:
    """Rotate `local` (z-up) into the basis around n — the branchless ONB of
    utils.wgsl:42-50 applied WITHOUT materializing per-pixel 3x3 matrices
    (batched tiny matmuls are MXU-hostile; this is pure VPU math)."""
    s = jnp.minimum(jnp.sign(n[..., 2]) * 2.0 + 1.0, 1.0)
    u = -1.0 / (s + n[..., 2])
    v = n[..., 0] * n[..., 1] * u
    tx = 1.0 + s * n[..., 0] * n[..., 0] * u
    ty = s * v
    tz = -s * n[..., 0]
    bx = v
    by = s + n[..., 1] * n[..., 1] * u
    bz = -n[..., 1]
    lx = local[..., 0]
    ly = local[..., 1]
    lz = local[..., 2]
    return jnp.stack([
        tx * lx + bx * ly + n[..., 0] * lz,
        ty * lx + by * ly + n[..., 1] * lz,
        tz * lx + bz * ly + n[..., 2] * lz,
    ], axis=-1)


def normal_basis(n: jnp.ndarray) -> jnp.ndarray:
    """Branchless orthonormal basis around n (utils.wgsl:42-50).

    Returns [..., 3, 3] with COLUMNS (t, b, n) — matches WGSL mat3x3(t, b, n)
    (column-major constructor), so `basis @ v` maps local z to n.
    """
    s = jnp.minimum(jnp.sign(n[..., 2]) * 2.0 + 1.0, 1.0)
    u = -1.0 / (s + n[..., 2])
    v = n[..., 0] * n[..., 1] * u
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * u, s * v, -s * n[..., 0]], axis=-1
    )
    b = jnp.stack([v, s + n[..., 1] * n[..., 1] * u, -n[..., 1]], axis=-1)
    return jnp.stack([t, b, n], axis=-1)


def rgb_to_ycocg(rgb: jnp.ndarray) -> jnp.ndarray:
    """Playdead TAA color space (taa.wgsl:20-26)."""
    y = rgb[..., 0] / 4.0 + rgb[..., 1] / 2.0 + rgb[..., 2] / 4.0
    co = rgb[..., 0] / 2.0 - rgb[..., 2] / 2.0
    cg = -rgb[..., 0] / 4.0 + rgb[..., 1] / 2.0 - rgb[..., 2] / 4.0
    return jnp.stack([y, co, cg], axis=-1)


def ycocg_to_rgb(ycocg: jnp.ndarray) -> jnp.ndarray:
    r = ycocg[..., 0] + ycocg[..., 1] - ycocg[..., 2]
    g = ycocg[..., 0] + ycocg[..., 2]
    b = ycocg[..., 0] - ycocg[..., 1] - ycocg[..., 2]
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def clip_towards_aabb_center(prev_color, curr_color, aabb_min, aabb_max):
    """Variance clipping (taa.wgsl:37-45)."""
    p_clip = 0.5 * (aabb_max + aabb_min)
    e_clip = 0.5 * (aabb_max - aabb_min)
    v_clip = prev_color - p_clip
    v_unit = v_clip / jnp.where(e_clip == 0.0, 1e-20, e_clip)
    ma_unit = jnp.max(jnp.abs(v_unit), axis=-1, keepdims=True)
    clipped = p_clip + v_clip / jnp.maximum(ma_unit, 1e-20)
    return jnp.where(ma_unit > 1.0, clipped, prev_color)


def change_luminance(c_in, l_out):
    l_in = jnp.maximum(luminance(c_in), 1e-8)
    return c_in * (l_out / l_in)[..., None]


def reinhard_luminance(color: jnp.ndarray) -> jnp.ndarray:
    """Bevy's luminance-based Reinhard tone map."""
    l_old = luminance(color)
    l_new = l_old / (1.0 + l_old)
    return change_luminance(color, l_new)


def inverse_reinhard_luminance(color: jnp.ndarray) -> jnp.ndarray:
    """Inverse (overlay.wgsl:28-33): remap so downstream tonemapping re-maps."""
    l_old = jnp.clip(luminance(color), 0.0005, 0.995)
    l_new = l_old / (1.0 - l_old)
    return change_luminance(color, l_new)


def is_finite_color(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(jnp.isfinite(c), axis=-1)


# ---------------------------------------------------------------------------
# Bevy PBR BRDF library (re-derivation of the standard Filament equations the
# reference imports via `bevy_pbr::lighting`; consumed by light.wgsl:796-908).
# ---------------------------------------------------------------------------


def perceptual_roughness_to_roughness(perceptual: jnp.ndarray) -> jnp.ndarray:
    clamped = jnp.clip(perceptual, 0.089, 1.0)
    return clamped * clamped


def _pow5(x):
    # explicit multiply chain: jnp.power(x, 5.0) lowers to exp(5*log(x)) —
    # two transcendentals per lane, ~40x the cost of three multiplies on the
    # VPU (measured: the Schlick pows dominated the whole shading stage)
    x2 = x * x
    return x2 * x2 * x


def f_schlick_scalar(f0, f90, voh):
    return f0 + (f90 - f0) * _pow5(1.0 - voh)


def f_schlick_vec(f0, f90, voh):
    return f0 + (f90[..., None] - f0) * _pow5(1.0 - voh)[..., None]


def fd_burley(roughness, nov, nol, loh):
    f90 = 0.5 + 2.0 * roughness * loh * loh
    light_scatter = f_schlick_scalar(1.0, f90, nol)
    view_scatter = f_schlick_scalar(1.0, f90, nov)
    return light_scatter * view_scatter * (1.0 / PI)


def d_ggx(roughness, noh):
    one_minus = 1.0 - noh * noh
    a = noh * roughness
    k = roughness / (one_minus + a * a)
    return k * k * (1.0 / PI)


def v_smith_ggx_correlated(roughness, nov, nol):
    a2 = roughness * roughness
    lambda_v = nol * jnp.sqrt((nov - a2 * nov) * nov + a2)
    lambda_l = nov * jnp.sqrt((nol - a2 * nol) * nol + a2)
    return 0.5 / jnp.maximum(lambda_v + lambda_l, 1e-7)


def fresnel(f0, loh):
    f90 = saturate(dot3(f0, jnp.full_like(f0, 50.0 * 0.33)))
    return f_schlick_vec(f0, f90, loh)


def specular_brdf(f0, roughness, nov, nol, noh, loh, specular_intensity=1.0):
    d = d_ggx(roughness, noh)
    v = v_smith_ggx_correlated(roughness, nov, nol)
    f = fresnel(f0, loh)
    return (specular_intensity * d * v)[..., None] * f


def env_brdf_approx(f0, perceptual_roughness, nov):
    """Karis mobile EnvBRDF approximation (Bevy's EnvBRDFApprox)."""
    c0 = jnp.array([-1.0, -0.0275, -0.572, 0.022], dtype=jnp.float32)
    c1 = jnp.array([1.0, 0.0425, 1.04, -0.04], dtype=jnp.float32)
    r = perceptual_roughness[..., None] * c0 + c1
    a004 = (
        jnp.minimum(r[..., 0] * r[..., 0], jnp.exp2(-9.28 * nov)) * r[..., 0]
        + r[..., 1]
    )
    ab_x = -1.04 * a004 + r[..., 2]
    ab_y = 1.04 * a004 + r[..., 3]
    return f0 * ab_x[..., None] + ab_y[..., None]


# ---------------------------------------------------------------------------
# Low-discrepancy sampling (light.wgsl:537-565).
# ---------------------------------------------------------------------------


def sample_uniform_disk(rand2):
    r = jnp.sqrt(rand2[..., 0])
    theta = TAU * rand2[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_cosine_hemisphere(rand2):
    """Returns ([..., 3] direction in +z hemisphere, [...] pdf)."""
    t = sample_uniform_disk(rand2)
    z = jnp.sqrt(jnp.maximum(1.0 - dot3(t, t), 0.0))
    direction = jnp.concatenate([t, z[..., None]], axis=-1)
    pdf = 2.0 * INV_TAU * z
    return direction, pdf


def sample_uniform_cone(rand2, cos_angle):
    """Cone sample around +z with half-apex angle acos(cos_angle); returns (dir, pdf)."""
    z = 1.0 - (1.0 - cos_angle) * rand2[..., 0]
    theta = TAU * rand2[..., 1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    direction = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)
    pdf = INV_TAU / jnp.maximum(1.0 - cos_angle, 1e-7)
    return direction, pdf


def sample_uniform_triangle_barycentric(rand2):
    srx = jnp.sqrt(rand2[..., 0])
    return jnp.stack([1.0 - srx, rand2[..., 1] * srx], axis=-1)


SMALL_TABLE_MAX = 64


def table_gather(table, idx, small_max: int = SMALL_TABLE_MAX):
    """Per-element lookup `table[idx]` that is fast on TPU.

    XLA's gather costs ~24-40ns per gathered row regardless of table size
    (measured) — ruinous for per-pixel material/instance/triangle lookups.
    Small tables use an unrolled select-sweep (fuses into one VPU kernel, no
    per-row gather); larger tables fall back to the row-gather, which
    callers should amortize by packing fields into wide rows.

    table: [T, ...] array. idx: any int shape. Returns
    idx.shape + table.shape[1:].
    """
    t = table.shape[0]
    if t > small_max:
        return table[jnp.clip(idx, 0, t - 1)]
    out = jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    if t == 1:
        return out
    sel_shape = idx.shape + (1,) * (table.ndim - 1)
    for k in range(1, t):
        out = jnp.where((idx == k).reshape(sel_shape), table[k], out)
    return out


def transform_point(mat4, p):
    """mat4 [...,4,4] @ point [...,3] with w-divide."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...j->...i", mat4, ph)
    return out[..., :3] / out[..., 3:4]


def transform_direction(mat4, d):
    return jnp.einsum("...ij,...j->...i", mat4[..., :3, :3], d)
