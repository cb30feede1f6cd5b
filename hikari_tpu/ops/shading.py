"""Surface retrieval + PBR shading (light.wgsl:711-908).

Texture access: the reference indexes a Vulkan `binding_array` of textures
per pixel (light.wgsl:749-793). TPU equivalent: one packed atlas +
computed-rect bilinear gather with repeat addressing (mip-less
`textureSampleLevel(..., 0.0)` == plain bilinear, which keeps this exact).

All functions are batched over arbitrary leading dims [...].
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils.math import (
    dot3,
    env_brdf_approx,
    fd_burley,
    luminance,
    normalize,
    perceptual_roughness_to_roughness,
    reflect,
    saturate,
    specular_brdf,
)

U32_MAX_SENTINEL = -1  # our "no texture" / "no instance" id


def sample_atlas(scene, tex_id, uv):
    """Bilinear atlas sample with repeat addressing. tex_id [-1 = none] [...],
    uv [..., 2]. Returns [..., 4]; tex_id < 0 yields 1.0 (neutral multiplier)."""
    atlas = scene["atlas"]
    rect = scene["tex_rect"][jnp.maximum(tex_id, 0)]  # [..., 4] (x, y, w, h)
    x0 = rect[..., 0].astype(jnp.float32)
    y0 = rect[..., 1].astype(jnp.float32)
    tw = jnp.maximum(rect[..., 2].astype(jnp.float32), 1.0)
    th = jnp.maximum(rect[..., 3].astype(jnp.float32), 1.0)

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    fx = u * tw - 0.5
    fy = v * th - 0.5
    ix = jnp.floor(fx)
    iy = jnp.floor(fy)
    ax = (fx - ix)[..., None]
    ay = (fy - iy)[..., None]

    if "atlas_quad" in scene:
        # ONE row gather for the whole 2x2 footprint (quad atlas,
        # models/scene.py). ix/iy are in [-1, tw-1] and every texture has
        # a wrapped 1-texel border, so x0+ix indexes the same texel the
        # mod-addressed path reads — exact up to the quad's bf16 storage.
        p = scene["atlas_quad"][
            (y0 + iy).astype(jnp.int32), (x0 + ix).astype(jnp.int32)
        ].astype(jnp.float32)
        c00, c10 = p[..., 0:4], p[..., 4:8]
        c01, c11 = p[..., 8:12], p[..., 12:16]
    else:
        def fetch(px, py):
            # repeat within the texture rect
            pxm = jnp.mod(px, tw) + x0
            pym = jnp.mod(py, th) + y0
            return atlas[pym.astype(jnp.int32), pxm.astype(jnp.int32)]

        c00 = fetch(ix, iy)
        c10 = fetch(ix + 1, iy)
        c01 = fetch(ix, iy + 1)
        c11 = fetch(ix + 1, iy + 1)
    color = (
        c00 * (1 - ax) * (1 - ay)
        + c10 * ax * (1 - ay)
        + c01 * (1 - ax) * ay
        + c11 * ax * ay
    )
    return jnp.where((tex_id >= 0)[..., None], color, 1.0)


def retrieve_surface(scene, material_idx, uv, no_texture: bool,
                     coherent: bool = False):
    """Material table lookup + texture modulation (light.wgsl:729-781).

    Matches the reference channel conventions exactly: metallic *= tex.r,
    occlusion = tex.r, roughness comes from perceptual_roughness only.
    Returns dict {base_color[...,4], emissive[...,4], reflectance, metallic,
    roughness, occlusion}. material_idx < 0 (miss) returns material 0's
    values — callers mask. One packed lookup serves all fields
    (mat_packed: base 0:4, emissive 4:8, roughness 8, metallic 9,
    reflectance 10, texture ids 11:15).
    """
    from hikari_tpu.utils.math import table_gather

    m = jnp.maximum(material_idx, 0)
    row = table_gather(scene["mat_packed"], m)
    base_color = row[..., 0:4]
    emissive = row[..., 4:8]
    roughness = perceptual_roughness_to_roughness(row[..., 8])
    metallic = row[..., 9]
    reflectance = row[..., 10]
    occlusion = jnp.ones_like(metallic)

    if not no_texture:
        # screen-coherent [h, w] uv fields (primary surface) ride the
        # banded Pallas window sampler (ops/texture_pallas.py) — the XLA
        # gather costs ~18 ms per bilinear tap at 1080p; incoherent fields
        # (bounce hits, sampled emitters) keep the exact gather path
        sample = sample_atlas
        if coherent and uv.ndim == 3 and "atlas_panels" in scene:
            from hikari_tpu.ops.texture_pallas import sample_atlas_coherent

            def sample(sc, t, u):
                return sample_atlas_coherent(sc, t, u)
        tid = jnp.round(row[..., 11:15]).astype(jnp.int32)
        base_color = base_color * sample(scene, tid[..., 0], uv)
        emissive = emissive * sample(scene, tid[..., 1], uv)
        mrt = tid[..., 2]
        metallic = metallic * jnp.where(
            mrt >= 0, sample(scene, mrt, uv)[..., 0], 1.0)
        occ = tid[..., 3]
        occlusion = jnp.where(occ >= 0, sample(scene, occ, uv)[..., 0], 1.0)

    return {
        "base_color": base_color,
        "emissive": emissive,
        "reflectance": reflectance,
        "metallic": metallic,
        "roughness": roughness,
        "occlusion": occlusion,
    }


def retrieve_emissive(scene, material_idx, uv, no_texture: bool):
    from hikari_tpu.utils.math import table_gather

    m = jnp.maximum(material_idx, 0)
    row = table_gather(scene["mat_packed"], m)
    emissive = row[..., 4:8]
    if not no_texture:
        tid = jnp.round(row[..., 12]).astype(jnp.int32)
        emissive = emissive * sample_atlas(scene, tid, uv)
    return emissive


def compute_emissive_radiance(emissive):
    """light.wgsl:594-596: radiance = 255 * a * rgb."""
    return 255.0 * emissive[..., 3:4] * emissive[..., :3]


def calculate_view(view, world_position):
    """View vector (light.wgsl:714-727); orthographic not used by examples
    so the perspective branch is compiled (projection[3].w == 1 check is a
    scene-static property)."""
    return normalize(view["world_position"] - world_position[..., :3])


def lit(radiance, diffuse_color, roughness, f0, l, n, v):
    """Burley diffuse + GGX specular (light.wgsl:796-818)."""
    h = normalize(l + v)
    nol = saturate(dot3(n, l))
    noh = saturate(dot3(n, h))
    loh = saturate(dot3(l, h))
    nov = jnp.maximum(dot3(n, v), 0.0001)
    diffuse = diffuse_color * fd_burley(roughness, nov, nol, loh)[..., None]
    spec = specular_brdf(f0, roughness, nov, nol, noh, loh, 1.0)
    return (spec + diffuse) * radiance * nol[..., None]


def ambient(scene, diffuse_color, roughness, occlusion, f0, n, v):
    """Ambient env-BRDF term (light.wgsl:820-833)."""
    nov = jnp.maximum(dot3(n, v), 0.0001)
    diffuse_ambient = env_brdf_approx(diffuse_color, jnp.ones_like(nov), nov)
    specular_ambient = env_brdf_approx(f0, roughness, nov)
    return (
        occlusion[..., None]
        * (diffuse_ambient + specular_ambient)
        * scene["ambient_color"][:3]
    )


def _f0_diffuse(surface):
    base = surface["base_color"][..., :3]
    refl = surface["reflectance"][..., None]
    metal = surface["metallic"][..., None]
    f0 = 0.16 * refl * refl * (1.0 - metal) + base * metal
    diffuse_color = base * (1.0 - metal)
    return f0, diffuse_color


def shading(scene, v, n, l, surface, input_radiance):
    """Mix of lit and ambient by input alpha (light.wgsl:869-888)."""
    f0, diffuse_color = _f0_diffuse(surface)
    lit_radiance = lit(input_radiance[..., :3], diffuse_color,
                       surface["roughness"], f0, l, n, v)
    amb = ambient(scene, diffuse_color, surface["roughness"],
                  surface["occlusion"], f0, n, v)
    a = input_radiance[..., 3:4]
    return lit_radiance * a + amb * (1.0 - a)


def env_brdf(surface, v, n):
    """Full-reflectance approximation, used as 'albedo' for demodulation
    (light.wgsl:890-908)."""
    f0, diffuse_color = _f0_diffuse(surface)
    nov = jnp.maximum(dot3(n, v), 0.0001)
    diffuse_ambient = env_brdf_approx(diffuse_color, jnp.ones_like(nov), nov)
    specular_ambient = env_brdf_approx(f0, surface["roughness"], nov)
    return surface["occlusion"][..., None] * (diffuse_ambient + specular_ambient)


def input_radiance(scene, rd, hit_instance, hit_material, hit_uv,
                   sample_directional: bool, sample_emissive, sample_ambient: bool,
                   solar_angle, no_texture: bool):
    """Incoming radiance along a traced ray (light.wgsl:835-867).

    Returns [..., 4]: rgb + (1 - ambient_flag). sample_emissive is a
    per-element instance id; only hits ON that instance emit. The directional
    cone test uses solar_angle.
    """
    miss = hit_instance < 0
    cone_dir = scene["dir_to_light"]
    cos_solar = jnp.cos(solar_angle)
    hit_directional = dot3(rd, jnp.broadcast_to(cone_dir, rd.shape)) >= cos_solar

    take_dir = miss & hit_directional & sample_directional
    dir_rgb = scene["dir_color"][:3]
    amb_rgb = scene["ambient_color"][:3] if sample_ambient else jnp.zeros(3)

    emissive = retrieve_emissive(scene, hit_material, hit_uv, no_texture)
    em_rgb = compute_emissive_radiance(emissive)
    take_em = (~miss) & (hit_instance == sample_emissive)

    rgb = jnp.where(
        take_dir[..., None], dir_rgb,
        jnp.where(miss[..., None], jnp.broadcast_to(amb_rgb, rd.shape),
                  jnp.where(take_em[..., None], em_rgb, 0.0)),
    )
    ambient_flag = miss & ~take_dir
    a = 1.0 - ambient_flag.astype(jnp.float32)
    return jnp.concatenate([rgb, a[..., None]], axis=-1)
