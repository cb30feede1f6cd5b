"""Frame pipeline: one jit-compiled function per (scene shape, settings, size).

The reference records PREPASS -> LIGHT -> POST_PROCESS -> OVERLAY each frame
into one command encoder (lib.rs:332-365). Here the same sequence is ONE
traced XLA program: `render_frame(scene, view, frame, noise, carry) ->
(image, carry)` with every pass a pure tensor op and all persistent state
(reservoirs, G-buffer history, post-process history) threaded through the
functional `carry` — zero host round-trips inside a frame.

Gather discipline (TPU): the G-buffer is resampled to render resolution
ONCE via strided slices; all three channels' temporal reprojection is ONE
combined packed row-gather; spatial reservoirs stay packed
[h,w,rsv.PACKED_WIDTH] (64 B/pixel) across the frame and receive at most a
couple of packed row-scatters.
"""

from __future__ import annotations

import math as _math
from typing import Tuple

import jax.numpy as jnp

from hikari_tpu.config import HikariSettings, Taa, UpscaleMode
from hikari_tpu.ops import reservoir as rsv
from hikari_tpu.ops import restir
from hikari_tpu.ops.noise import sample_blue_noise
from hikari_tpu.ops.prepass import prepass
from hikari_tpu.ops.tonemap import tone_mapping


def scaled_size(full_size: Tuple[int, int], ratio: float) -> Tuple[int, int]:
    """ceil(size / ratio) — post_process.rs:1172-1174."""
    h, w = full_size
    return (max(1, _math.ceil(h / ratio)), max(1, _math.ceil(w / ratio)))


def _post_size(settings: HikariSettings, render_size):
    if settings.upscale.mode == UpscaleMode.SMAA_TU4X:
        return (2 * render_size[0], 2 * render_size[1])
    return render_size


def spatial_fused_active(scene, settings: HikariSettings, tracer,
                         no_texture: bool, num_emissives: int,
                         has_sun: bool, full_size) -> bool:
    """Static gate for the FUSED spatial-ReSTIR path (ops/spatial_fused.py):
    requires the fused temporal mega-kernel (the spatial kernel consumes
    its channel-plane reservoir outputs), no checkerboard, no per-pixel tap
    scramble. When active the spatial carries live in the channel-plane
    [h,16,w] layout (banded-gatherable); otherwise the modular path keeps
    the packed [h,w,16] layout. Renderer and build_render_frame must agree
    — both call this ONE predicate."""
    from hikari_tpu.ops import light_fused as _lf
    from hikari_tpu.ops import spatial_fused as _sf

    track_de = settings.emissive_spatial_reuse
    track_ind = (settings.indirect_spatial_reuse
                 and settings.indirect_bounces > 0)
    if not (track_de or track_ind):
        return False
    if not settings.temporal_reuse:
        return False
    render_size = scaled_size(full_size, settings.upscale_ratio)
    ckb = settings.checkerboard_lighting and render_size[1] % 2 == 0
    if ckb or settings.spatial_tap_scramble:
        return False
    if not _sf.spatial_fused_eligible(
            scene, no_texture=no_texture,
            scramble=settings.spatial_tap_scramble):
        return False
    return _lf.fused_eligible(
        scene, no_texture=no_texture, num_emissives=num_emissives,
        temporal_reuse=True, track_de=False, track_ind=False,
        tracer_kind=getattr(tracer, "kind", ""), has_sun=has_sun,
        bounces=settings.indirect_bounces, ckb=False)


def init_carry(full_size, settings: HikariSettings,
               spatial_planes: bool = False):
    """Persistent frame state (the functional replacement for the
    reference's ping-pong buffers and history textures).

    spatial_planes=True stores the spatial-reuse carries in the
    channel-plane [h,16,w] layout for the fused spatial path (must match
    spatial_fused_active for the scene/settings this carry will drive)."""
    render_size = scaled_size(full_size, settings.upscale_ratio)
    h, w = full_size
    rh, rw = render_size
    zeros4 = lambda s: jnp.zeros(s + (4,), jnp.float32)
    # temporal carries use the channel-plane layout [h, 16, w] consumed by
    # the banded reprojection gather (ops/reproj_gather.py)
    planes = lambda: jnp.zeros((rh, rsv.PACKED_WIDTH, rw), jnp.float32)
    packed = planes if spatial_planes else (
        lambda: jnp.zeros((rh, rw, rsv.PACKED_WIDTH), jnp.float32))
    return {
        "frame_number": jnp.uint32(0),
        "direct_temporal": planes(),
        "emissive_temporal": planes(),
        "indirect_temporal": planes(),
        "spatial_de": packed(),
        "spatial_indirect": packed(),
        # previous G-buffer (prepass.rs:286-307 previous_* textures)
        "prev_gbuffer": {
            "position": zeros4((h, w)),
            "normal": jnp.zeros((h, w, 3), jnp.float32),
            "instance_material": jnp.zeros((h, w, 2), jnp.float32),
            "velocity_uv": zeros4((h, w)),
        },
        "prev_view_proj": jnp.eye(4, dtype=jnp.float32),
        "prev_inverse_view_proj": jnp.eye(4, dtype=jnp.float32),
        # post-process history (tone history feeds SMAA; TAA history is at
        # the post-SMAA working size — post_process.rs:716-745)
        "prev_tone": zeros4(render_size),
        "prev_taa": zeros4(_post_size(settings, render_size)),
        "prev_upscale": zeros4((h, w)),
    }


def _zero_packed_where(mask, packed):
    return jnp.where(mask[..., None], 0.0, packed)


def build_render_frame(settings: HikariSettings, full_size, tracer,
                       no_texture: bool, debug: bool = False,
                       num_emissives: int = 1, has_sun: bool = True):
    """Returns render_frame(scene, view, frame_uniform, noise, carry) ->
    (image [H,W,4], albedo [H,W,4], carry[, debug_dict]). Specialized on
    static settings (incl. scene-shape facts: emissive count, sun presence —
    the analog of the reference's pipeline-key specialization). debug=True
    additionally returns per-pass intermediates (the analog of the
    reference's assets/screenshots/dissection images)."""
    render_size = scaled_size(full_size, settings.upscale_ratio)
    taa = settings.taa
    upscale = settings.upscale
    ratio = settings.upscale_ratio
    track_de = settings.emissive_spatial_reuse
    track_ind = settings.indirect_spatial_reuse and settings.indirect_bounces > 0
    # channels that actually trace rays this configuration
    chan_active = (has_sun, num_emissives > 0, settings.indirect_bounces > 0)
    # checkerboard lighting needs an even render width (ops/checkerboard.py)
    ckb = settings.checkerboard_lighting and render_size[1] % 2 == 0
    scramble = settings.spatial_tap_scramble

    def render_frame(scene, view, frame, noise, carry):
        prev_view = {"view_proj": carry["prev_view_proj"],
                     "inverse_view_proj": carry["prev_inverse_view_proj"]}

        from hikari_tpu.ops import prepass_fused as _pf
        from hikari_tpu.parallel import shard as _sh

        mesh = _sh.active_mesh()
        g = albedo_r = smaa_quads = None
        if _pf.prepass_fused_eligible(scene, no_texture=no_texture,
                                      tracer_kind=getattr(tracer, "kind",
                                                          "")):
            # fused Pallas prepass: rays + trace + G-buffer assembly +
            # albedo in one kernel (ops/prepass_fused.py)
            from hikari_tpu.ops.prepass import frame_jitter

            jit = frame_jitter(frame["number"], taa, upscale.mode)
            exact_half = (ratio == 2.0
                          and full_size[0] == 2 * render_size[0]
                          and full_size[1] == 2 * render_size[1])
            if exact_half:
                # ratio-2 render-res G-buffer emitted directly by a second
                # decimated-coordinate pass (the XLA stride-2 decimation of
                # 19 full-res planes measured ~24 ms of relayouts at 1080p)
                gbuf, albedo, g, albedo_r = _pf.prepass_fused(
                    scene, view, prev_view, jit, full_size,
                    dec_size=render_size,
                    dec_parity=frame["number"] & 1, mesh=mesh)
                if upscale.mode == UpscaleMode.SMAA_TU4X:
                    smaa_quads = _pf.prepass_fused_quads(
                        scene, view, prev_view, jit, full_size, render_size,
                        mesh=mesh)
            else:
                gbuf, albedo = _pf.prepass_fused(scene, view, prev_view,
                                                 jit, full_size, mesh=mesh)
        else:
            gbuf = prepass(scene, tracer, view, prev_view, frame["number"],
                           full_size, taa, upscale.mode)
            # the full-res surface is shared with the render-res channels
            # below whenever the two domains coincide (ratio 1)
            surface_full = restir.primary_surface(scene, gbuf, no_texture)
            albedo = restir.full_screen_albedo(scene, gbuf, view, no_texture,
                                               surface=surface_full)

        if g is None:
            g = restir.resample_gbuffer(gbuf, render_size, frame["number"],
                                        ratio)
        valid = g["position"][..., 3] >= 1.1920929e-7
        rand = sample_blue_noise(noise, frame["number"], render_size)
        reproj = restir.reprojection(g, frame, render_size)

        # checkerboard lighting (ops/checkerboard.py): lighting channels run
        # on the compressed [h, w/2] active-pixel domain; reservoir carries
        # stay full-res so temporal/spatial ReSTIR sees every pixel
        if ckb:
            from hikari_tpu.ops import checkerboard as ckb_ops

            par = ckb_ops.frame_parity(frame["number"])
            amask = ckb_ops.active_mask(par, render_size)
            g_l = {k: ckb_ops.compress(v, par) for k, v in g.items()}
            rand_l = ckb_ops.compress(rand, par)
            reproj_l = restir.reprojection_ckb(g_l, frame, render_size, par)
            light_size = (render_size[0], render_size[1] // 2)
        else:
            g_l, rand_l, reproj_l = g, rand, reproj
            light_size = render_size

        def to_full_many(items):
            """Expand lighting-domain (render, variance) pairs to full
            render res in ONE reconstruction (the depth/normal neighbor
            gates are shared across channels — computing them per channel
            measured ~4.5 ms at 1080p)."""
            if not ckb:
                return items
            cat = jnp.concatenate(
                [jnp.concatenate([r, v[..., None]], -1) for r, v in items],
                axis=-1)
            bf = ckb_ops.reconstruct(ckb_ops.expand(cat, par), amask,
                                     g["position"][..., 3], g["normal"])
            return [(bf[..., 5 * i:5 * i + 4], bf[..., 5 * i + 4])
                    for i in range(len(items))]

        def to_full(render_c, var_c):
            return to_full_many([(render_c, var_c)])[0]

        def temporal_full_packed(r_l, carry_key):
            """This frame's temporal reservoirs as a full-res channel-plane
            tensor (active pixels new, inactive keep the carry's)."""
            p = rsv.pack_reservoir_planes(r_l)
            if not ckb:
                return p
            return ckb_ops.merge_packed_planes(p, carry[carry_key], par)

        # ONE combined reprojection gather for the channels that trace
        # (statically inactive channels — no sun / no emissives / 0 bounces —
        # are trimmed entirely). The banded Pallas gather (5.7 ms/frame)
        # replaces the XLA row-gather that lowered to 103 ms at 1080p;
        # under checkerboard it gathers at full render res and compresses
        # the unpacked fields (bit-identical to the compressed-domain
        # gather — same piy/pix per active pixel).
        carry_keys = ("direct_temporal", "emissive_temporal",
                      "indirect_temporal")
        prev_rs = [rsv.empty_reservoir(light_size) for _ in range(3)]
        gathered_chans = [c for c in range(3)
                          if chan_active[c] and settings.temporal_reuse]
        # the fused spatial path gathers its [h,16,w] spatial carries in
        # the SAME banded gather call as the temporal carries
        fused_sp = (not debug and spatial_fused_active(
            scene, settings, tracer, no_texture, num_emissives, has_sun,
            full_size))
        sp_sources = []
        if fused_sp:
            if track_de and num_emissives > 0:
                sp_sources.append("spatial_de")
            if track_ind and settings.indirect_bounces > 0:
                sp_sources.append("spatial_indirect")
        gathered_planes = {}
        sp_gathered = {}
        if gathered_chans or sp_sources:
            from hikari_tpu.ops.reproj_gather import reproj_gather

            # fold the strict-bounds rejection INTO the gather: a -1 source
            # coord makes the kernel return the empty (all-zero) reservoir,
            # which is exactly what where(in_strict, ., 0) produced — but as
            # one [h,w] i32 op instead of a [h,16,w] select per source
            piy_m = jnp.where(reproj["in_strict"], reproj["piy"], -1)
            outs = reproj_gather([carry[carry_keys[c]]
                                  for c in gathered_chans]
                                 + [carry[k] for k in sp_sources],
                                 piy_m, reproj["pix"], mesh=mesh)
            for j, c in enumerate(gathered_chans):
                p = outs[j]
                gathered_planes[c] = p
                r = rsv.unpack_reservoir_planes(p)
                # zero-reservoir pixels must read as "no visible instance"
                # (the packed empty reservoir decodes vinst = 0, which would
                # falsely match instance 0 in the temporal gates)
                r["visible_instance"] = jnp.where(
                    r["count"] > 0.0, r["visible_instance"], -1)
                if ckb:
                    r = {k: ckb_ops.compress(v, par) for k, v in r.items()}
                prev_rs[c] = r
            for j, k in enumerate(sp_sources):
                sp_gathered[k] = outs[len(gathered_chans) + j]

        # --- fused mega-kernel fast path: the whole no-reuse lighting
        # pipeline (all three channels: candidate select, probe, shadow,
        # bounce, shading) runs in ONE Pallas kernel (ops/light_fused.py).
        # Eligible for the small-scene brute-force class without textures;
        # the modular alternative compiles to ~170 separate [H,W] XLA
        # fusions that each round-trip HBM (round-2 profile).
        from hikari_tpu.ops import light_fused as _lf

        # with the fused spatial path active the track flags are handled
        # in-kernel (flags/scatter outputs + ops/spatial_fused.py), so they
        # do not disqualify the mega-kernel
        use_fused = (
            not debug
            and _lf.fused_eligible(
                scene, no_texture=no_texture, num_emissives=num_emissives,
                temporal_reuse=settings.temporal_reuse,
                track_de=track_de and not fused_sp,
                track_ind=track_ind and not fused_sp,
                tracer_kind=getattr(tracer, "kind", ""),
                has_sun=has_sun, bounces=settings.indirect_bounces,
                ckb=ckb))
        deferred = []
        spatial_de = carry["spatial_de"]
        spatial_ind = carry["spatial_indirect"]
        d_temporal_packed = carry["direct_temporal"]
        e_temporal_packed = carry["emissive_temporal"]
        i_temporal_packed = carry["indirect_temporal"]
        d_render = d_var = e_render = e_var = i_render = i_var = None
        rh2, rw2 = render_size
        if use_fused:
            reuse = settings.temporal_reuse
            prev_planes = ([gathered_planes[c] for c in range(3)
                            if chan_active[c]] if reuse else None)
            fl = _lf.fused_lighting(
                scene, g_l, view, frame, rand_l, has_sun=has_sun,
                num_emissives=num_emissives,
                bounces=settings.indirect_bounces, render_size=light_size,
                temporal=reuse, prev_planes=prev_planes,
                track_de=track_de and fused_sp,
                track_ind=track_ind and fused_sp)
            if reuse:
                if has_sun:
                    d_temporal_packed = fl["d_packed"]
                if num_emissives > 0:
                    e_temporal_packed = fl["e_packed"]
                if settings.indirect_bounces > 0:
                    i_temporal_packed = fl["i_packed"]
            zero_l = jnp.zeros(light_size)
            if has_sun:
                deferred.append(("d", fl["d_render"],
                                 fl["d_var"] if reuse else zero_l))
            else:
                # deterministic surface-emission term stays full-res
                # (emissive_surface_channel; see kernel docstring)
                d = restir.emissive_surface_channel(scene, g, no_texture,
                                                    render_size)
                d_render, d_var = d["render"], d["variance"]

            def apply_scatters(prev_p, slots):
                """Inline analog of the modular path's cross-pixel scatters
                into the spatial buffer (restir.py:267-271, 414-417): the
                scatter targets the same reprojected coords the gather just
                read, so scatter-then-gather collapses to a per-pixel
                replace (collisions resolve arbitrarily in both, the same
                benign race the reference's device writes have)."""
                empty_planes = rsv.pack_reservoir_planes(
                    rsv.empty_reservoir((1, 1)))        # [1,16,1] bcast
                in_loose = reproj["in_loose"]
                for slot in slots:
                    flags = fl[f"{slot}_flags"]
                    gate_m = (jnp.mod(flags, 2.0) >= 1.0) & in_loose
                    prev_p = jnp.where(gate_m[:, None, :], empty_planes,
                                       prev_p)
                    if f"{slot}_scatter" in fl:
                        val_m = (flags >= 2.0) & in_loose
                        prev_p = jnp.where(val_m[:, None, :],
                                           fl[f"{slot}_scatter"], prev_p)
                return prev_p

            sp_run = {}
            if "spatial_de" in sp_gathered:
                from hikari_tpu.ops import spatial_fused as _sf

                prev_de = apply_scatters(
                    sp_gathered["spatial_de"],
                    [s for s, on in (("d", has_sun), ("e", True)) if on])
                sp_run["e"] = _sf.spatial_fused(
                    scene, g, view, frame, fl["e_packed"], prev_de,
                    emissive_lit=True, render_size=render_size)
                spatial_de = sp_run["e"]["spatial_planes"]
            if "spatial_indirect" in sp_gathered:
                from hikari_tpu.ops import spatial_fused as _sf

                prev_ind = apply_scatters(
                    sp_gathered["spatial_indirect"], ["i"])
                sp_run["i"] = _sf.spatial_fused(
                    scene, g, view, frame, fl["i_packed"], prev_ind,
                    emissive_lit=False, render_size=render_size)
                spatial_ind = sp_run["i"]["spatial_planes"]

            if num_emissives > 0:
                if "e" in sp_run:
                    e_render = sp_run["e"]["render"]
                    e_var = jnp.where(jnp.isnan(sp_run["e"]["variance"]),
                                      fl["e_var"], sp_run["e"]["variance"])
                else:
                    deferred.append(("e", fl["e_render"],
                                     fl["e_var"] if reuse else zero_l))
            else:
                e_render = jnp.zeros((rh2, rw2, 4))
                e_var = jnp.zeros((rh2, rw2))
            if settings.indirect_bounces > 0:
                if "i" in sp_run:
                    i_render = sp_run["i"]["render"]
                    i_var = jnp.where(jnp.isnan(sp_run["i"]["variance"]),
                                      fl["i_var"], sp_run["i"]["variance"])
                else:
                    deferred.append(("i", fl["i_render"],
                                     fl["i_var"] if reuse else zero_l))
            else:
                i_render = jnp.zeros((rh2, rw2, 4))
                i_var = jnp.zeros((rh2, rw2))
        else:
            # --- direct channel (RENDER_EMISSIVE); when the scene has no sun the
            # solar NEE term is identically zero, so the shadow trace is skipped
            # statically and only the surface-emission add remains.
            # Channels whose output is not consumed by spatial reuse defer their
            # checkerboard reconstruction into one shared to_full_many flush.
            deferred = []
            spatial_de = carry["spatial_de"]
            d_temporal_packed = carry["direct_temporal"]
            d_render = d_var = None
            # ONE primary-surface retrieval per G-buffer domain, shared by
            # every channel (each textured retrieval is 16 atlas row
            # gathers; the reference reads the textures once per pixel in
            # its one kernel, light.wgsl:749-793)
            surf_l = restir.primary_surface(scene, g_l, no_texture)
            surf_r = surf_l if g_l is g else (
                restir.primary_surface(scene, g, no_texture)
                if ((not has_sun) or (track_de and num_emissives > 0)
                    or track_ind) else None)
            if has_sun:
                d = restir.direct_lit(
                    scene, tracer, g_l, view, frame, rand_l, reproj_l, prev_rs[0],
                    spatial_de if track_de else None,
                    emissive_lit=False, temporal_reuse=settings.temporal_reuse,
                    no_texture=no_texture, track_spatial=track_de,
                    render_size=light_size, surface=surf_l)
                if track_de:
                    spatial_de = d["prev_spatial_packed"]
                deferred.append(("d", d["render"], d["variance"]))
                if settings.temporal_reuse:
                    d_temporal_packed = temporal_full_packed(d["temporal"],
                                                             "direct_temporal")
            else:
                d = restir.emissive_surface_channel(scene, g, no_texture,
                                                    render_size,
                                                    surface=surf_r)
                d_render, d_var = d["render"], d["variance"]

            # --- emissive channel (EMISSIVE_LIT); statically skipped when the
            # scene has no emissive instances (nothing to sample)
            e_temporal_packed = carry["emissive_temporal"]
            if num_emissives > 0:
                e = restir.direct_lit(
                    scene, tracer, g_l, view, frame, rand_l, reproj_l, prev_rs[1],
                    spatial_de if track_de else None,
                    emissive_lit=True, temporal_reuse=settings.temporal_reuse,
                    no_texture=no_texture, track_spatial=track_de,
                    render_size=light_size, surface=surf_l)
                if track_de:
                    e_render, e_var = to_full(e["render"], e["variance"])
                else:
                    e_render = e_var = None
                    deferred.append(("e", e["render"], e["variance"]))
                if settings.temporal_reuse or (track_de and ckb):
                    e_temporal_packed = temporal_full_packed(e["temporal"],
                                                             "emissive_temporal")
            else:
                rh2, rw2 = render_size
                e = {"render": jnp.zeros((rh2, rw2, 4)),
                     "variance": jnp.zeros((rh2, rw2)),
                     "temporal": rsv.empty_reservoir(render_size),
                     "prev_spatial_packed": spatial_de if track_de else None,
                     "valid": valid}
                e_render, e_var = e["render"], e["variance"]
            if track_de and num_emissives > 0:
                spatial_de = e["prev_spatial_packed"]
                # spatial reuse runs at FULL render res: under checkerboard the
                # merged reservoir field (new actives + carried inactives) gives
                # every pixel a temporal reservoir to merge from
                e_temporal_for_spatial = (
                    rsv.unpack_reservoir_planes(e_temporal_packed)
                    if ckb else e["temporal"])
                sp = restir.spatial_reuse(
                    scene, g, view, frame, e_temporal_for_spatial, spatial_de,
                    reproj, emissive_lit=True, no_texture=no_texture,
                    render_size=render_size,
                    scramble_bits=(rand[..., 3] * 4.0).astype(jnp.int32) & 3
                    if scramble else None, surface=surf_r)
                spatial_de = rsv.pack_reservoir(sp["spatial"])
                e_render = sp["render"]
                e_var = jnp.where(jnp.isnan(sp["variance"]), e_var, sp["variance"])
                spatial_de = _zero_packed_where(~valid, spatial_de)

            # --- indirect channel
            spatial_ind = carry["spatial_indirect"]
            i_temporal_packed = carry["indirect_temporal"]
            i = restir.indirect_lit_ambient(
                scene, tracer, g_l, view, frame, rand_l, reproj_l, prev_rs[2],
                spatial_ind if track_ind else None,
                bounces=settings.indirect_bounces,
                temporal_reuse=settings.temporal_reuse,
                no_texture=no_texture, track_spatial=track_ind,
                render_size=light_size, surface=surf_l)
            if settings.indirect_bounces > 0:
                if track_ind:
                    i_render, i_var = to_full(i["render"], i["variance"])
                else:
                    i_render = i_var = None
                    deferred.append(("i", i["render"], i["variance"]))
                if settings.temporal_reuse or (track_ind and ckb):
                    i_temporal_packed = temporal_full_packed(i["temporal"],
                                                             "indirect_temporal")
            else:
                rh2, rw2 = render_size
                i_render = jnp.zeros((rh2, rw2, 4))
                i_var = jnp.zeros((rh2, rw2))
            if track_ind:
                spatial_ind = i["prev_spatial_packed"]
                i_temporal_for_spatial = (
                    rsv.unpack_reservoir_planes(i_temporal_packed)
                    if ckb else i["temporal"])
                sp = restir.spatial_reuse(
                    scene, g, view, frame, i_temporal_for_spatial, spatial_ind,
                    reproj, emissive_lit=False, no_texture=no_texture,
                    render_size=render_size,
                    scramble_bits=(rand[..., 2] * 4.0).astype(jnp.int32) & 3
                    if scramble else None, surface=surf_r)
                spatial_ind = rsv.pack_reservoir(sp["spatial"])
                i_render = sp["render"]
                i_var = jnp.where(jnp.isnan(sp["variance"]), i_var, sp["variance"])
                spatial_ind = _zero_packed_where(~valid, spatial_ind)

        # flush the shared checkerboard reconstruction for every deferred
        # channel (ONE pass of neighbor gates for all of them)
        if deferred:
            flushed = to_full_many([(r, v) for _, r, v in deferred])
            for (slot, _, _), (rf, vf) in zip(deferred, flushed):
                if slot == "d":
                    d_render, d_var = rf, vf
                elif slot == "e":
                    e_render, e_var = rf, vf
                else:
                    i_render, i_var = rf, vf

        # --- post process
        if settings.denoise:
            from hikari_tpu.ops.denoise import denoise_channels

            # firefly filtering: off for direct, on for emissive/indirect
            # (post_process.rs:773-784, 1192-1196). With no sun the direct
            # channel is a deterministic surface-emission term with zero
            # variance — denoising it is a no-op by construction, so skip.
            # All active channels denoise in ONE fused pass (shared
            # edge-stopping geometry weights — ops/denoise.py).
            dn_in, dn_slots = [], []
            if has_sun:
                dn_in.append((d_render, d_var, False))
                dn_slots.append("d")
            if num_emissives > 0:
                dn_in.append((e_render, e_var, True))
                dn_slots.append("e")
            if settings.indirect_bounces > 0:
                dn_in.append((i_render, i_var, True))
                dn_slots.append("i")
            if dn_in:
                dn_out = denoise_channels(g, albedo, dn_in, frame,
                                          render_size, ratio,
                                          albedo_r=albedo_r)
                for slot, out in zip(dn_slots, dn_out):
                    if slot == "d":
                        d_render = out
                    elif slot == "e":
                        e_render = out
                    else:
                        i_render = out

        tone = tone_mapping(d_render, e_render, i_render, frame["clear_color"])

        # --- TAA / upscaling chain
        from hikari_tpu.ops import post

        image, post_carry = post.post_chain(
            gbuf, carry, tone, frame, settings, full_size, render_size,
            smaa_quads=smaa_quads)

        new_carry = {
            "frame_number": frame["number"] + 1,
            "direct_temporal": d_temporal_packed
            if settings.temporal_reuse and has_sun
            else carry["direct_temporal"],
            "emissive_temporal": e_temporal_packed
            if settings.temporal_reuse and num_emissives > 0
            else carry["emissive_temporal"],
            "indirect_temporal": i_temporal_packed
            if settings.temporal_reuse and settings.indirect_bounces > 0
            else carry["indirect_temporal"],
            "spatial_de": spatial_de,
            "spatial_indirect": spatial_ind,
            "prev_gbuffer": {
                "position": gbuf["position"],
                "normal": gbuf["normal"],
                "instance_material": gbuf["instance_material"],
                "velocity_uv": gbuf["velocity_uv"],
            },
            "prev_view_proj": view["view_proj"],
            "prev_inverse_view_proj": view["inverse_view_proj"],
            **post_carry,
        }
        if debug:
            dbg = {
                "gbuffer_position": gbuf["position"],
                "gbuffer_normal": gbuf["normal"],
                "gbuffer_depth_gradient": gbuf["depth_gradient"],
                "gbuffer_velocity_uv": gbuf["velocity_uv"],
                "albedo": albedo,
                "direct_raw": d["render"],
                "emissive_raw": e["render"],
                "indirect_raw": i["render"],
                "direct_denoised": d_render,
                "emissive_denoised": e_render,
                "indirect_denoised": i_render,
                "direct_variance": d["variance"],
                "emissive_variance": e_var,
                "indirect_variance": i_var,
                "tone_mapping": tone,
            }
            return image, albedo, new_carry, dbg
        return image, albedo, new_carry

    return render_frame
