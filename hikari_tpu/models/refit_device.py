"""On-device transform update + BVH refit for animated scenes.

The reference reacts to a transform change by rebuilding only the TLAS on
the CPU — O(#instances), BLASes untouched (instance.rs:352-371). Round 1's
world-space flattened BVH instead paid a host retransform + refit + a
~29 MB/frame re-upload (~115 ms at 96k tris). This module moves the whole
update onto the device as ONE jitted function, so an animated frame costs a
few device passes and zero host traffic:

  1. Local-space triangle/normal tables are precomputed once (host, f64).
  2. Per frame: per-row model matrices via a one-hot matmul on the MXU
     (exact: one-hot rows select a single matrix), vertex/normal transforms
     as elementwise VPU math.
  3. BVH node AABBs are refit with a sparse-table (binary-lifting) pyramid:
     node AABB = union of two power-of-2 windows over the leaf range
     (identical math to models/bvh.refit_bvh) — all slicing static, plus
     two static-index row-gathers packed [*, 6].
  4. Instance world AABBs come from transforming the static tight LOCAL
     AABB's 8 corners — the reference's own semantics (instance.rs:286-305)
     — which keeps the whole update segment-reduction-free.
  5. Cluster tables (tile-cull engine) and emissive-only probe tables are
     refreshed in-layout; alias tables are scale-invariant under rigid
     motion and reused (instance.rs:387-395's scale cache).

Limitation: with > SMALL_EMISSIVE_MAX emissives the emissive-BVH interior
AABBs are not refit on device (the unrolled walk never reads them for small
E); fall back to GpuScene.update_transforms for such scenes.
"""

from __future__ import annotations

import numpy as np


def _affine_inv(m: np.ndarray) -> np.ndarray:
    return np.linalg.inv(np.asarray(m, np.float64))


class DeviceRefitter:
    """Precomputes static local-space tables + the refit index plan from a
    compiled GpuScene. `update(models, prev_models)` is jit-compatible and
    returns the device-array overrides for the new transforms."""

    def __init__(self, gpu):
        a = gpu.arrays
        self.num_instances = gpu.num_instances
        self.num_triangles = gpu.num_triangles
        n = gpu.num_triangles

        model0 = a["inst_model"].reshape(-1, 4, 4)
        inv0 = np.stack([_affine_inv(m) for m in model0])  # [I,4,4] f64

        # ---- static local-space triangle tables (instance-grouped order)
        tp = np.asarray(a["tri_pos_flat"], np.float64)  # [Np, 10]
        inst = np.round(tp[:, 9]).astype(np.int64)
        valid = inst >= 0
        iid = np.clip(inst, 0, self.num_instances - 1)
        R = inv0[iid, :3, :3]
        t = inv0[iid, :3, 3]
        loc = tp[:, :9].reshape(-1, 3, 3) @ R.transpose(0, 2, 1) + t[:, None, :]
        loc = np.where(valid[:, None, None], loc, tp[:, :9].reshape(-1, 3, 3))
        self.tri_local = loc.reshape(-1, 9).astype(np.float32)  # [Np, 9]
        self.tri_inst = inst.astype(np.int32)
        self.tri_pos_tail = a["tri_pos_flat"][:, 9:].astype(np.float32)

        ta = np.asarray(a["tri_attr"], np.float64)  # [Np, 17]
        # n_world = (R^-1)^T n_local  =>  n_local = R^T n_world
        R0 = model0.astype(np.float64)[iid, :3, :3]
        nloc = ta[:, :9].reshape(-1, 3, 3) @ R0
        nloc = np.where(valid[:, None, None], nloc, ta[:, :9].reshape(-1, 3, 3))
        self.nrm_local = nloc.reshape(-1, 9).astype(np.float32)
        self.tri_attr_tail = a["tri_attr"][:, 9:].astype(np.float32)

        # ---- tight LOCAL per-instance AABBs (for 8-corner world AABBs)
        lmin = np.full((self.num_instances, 3), np.inf)
        lmax = np.full((self.num_instances, 3), -np.inf)
        offs = a["inst_prim_offset"]
        cnts = a["inst_prim_count"]
        for i in range(self.num_instances):
            sl = loc[offs[i]:offs[i] + cnts[i]].reshape(-1, 3)
            if len(sl):
                lmin[i] = sl.min(axis=0)
                lmax[i] = sl.max(axis=0)
        self.local_aabb_min = lmin.astype(np.float32)
        self.local_aabb_max = lmax.astype(np.float32)

        # ---- emissive statics
        self.num_emissives = gpu.num_emissives
        if gpu.num_emissives:
            em_inst = a["em_instance"]
            self._em_packed0 = np.asarray(a["em_packed"], np.float32)
            self.em_instance = em_inst.astype(np.int32)
            half_diag0 = 0.5 * np.linalg.norm(
                a["inst_aabb_max"][em_inst] - a["inst_aabb_min"][em_inst],
                axis=-1)
            self.em_extra = (a["em_radius"] - half_diag0).astype(np.float32)
            self.em_rows = np.nonzero(np.isin(
                np.round(a["tri_pos_flat"][:, 9]).astype(np.int64),
                em_inst[em_inst >= 0]))[0].astype(np.int32)
            self.em_pad_rows = len(a["em_tri_pos_flat"]) - len(self.em_rows)

        # ---- BVH refit plan (sparse-table windows, models/bvh.py:282)
        bvh = gpu.bvh
        self.leaf_perm = bvh.prim_order.astype(np.int32)  # [n]
        lengths = bvh.last - bvh.first + 1
        klev = np.floor(np.log2(lengths)).astype(np.int64)
        self.num_levels = int(klev.max()) + 1 if len(klev) else 1
        level_off = np.zeros(self.num_levels + 1, np.int64)
        for k in range(self.num_levels):
            level_off[k + 1] = level_off[k] + (n - (1 << k) + 1)
        f = bvh.first
        e = bvh.last - (1 << klev) + 1
        self.fidx = (level_off[klev] + f).astype(np.int32)  # [NN] into pyramid
        self.eidx = (level_off[klev] + e).astype(np.int32)
        self.bvh_tail = a["bvh_packed"][:, 6:].astype(np.float32)  # static

        # ---- cluster-table statics (tile-cull engine)
        self.has_clusters = "cl_tri_packed" in a
        if self.has_clusters:
            clp = np.asarray(a["cl_tri_packed"], np.float64).reshape(-1, 16)
            cinst = np.round(clp[:, 9]).astype(np.int64)
            cvalid = cinst >= 0
            cid = np.clip(cinst, 0, self.num_instances - 1)
            Rc = inv0[cid, :3, :3]
            tc = inv0[cid, :3, 3]
            cl_loc = (clp[:, :9].reshape(-1, 3, 3) @ Rc.transpose(0, 2, 1)
                      + tc[:, None, :])
            cl_loc = np.where(cvalid[:, None, None], cl_loc,
                              clp[:, :9].reshape(-1, 3, 3))
            self.cl_local = cl_loc.reshape(-1, 9).astype(np.float32)
            self.cl_inst = cinst.astype(np.int32)
            self.cl_tail = np.asarray(
                a["cl_tri_packed"], np.float32).reshape(-1, 16)[:, 9:].copy()
            self.cl_valid = cvalid
            cla = np.asarray(a["cl_attr_packed"], np.float64).reshape(-1, 16)
            Rc0 = model0.astype(np.float64)[cid, :3, :3]
            cl_nloc = cla[:, :9].reshape(-1, 3, 3) @ Rc0
            cl_nloc = np.where(cvalid[:, None, None], cl_nloc,
                               cla[:, :9].reshape(-1, 3, 3))
            self.cl_nrm_local = cl_nloc.reshape(-1, 9).astype(np.float32)
            self.cl_attr_tail = np.asarray(
                a["cl_attr_packed"], np.float32).reshape(-1, 16)[:, 9:].copy()
            self.cl_rows = a["cl_tri_packed"].shape[0]
            self.cl_aabb_pad = a["cl_aabb"].shape[0]
            self.cluster_size = 8 * (a["cl_tri_packed"].shape[0]
                                     // a["cl_aabb"].shape[0])

    # ------------------------------------------------------------------
    def update(self, models, prev_models):
        """models/prev_models: [I, 4, 4] f32 device arrays (current and
        previous frame world transforms, instance order). Returns the dict
        of updated scene device arrays (merge over as_pytree())."""
        import jax.numpy as jnp

        I = self.num_instances
        M = jnp.asarray(models).reshape(I, 16)
        # per-row matrices via one-hot MXU matmul (exact: rows select one)
        def rows_for(inst_ids, table):
            oh = (inst_ids[:, None] == jnp.arange(I, dtype=jnp.int32)
                  ).astype(jnp.float32)
            return jnp.dot(oh, table, precision="highest")

        def transform_tris(local9, inst_ids, mats16):
            v = local9.reshape(-1, 3, 3)
            R = mats16.reshape(-1, 4, 4)[:, :3, :3]
            t = mats16.reshape(-1, 4, 4)[:, :3, 3]
            out = jnp.einsum("nij,nvj->nvi", R, v,
                             precision="highest") + t[:, None, :]
            keep = (inst_ids < 0)[:, None, None]
            return jnp.where(keep, v, out).reshape(-1, 9)

        def transform_nrms(local9, inst_ids, inv16T):
            # n_world = (R^-1)^T n_local, renormalized
            v = local9.reshape(-1, 3, 3)
            Rt = inv16T.reshape(-1, 4, 4)[:, :3, :3]
            out = jnp.einsum("nji,nvj->nvi", Rt, v, precision="highest")
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-20)
            keep = (inst_ids < 0)[:, None, None]
            return jnp.where(keep, v, out).reshape(-1, 9)

        inv_models = jnp.linalg.inv(jnp.asarray(models, jnp.float32))
        invM = inv_models.reshape(I, 16)

        out = {}
        tri_inst = jnp.asarray(self.tri_inst)
        mats = rows_for(jnp.maximum(tri_inst, 0), M)
        invs = rows_for(jnp.maximum(tri_inst, 0), invM)
        world9 = transform_tris(jnp.asarray(self.tri_local), tri_inst, mats)
        nrm9 = transform_nrms(jnp.asarray(self.nrm_local), tri_inst, invs)
        out["tri_pos_flat"] = jnp.concatenate(
            [world9, jnp.asarray(self.tri_pos_tail)], axis=1)
        out["tri_pos"] = world9.reshape(-1, 3, 3)
        out["tri_attr"] = jnp.concatenate(
            [nrm9, jnp.asarray(self.tri_attr_tail)], axis=1)

        # ---- BVH refit (sparse-table pyramid; models/bvh.py:282 math)
        n = self.num_triangles
        v = world9[:n].reshape(-1, 3, 3)
        pmin = jnp.min(v, axis=1)
        pmax = jnp.max(v, axis=1)
        leaf = jnp.take(jnp.concatenate([pmin, pmax], axis=1),
                        jnp.asarray(self.leaf_perm), axis=0)  # [n, 6]
        levels = [leaf]
        cur_min, cur_max = leaf[:, :3], leaf[:, 3:]
        for k in range(1, self.num_levels):
            half = 1 << (k - 1)
            cur_min = jnp.minimum(cur_min[:-half], cur_min[half:])
            cur_max = jnp.maximum(cur_max[:-half], cur_max[half:])
            levels.append(jnp.concatenate([cur_min, cur_max], axis=1))
        pyramid = jnp.concatenate(levels, axis=0)
        fa = jnp.take(pyramid, jnp.asarray(self.fidx), axis=0)
        ea = jnp.take(pyramid, jnp.asarray(self.eidx), axis=0)
        node_min = jnp.minimum(fa[:, :3], ea[:, :3])
        node_max = jnp.maximum(fa[:, 3:], ea[:, 3:])
        out["bvh_packed"] = jnp.concatenate(
            [node_min, node_max, jnp.asarray(self.bvh_tail)], axis=1)

        # ---- instance tables
        out["inst_model"] = M
        prev = jnp.asarray(prev_models, jnp.float32)
        out["inst_motion"] = jnp.einsum(
            "nij,njk->nik", prev, inv_models,
            precision="highest").reshape(I, 16)
        corners = jnp.stack(jnp.meshgrid(
            jnp.arange(2.0), jnp.arange(2.0), jnp.arange(2.0),
            indexing="ij"), -1).reshape(8, 3)
        lmin = jnp.asarray(self.local_aabb_min)
        lmax = jnp.asarray(self.local_aabb_max)
        pts = lmin[:, None, :] + corners[None] * (lmax - lmin)[:, None, :]
        R = jnp.asarray(models, jnp.float32)[:, :3, :3]
        t = jnp.asarray(models, jnp.float32)[:, :3, 3]
        wpts = jnp.einsum("nij,ncj->nci", R, pts,
                          precision="highest") + t[:, None, :]
        out["inst_aabb_min"] = jnp.min(wpts, axis=1)
        out["inst_aabb_max"] = jnp.max(wpts, axis=1)

        # ---- emissive tables
        if self.num_emissives:
            em_i = jnp.asarray(self.em_instance)
            lo = jnp.take(out["inst_aabb_min"], em_i, axis=0)
            hi = jnp.take(out["inst_aabb_max"], em_i, axis=0)
            em_pos = 0.5 * (lo + hi)
            em_rad = (0.5 * jnp.linalg.norm(hi - lo, axis=-1)
                      + jnp.asarray(self.em_extra))
            out["em_position"] = em_pos
            out["em_radius"] = em_rad
            # em_packed cols: rgba 0:4, pos 4:7, radius 7, rest static
            emp = jnp.asarray(
                np.asarray(self._static_em_packed(), np.float32))
            emp = emp.at[:, 4:7].set(em_pos).at[:, 7].set(em_rad)
            out["em_packed"] = emp
            rows = jnp.asarray(self.em_rows)
            empos = jnp.take(out["tri_pos_flat"], rows, axis=0)
            ematt = jnp.take(out["tri_attr"], rows, axis=0)
            pad_pos = jnp.full((self.em_pad_rows, 10), 1e30).at[:, 9].set(-1.0)
            pad_att = jnp.zeros((self.em_pad_rows, 17)).at[:, 15].set(-1.0)
            out["em_tri_pos_flat"] = jnp.concatenate([empos, pad_pos], axis=0)
            out["em_tri_attr"] = jnp.concatenate([ematt, pad_att], axis=0)

        # ---- cluster tables (tile-cull engine)
        if self.has_clusters:
            cl_inst = jnp.asarray(self.cl_inst)
            clm = rows_for(jnp.maximum(cl_inst, 0), M)
            cli = rows_for(jnp.maximum(cl_inst, 0), invM)
            cw9 = transform_tris(jnp.asarray(self.cl_local), cl_inst, clm)
            cn9 = transform_nrms(jnp.asarray(self.cl_nrm_local), cl_inst, cli)
            cpos = jnp.concatenate([cw9, jnp.asarray(self.cl_tail)], axis=1)
            cattr = jnp.concatenate([cn9, jnp.asarray(self.cl_attr_tail)],
                                    axis=1)
            cs = self.cluster_size
            cpad = self.cl_aabb_pad
            vv = cw9.reshape(cpad, cs, 3, 3)
            cvalid = jnp.asarray(self.cl_valid).reshape(cpad, cs)
            big = jnp.where(cvalid[..., None, None], vv, jnp.inf)
            small = jnp.where(cvalid[..., None, None], vv, -jnp.inf)
            amin = jnp.min(big.reshape(cpad, cs * 3, 3), axis=1)
            amax = jnp.max(small.reshape(cpad, cs * 3, 3), axis=1)
            empty = ~jnp.any(cvalid, axis=1)
            amin = jnp.where(empty[:, None], 1e30, amin)
            amax = jnp.where(empty[:, None], -1e30, amax)
            aabb = jnp.zeros((cpad, 8)).at[:, 0:3].set(amin).at[:, 3:6].set(
                amax)
            out["cl_aabb"] = aabb
            # stash each cluster's AABB in its block's padding lanes
            blocks = cpos.reshape(cpad, cs * 16)
            blocks = blocks.at[:, 11:14].set(amin)
            blocks = blocks.at[:, 16 + 11:16 + 14].set(amax)
            out["cl_tri_packed"] = blocks.reshape(cpad * cs // 8, 128)
            out["cl_attr_packed"] = cattr.reshape(cpad * cs // 8, 128)

        return out

    def _static_em_packed(self):
        return self._em_packed0
