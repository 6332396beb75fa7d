"""BVH-free brute-force tracer: the independent correctness anchor.

The golden images in ``tests/goldens`` catch regressions but were produced
by this renderer itself; this module provides an O(T·R) intersector with NO
shared acceleration-structure code (no LBVH, no wide rows, no stack), so a
full render through it checks the whole production pipeline — BVH build,
8-wide traversal, shading, NEE/MIS — against an implementation whose only
shared ingredient is the Möller–Trumbore formula itself.

Semantics match the production tracer (``ops/traverse_wide.py``, which in
turn matches the reference's ``ClosestHit``/``AnyHit``,
traceray_rq.glsl:108-185): closest-hit culls backfaces except double-sided
triangles; any-hit tests both faces and reports any accepted hit closer than
``t_max``. Opaque geometry only (the anchor scenes are opaque; stochastic
alpha would need traversal-order-identical RNG consumption to compare).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.traverse import INF, Hit

_EPS_DET = jnp.float32(1e-12)


def _intersect_all(geom, o, d, cull_backface: bool):
    """Möller–Trumbore of one ray against every triangle: (T,) planes."""
    idx = geom.indices
    p0 = geom.positions[idx[:, 0]]
    p1 = geom.positions[idx[:, 1]]
    p2 = geom.positions[idx[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = jnp.cross(d[None, :], e2)
    det = jnp.sum(e1 * pvec, axis=1)
    double_sided = (geom.tri_flags & 1) != 0
    if cull_backface:
        facing_ok = double_sided | (det > _EPS_DET)
    else:
        facing_ok = jnp.abs(det) > _EPS_DET
    det_ok = jnp.abs(det) > _EPS_DET
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    tvec = o[None, :] - p0
    uu = jnp.sum(tvec * pvec, axis=1) * inv_det
    qvec = jnp.cross(tvec, e1)
    vv = jnp.sum(d[None, :] * qvec, axis=1) * inv_det
    tt = jnp.sum(e2 * qvec, axis=1) * inv_det
    ok = (
        det_ok & facing_ok
        & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) & (tt > 0.0)
    )
    return ok, tt, uu, vv


class BruteTracer:
    """Drop-in ``tracer`` for :func:`integrator.path.trace_paths`.

    ``chunk`` bounds the (chunk, T) intermediate arrays so T·R never
    materializes at once (material-grid scenes are ~50k triangles).
    """

    def __init__(self, geom, chunk: int = 256):
        self.geom = geom
        self.chunk = chunk

    def _map_rays(self, fn, *ray_args):
        """lax.map ``fn`` over chunks of rays (pads to a chunk multiple)."""
        r = ray_args[0].shape[0]
        c = min(self.chunk, r)
        pad = (-r) % c
        padded = [
            jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            if pad else a
            for a in ray_args
        ]
        stacked = [a.reshape(-1, c, *a.shape[1:]) for a in padded]
        out = jax.lax.map(lambda args: fn(*args), tuple(stacked))
        return jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:])[:r], out)

    def closest(self, origin, direction, seed, active):
        def one_chunk(o, d):
            def one(oo, dd):
                ok, tt, uu, vv = _intersect_all(self.geom, oo, dd, True)
                tt = jnp.where(ok, tt, INF)
                best = jnp.argmin(tt)
                tri = jnp.where(tt[best] < INF, best, -1).astype(jnp.int32)
                return tt[best], tri, uu[best], vv[best]

            return jax.vmap(one)(o, d)

        t, tri, u, v = self._map_rays(one_chunk, origin, direction)
        if active is not None:
            tri = jnp.where(active, tri, -1)
            t = jnp.where(active, t, INF)
        return Hit(t=t, tri=tri, u=u, v=v, steps=jnp.zeros_like(tri)), seed

    def occluded(self, origin, direction, t_max, seed, active):
        def one_chunk(o, d, tm):
            def one(oo, dd, tmm):
                ok, tt, _, _ = _intersect_all(self.geom, oo, dd, False)
                return jnp.any(ok & (tt < tmm))

            return jax.vmap(one)(o, d, tm)

        occ = self._map_rays(one_chunk, origin, direction, t_max)
        if active is not None:
            occ = occ & active
        return occ, seed
