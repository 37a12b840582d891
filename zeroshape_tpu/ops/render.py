"""Device-side turntable mesh renderer: surface splatting with a z-buffer.

The reference dumps one turntable video per eval sample through pyrender
(reference ``model/shape_engine.py:579`` -> ``utils/util_vis.py:348-405``),
an OpenGL rasterizer on the host. Neither pyrender nor a GPU rasterizer
exists here, and the matplotlib stand-in software-rasterizes every triangle
per frame (~tens of seconds per 128^3 mesh), which is why final eval
historically rendered only every 10th sample. This module replaces that
bottleneck with a TPU-friendly formulation: the mesh surface is sampled
area-uniformly (inverse-CDF over face areas), every view's points are
rotated by one batched matmul, and hidden-surface removal is a single
``scatter-min`` over a packed (depth, shade) integer key -- all inside one
jitted program with static shapes (the face count is bucketed by the
caller). All views of a sample render in one device call; the host only
encodes the GIF.

Shading is two-sided Lambertian from per-face normals with a headlight
term, matching the flat-grey look of the matplotlib renderer it replaces.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

# packed z-buffer key layout: minimising the int32 key selects the nearest
# depth first, then (irrelevantly) the darkest shade. 22 depth bits over the
# normalized [-1.5, 1.5] camera-space range keep quantization (~1.4e-6 per
# step) far below visible z-fighting; 8 shade bits are the payload.
_DEPTH_BITS = 22
_SHADE_BITS = 8
_BG_KEY = np.int32((1 << (_DEPTH_BITS + _SHADE_BITS)) - 1)


def _orbit_rotations(n_views, elev_deg):
    """[n_views, 3, 3] world->camera rotations for an azimuth orbit at fixed
    elevation (matplotlib's ``view_init(elev, azim)`` convention: the camera
    orbits the z-up mesh; +azim turns the mesh clockwise seen from above)."""
    azim = jnp.linspace(0.0, 2.0 * jnp.pi, n_views, endpoint=False)
    el = jnp.float32(np.deg2rad(elev_deg))
    ca, sa = jnp.cos(azim), jnp.sin(azim)
    ce, se = jnp.cos(el), jnp.sin(el)
    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    # rotate about z by -azim, then tilt about x by elev; camera looks down -y
    rz = jnp.stack(
        [ca, sa, zero, -sa, ca, zero, zero, zero, one], axis=-1
    ).reshape(n_views, 3, 3)
    rx = jnp.asarray(
        [[1, 0, 0], [0, ce, se], [0, -se, ce]], jnp.float32
    )
    return jnp.einsum("ij,njk->nik", rx, rz)


def _sample_surface(tri, n_points, key):
    """Area-uniform surface points + their face normals ([N,3], [N,3]).

    Padded (degenerate, e.g. all-zero) triangles have zero area and zero
    probability of being drawn, so callers can bucket ``tri`` freely.
    """
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    cr = jnp.cross(e1, e2)
    area2 = jnp.linalg.norm(cr, axis=-1)  # 2x face area
    normals = cr / (area2[:, None] + 1e-12)
    cdf = jnp.cumsum(area2)
    total = cdf[-1]
    ku, kb = jax.random.split(key)
    # stratified inverse-CDF draw: uniform screen-space coverage matters more
    # for hole-free splats than i.i.d. sampling
    u = (jnp.arange(n_points, dtype=jnp.float32)
         + jax.random.uniform(ku, (n_points,))) / n_points
    fid = jnp.searchsorted(cdf, u * total)
    fid = jnp.clip(fid, 0, tri.shape[0] - 1)
    r = jax.random.uniform(kb, (n_points, 2))
    s = jnp.sqrt(r[:, :1])
    bary = jnp.concatenate([1.0 - s, s * (1.0 - r[:, 1:]), s * r[:, 1:]], axis=-1)
    pts = jnp.einsum("nk,nkc->nc", bary, tri[fid])
    return pts, normals[fid]


@functools.partial(
    jax.jit, static_argnames=("n_views", "image_size", "n_points", "elev_deg")
)
def render_turntable(
    tri, key, *, n_views=15, image_size=320, n_points=1 << 18,
    elev_deg=15.0,
):
    """Render ``n_views`` orbit frames of a mesh: [n_views, H, W, 3] uint8.

    ``tri`` is the gathered triangle soup [F, 3, 3] (``pad_mesh``), with
    coordinates pre-normalized by the caller (centered, max-abs 1 -- see
    ``vis.dump_meshes_viz``). F may be padded to any static bucket size
    (pad with degenerate all-zero triangles); the face count is the ONLY
    shape-static dimension, so jit recompiles are bounded by the number of
    power-of-two buckets, not (vertex, face) combinations -- each compile
    costs tens of seconds through the remote-compile tunnel.
    """
    H = W = image_size
    pts, nrm = _sample_surface(tri.astype(jnp.float32), n_points, key)
    rots = _orbit_rotations(n_views, elev_deg)  # [V, 3, 3]

    def one_view(R):
        p = pts @ R.T  # [N, 3] camera frame: x right, z up, y into screen
        n = nrm @ R.T
        # two-sided headlight + fixed key light from the upper-left front
        light = jnp.asarray([-0.4, -0.65, 0.65], jnp.float32)
        light = light / jnp.linalg.norm(light)
        lam = 0.55 * jnp.abs(n @ light) + 0.45 * jnp.abs(n[:, 1])
        shade = jnp.clip(0.25 + 0.75 * lam, 0.0, 1.0)
        sx = (p[:, 0] * 0.42 + 0.5) * W
        sy = (0.5 - p[:, 2] * 0.42) * H
        depth = p[:, 1]  # larger = farther
        ix = jnp.clip(sx.astype(jnp.int32), 0, W - 2)
        iy = jnp.clip(sy.astype(jnp.int32), 0, H - 2)
        zq = jnp.clip(
            ((depth + 1.5) / 3.0 * ((1 << _DEPTH_BITS) - 2)).astype(jnp.int32),
            0, (1 << _DEPTH_BITS) - 2,
        )
        sq = jnp.clip((shade * 255.0).astype(jnp.int32), 0, 255)
        enc = (zq << _SHADE_BITS) | sq
        buf = jnp.full((H * W,), _BG_KEY, jnp.int32)
        # 2x2 splat footprint closes sampling holes without a blur pass
        for dy in (0, 1):
            for dx in (0, 1):
                buf = buf.at[(iy + dy) * W + (ix + dx)].min(enc)
        hit = buf != _BG_KEY
        sh = (buf & ((1 << _SHADE_BITS) - 1)).astype(jnp.float32) / 255.0
        base = jnp.asarray([0.784, 0.784, 0.863], jnp.float32)  # #c8c8dc
        rgb = jnp.where(
            hit[:, None], sh[:, None] * base[None, :], jnp.ones((1, 3))
        )
        return (rgb * 255.0).astype(jnp.uint8).reshape(H, W, 3)

    return jax.vmap(one_view)(rots)


def pad_mesh(verts, faces, min_bucket=1 << 14):
    """Gather the triangle soup [F, 3, 3] and pad F to the next power-of-two
    bucket (>= ``min_bucket``) with degenerate all-zero triangles (zero area,
    zero sampling probability), so the renderer sees a handful of static
    shapes across a whole eval set."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64).reshape(-1, 3)
    tri = (verts[faces] if len(faces) else np.zeros((0, 3, 3), np.float32))
    F = max(len(tri), 1)
    Fp = max(min_bucket, 1 << (F - 1).bit_length())
    out = np.zeros((Fp, 3, 3), np.float32)
    out[: len(tri)] = tri
    return out
