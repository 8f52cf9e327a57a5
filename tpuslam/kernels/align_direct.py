"""Semi-direct inter-frame pose alignment against the 3D line map.

The reference tracks EVERY frame through the full front-end (detect +
describe + match + pose LM — SURVEY §4.2 Track()). On this backend the
detector dominates the frame budget (~10 ms of the fused frame at half-res,
PERF_NOTES.md), yet between keyframes the front-end's only *output* that
matters is the pose. This module supplies that pose directly, PL-SVO /
moving-edges style, so full detection only has to run on every C-th
"anchor" frame (frontend/pipeline.py `_fused_chunk_semidirect`):

1. At the anchor frame (which ran the full detector + pose LM), sample a
   short perpendicular intensity profile — a photometric TEMPLATE — from the
   anchor image at S points along each local map line's projection under the
   anchor's accepted pose (`anchor_templates_body`).
2. At each following frame, project the same 3D sample points with the
   motion-model pose, slide the template along the image axis most
   perpendicular to the line (zero-mean SAD, integer argmin + quadratic
   subpixel), and take each best placement as a measured point ON the
   observed line (`align_frame_body`).
3. Gauss–Newton the 6-DoF pose over the standard point-to-projected-line
   residual (backend/residuals.py geometry: `m^T l / sqrt(l1^2+l2^2)` with
   `l = K_L (R n_w + [t]x R v_w)`), Huber-weighted, AD Jacobians.

Template matching (not gradient-peak picking) is load-bearing: the synthetic
wireframe strokes — and real images' bar-like structures — yield TWO
opposite-polarity edges ~2.6 px apart, BOTH of which the detector turns into
landmarks (measured: 155 twin pairs per frame at median 2.6 px). A
polarity-blind edge search locks the wrong twin under ~1 px of prediction
error; the anchor template encodes the local appearance (including polarity)
and disambiguates for free.

TPU shape discipline: everything is fixed-capacity (A lines x S samples),
and all image access follows the proven stereo_direct pattern — ONE flat
gather per stage over contiguous spans, sliding costs built from STATIC
slices, nothing data-dependent. Axis-aligned search (rows for steep lines,
columns for shallow ones) keeps the spans contiguous; quantizing the
*along-line* coordinate to integer pixels is free of bias because the target
is a line, not a point.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry.camera import Intrinsics, line_projection_matrix, project_points
from tpuslam.geometry.plucker import plucker_transform
from tpuslam.geometry.se3 import se3_apply, se3_inverse, se3_retract

_EPS = 1e-9


class DirectAlignParams(NamedTuple):
    n_samples: int = 6  # S sample points per landmark segment
    template: int = 8  # Wt template width (px along the search axis)
    search: int = 8  # max |shift| (px); the cost is evaluated at 2*search+1 placements
    gn_iters: int = 4  # Gauss-Newton iterations over the pose
    rounds: int = 2  # search+GN rounds: 2 is load-bearing — a motion-model
    # prediction a few px off leaves many templates outside their first
    # search window; re-searching from the refined pose recovers them
    # (measured: err 0.013 -> 0.003, aligned lines 26 -> 80)
    huber_px: float = 1.0  # Huber width on the point-to-line residual (full-res px)
    max_cost: float = 20.0  # mean ZSAD acceptance gate (0..255 intensity scale)
    min_contrast: float = 4.0  # template stddev gate (0..255 scale)
    ratio: float = 0.9  # best/second-best uniqueness gate on the cost
    max_res_px: float = 1.5  # per-sample inlier gate after GN (full-res px)
    min_line_samples: int = 3  # good samples for a line to count as aligned
    align_cap: int = 256  # A: static cap on local-map lines used
    min_z: float = 0.05
    # the image is at coord_scale x the coordinate frame of the landmark
    # geometry (prescaled half-res ingest): projections are multiplied by
    # this before sampling; measured points are divided back to full-res px.
    # template/search widths above are IMAGE px.
    coord_scale: float = 1.0
    # hybrid followers (SURVEY §3.1 MapPoint in the headline chunk mode):
    # P map points aligned alongside the lines — each point carries TWO
    # orthogonal 1-D templates (a row profile and a column profile through
    # its anchor projection), searched independently along x and y, giving
    # a full 2-DoF reprojection constraint with the same contiguous-gather
    # machinery as the line templates. 0 = lines only.
    point_cap: int = 256


class AlignTemplates(NamedTuple):
    """Per-(line, sample) photometric templates from the anchor frame."""

    p3d: jnp.ndarray  # (A, S, 3) world-frame sample points on the 3D segments
    tmpl: jnp.ndarray  # (A, S, Wt) f32 anchor intensity profile (0..255)
    vert: jnp.ndarray  # (A,) f32 {0,1}: 1 = search along y (line mostly horizontal)
    tvalid: jnp.ndarray  # (A, S) f32 sample validity


class PointAlignTemplates(NamedTuple):
    """Per-point photometric templates: TWO orthogonal 1-D profiles
    (a row profile searched along x, a column profile searched along y)
    through the anchor projection — together a full 2-DoF constraint."""

    p3d: jnp.ndarray  # (P, 3) world-frame map points
    tmpl: jnp.ndarray  # (P, 2, Wt) f32; [:, 0] = x-search row, [:, 1] = y-search col
    tvalid: jnp.ndarray  # (P, 2) f32 per-axis validity


def _axis_window(img255: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                 vert: jnp.ndarray, span: int, lo_off: int):
    """Intensity window along the per-line search axis, bilinear in the
    along-axis coordinate, nearest in the cross coordinate.

    Returns (win (..., span), inb (..., span)) where
    win[k] = I(axis_coord + lo_off + k + frac) for k in [0, span): i.e. the
    caller gets samples at CONTINUOUS axis positions ax + lo_off + k. ONE
    flat gather of span+1 integers per sample point, lerped by static slices.
    `vert` broadcasts against u/v (1 = axis is y, fixed column; 0 = axis is
    x, fixed row)."""
    H, W = img255.shape
    ax = jnp.where(vert > 0.5, v, u)  # fractional along-axis coordinate
    cr = jnp.where(vert > 0.5, u, v)  # cross coordinate (quantized: along-line)
    cri = jnp.round(cr).astype(jnp.int32)
    cr_ok = (cri >= 0) & (cri < jnp.where(vert > 0.5, W, H).astype(jnp.int32))
    cric = jnp.clip(cri, 0, jnp.where(vert > 0.5, W - 1, H - 1).astype(jnp.int32))
    af = jnp.floor(ax).astype(jnp.int32)
    frac = ax - af.astype(jnp.float32)
    k = jnp.arange(span + 1)
    pos = af[..., None] + (lo_off + k)  # (..., span+1) integer axis positions
    lim = jnp.where(vert > 0.5, H, W).astype(jnp.int32)[..., None]
    inb1 = (pos >= 0) & (pos < lim) & cr_ok[..., None]
    posc = jnp.clip(pos, 0, lim - 1)
    # flat index: vert -> pos*W + col ; horiz -> row*W + pos
    flat = jnp.where(
        vert[..., None] > 0.5,
        posc * W + cric[..., None],
        cric[..., None] * W + posc,
    )
    g = img255.reshape(-1)[flat]  # (..., span+1)
    win = (1.0 - frac[..., None]) * g[..., :span] + frac[..., None] * g[..., 1:]
    inb = inb1[..., :span] & inb1[..., 1:]
    return win, inb


def _sample_points(ep3d: jnp.ndarray, S: int) -> jnp.ndarray:
    """(A, 2, 3) world endpoints -> (A, S, 3) sample points along segments."""
    t = jnp.linspace(0.08, 0.92, S)
    e0, e1 = ep3d[:, 0], ep3d[:, 1]
    return e0[:, None, :] + t[None, :, None] * (e1 - e0)[:, None, :]


def anchor_templates_body(
    img: jnp.ndarray,
    T_anchor: jnp.ndarray,
    ep3d: jnp.ndarray,
    validf: jnp.ndarray,
    cam: Intrinsics,
    p: DirectAlignParams,
) -> AlignTemplates:
    """Photometric templates for the local map under the anchor's pose.

    img: (H, W) f32 in [0, 1] (the anchor's LEFT image, at coord_scale).
    T_anchor: (4, 4) accepted anchor pose T_cw. ep3d: (A, 2, 3) world
    endpoints of the local map lines (sliced to align_cap by the caller).
    """
    A, S, Wt = ep3d.shape[0], p.n_samples, p.template
    L = img * 255.0
    p3d = _sample_points(ep3d, S)  # (A, S, 3)
    Xc = se3_apply(T_anchor, p3d)
    zok = Xc[..., 2] > p.min_z
    uv = project_points(cam, Xc) * p.coord_scale  # (A, S, 2) image px
    # search axis from the projected segment direction at the anchor pose
    ep_c = se3_apply(T_anchor, ep3d)  # (A, 2, 3)
    ep_uv = project_points(cam, ep_c)
    d2 = ep_uv[:, 1] - ep_uv[:, 0]
    vert = (jnp.abs(d2[:, 0]) >= jnp.abs(d2[:, 1])).astype(jnp.float32)  # (A,)
    win, inb = _axis_window(
        L, uv[..., 0], uv[..., 1], vert[:, None], Wt, -(Wt // 2)
    )  # (A, S, Wt)
    contrast = jnp.std(win, axis=-1)
    seg_ok = jnp.sum(d2 * d2, axis=-1) > 1.0  # degenerate projection guard
    tvalid = (
        zok
        & jnp.all(inb, axis=-1)
        & (contrast > p.min_contrast)
        & (validf > 0.5)[:, None]
        & seg_ok[:, None]
        & jnp.all(ep_c[..., 2] > p.min_z, axis=-1)[:, None]
    ).astype(jnp.float32)
    return AlignTemplates(p3d=p3d, tmpl=win, vert=vert, tvalid=tvalid)


def _slide_zsad(win, inb, tmpl, Wt: int, M: int, ratio: float):
    """Sliding zero-mean SAD + subpixel argmin, generic over leading dims.

    win/inb: (..., M-1+Wt) axis windows; tmpl: (..., Wt). Returns
    (delta (...,) subpixel shift in [-R, R], cbest (...,), uniq (...,) bool,
    inb_ok (...,) bool). Static slices only."""
    cs = jnp.cumsum(win, axis=-1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    mwin = (cs[..., Wt:] - cs[..., :-Wt]) / float(Wt)  # (..., M)
    mt = jnp.mean(tmpl, axis=-1, keepdims=True)
    csb = jnp.cumsum(inb.astype(jnp.float32), axis=-1)
    csb = jnp.concatenate([jnp.zeros_like(csb[..., :1]), csb], axis=-1)
    okw = (csb[..., Wt:] - csb[..., :-Wt]) / float(Wt)  # 1.0 iff fully in-bounds
    cost = jnp.zeros_like(mwin)
    for w in range(Wt):
        cost = cost + jnp.abs(
            (win[..., w : w + M] - mwin) - (tmpl[..., w : w + 1] - mt)
        )
    cost = cost / float(Wt) + (1.0 - (okw > 0.999).astype(jnp.float32)) * 1e6

    best = jnp.argmin(cost, axis=-1)
    cbest = jnp.min(cost, axis=-1)
    jgrid = jnp.arange(M)
    shape = (1,) * (cost.ndim - 1) + (M,)
    near = (jnp.abs(jgrid.reshape(shape) - best[..., None]) <= 2).astype(jnp.float32)
    c2 = jnp.min(cost + near * 1e6, axis=-1)
    uniq = cbest < ratio * c2
    bm1 = jnp.clip(best - 1, 0, M - 1)
    bp1 = jnp.clip(best + 1, 0, M - 1)
    cm1 = jnp.take_along_axis(cost, bm1[..., None], -1)[..., 0]
    cp1 = jnp.take_along_axis(cost, bp1[..., None], -1)[..., 0]
    denom = jnp.maximum(cm1 - 2.0 * cbest + cp1, 1e-6)
    sub = jnp.clip(0.5 * (cm1 - cp1) / denom, -1.0, 1.0)
    R = (M - 1) // 2
    delta = best.astype(jnp.float32) - R + sub  # image px along the axis
    return delta, cbest, uniq


def _search_templates(
    img255: jnp.ndarray,
    T: jnp.ndarray,
    tm: AlignTemplates,
    cam: Intrinsics,
    p: DirectAlignParams,
):
    """Slide each template along its axis around the projection under T.

    Returns (m (A, S, 2) measured points in FULL-RES px, ok (A, S) f32)."""
    Wt, R = p.template, p.search
    M = 2 * R + 1
    Xc = se3_apply(T, tm.p3d)
    zok = Xc[..., 2] > p.min_z
    uv = project_points(cam, Xc) * p.coord_scale  # (A, S, 2) image px
    vert = tm.vert[:, None]
    span = M - 1 + Wt
    win, inb = _axis_window(
        img255, uv[..., 0], uv[..., 1], vert, span, -(R + Wt // 2)
    )  # (A, S, span): placements j cover shifts delta = j - R
    delta, cbest, uniq = _slide_zsad(win, inb, tm.tmpl, Wt, M, p.ratio)

    axis_vec = jnp.stack([1.0 - tm.vert, tm.vert], axis=-1)[:, None, :]  # (A,1,2)
    m = (uv + delta[..., None] * axis_vec) / p.coord_scale  # full-res px
    ok = (
        uniq
        & (cbest < p.max_cost)
        & zok
        & (tm.tvalid > 0.5)
        & (jnp.abs(delta) < float(R))  # reject rail-pinned placements
    ).astype(jnp.float32)
    return m, ok


def anchor_point_templates_body(
    img: jnp.ndarray,
    T_anchor: jnp.ndarray,
    xyz: jnp.ndarray,
    validf: jnp.ndarray,
    cam: Intrinsics,
    p: DirectAlignParams,
) -> PointAlignTemplates:
    """Two orthogonal 1-D templates per map point from the anchor image.

    img: (H, W) f32 in [0, 1]. xyz: (P, 3) world map points (sliced to
    point_cap by the caller). Per point: a row profile (searched along x)
    and a column profile (searched along y) — each axis gated on contrast
    independently, so a horizontal edge still constrains v even when u is
    unobservable (and vice versa); the GN only uses points with BOTH axes
    valid for a full 2-DoF residual."""
    P_, Wt = xyz.shape[0], p.template
    L = img * 255.0
    Xc = se3_apply(T_anchor, xyz)
    zok = Xc[:, 2] > p.min_z
    uv = project_points(cam, Xc) * p.coord_scale  # (P, 2) image px
    u2 = jnp.broadcast_to(uv[:, 0:1], (P_, 2))
    v2 = jnp.broadcast_to(uv[:, 1:2], (P_, 2))
    vert2 = jnp.broadcast_to(jnp.asarray([0.0, 1.0], jnp.float32), (P_, 2))
    win, inb = _axis_window(L, u2, v2, vert2, Wt, -(Wt // 2))  # (P, 2, Wt)
    contrast = jnp.std(win, axis=-1)
    tvalid = (
        zok[:, None]
        & jnp.all(inb, axis=-1)
        & (contrast > p.min_contrast)
        & (validf > 0.5)[:, None]
    ).astype(jnp.float32)
    return PointAlignTemplates(p3d=xyz, tmpl=win, tvalid=tvalid)


def _search_point_templates(
    img255: jnp.ndarray,
    T: jnp.ndarray,
    tm: PointAlignTemplates,
    cam: Intrinsics,
    p: DirectAlignParams,
):
    """Slide each point's two axis templates around the projection under T.

    Returns (m (P, 2) measured uv in FULL-RES px, ok (P,) f32 — both axes
    must pass their gates for the point to constrain the pose)."""
    Wt, R = p.template, p.search
    M = 2 * R + 1
    Xc = se3_apply(T, tm.p3d)
    zok = Xc[:, 2] > p.min_z
    uv = project_points(cam, Xc) * p.coord_scale  # (P, 2) image px
    P_ = uv.shape[0]
    u2 = jnp.broadcast_to(uv[:, 0:1], (P_, 2))
    v2 = jnp.broadcast_to(uv[:, 1:2], (P_, 2))
    vert2 = jnp.broadcast_to(jnp.asarray([0.0, 1.0], jnp.float32), (P_, 2))
    span = M - 1 + Wt
    win, inb = _axis_window(img255, u2, v2, vert2, span, -(R + Wt // 2))  # (P,2,span)
    delta, cbest, uniq = _slide_zsad(win, inb, tm.tmpl, Wt, M, p.ratio)  # (P, 2)
    m = (uv + delta) / p.coord_scale  # full-res px: u from axis 0, v from axis 1
    ok_axis = (
        uniq
        & (cbest < p.max_cost)
        & (tm.tvalid > 0.5)
        & (jnp.abs(delta) < float(R))
    )
    ok = (jnp.all(ok_axis, axis=-1) & zok).astype(jnp.float32)
    return m, ok


def _gn_pose(
    T0: jnp.ndarray,
    plucker: jnp.ndarray,
    m: jnp.ndarray,
    w_ok: jnp.ndarray,
    cam: Intrinsics,
    p: DirectAlignParams,
    pts3d: jnp.ndarray = None,
    m_p: jnp.ndarray = None,
    w_p: jnp.ndarray = None,
):
    """Gauss-Newton over the left-perturbation pose tangent, point-to-
    projected-line residuals (+ optional 2-DoF point reprojection residuals
    for the hybrid chunk mode), Huber IRLS. Returns
    (T, r_final (A, S), rp_final (P, 2) or None)."""
    KL = line_projection_matrix(cam)
    mh = jnp.concatenate([m, jnp.ones_like(m[..., :1])], axis=-1)  # (A, S, 3)
    hybrid = pts3d is not None

    def res_all(xi, T):
        Tx = se3_retract(T, xi)
        L_c = jax.vmap(lambda Lw: plucker_transform(Tx, Lw))(plucker)  # (A, 6)
        l = (KL @ L_c[:, :3, None])[..., 0]  # (A, 3)
        norm = jnp.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2 + _EPS)
        return jnp.einsum("asc,ac->as", mh, l) / norm[:, None]  # (A, S)

    def res_pts(xi, T):
        Tx = se3_retract(T, xi)
        Xc = se3_apply(Tx, pts3d)
        # clamp depth away from the camera plane: an outlier point swinging
        # behind the camera must not inject inf/NaN into the normal eqs
        # (its weight is ~0 but 0*inf = NaN)
        Xc = Xc.at[:, 2].set(jnp.maximum(Xc[:, 2], 1e-3))
        return project_points(cam, Xc) - m_p  # (P, 2) full-res px

    def gn_iter(T, _):
        z6 = jnp.zeros((6,), jnp.float32)
        r = res_all(z6, T)  # (A, S)
        J = jax.jacfwd(res_all)(z6, T)  # (A, S, 6)
        w = w_ok * jnp.minimum(1.0, p.huber_px / jnp.maximum(jnp.abs(r), _EPS))
        Jf = J.reshape(-1, 6)
        rf = r.reshape(-1)
        wf = w.reshape(-1)
        H = Jf.T @ (Jf * wf[:, None])
        b = Jf.T @ (wf * rf)
        if hybrid:
            rp = res_pts(z6, T)  # (P, 2)
            Jp = jax.jacfwd(res_pts)(z6, T)  # (P, 2, 6)
            wp = w_p[:, None] * jnp.minimum(
                1.0, p.huber_px / jnp.maximum(jnp.abs(rp), _EPS)
            )
            Jpf = Jp.reshape(-1, 6)
            rpf = rp.reshape(-1)
            wpf = wp.reshape(-1)
            H = H + Jpf.T @ (Jpf * wpf[:, None])
            b = b + Jpf.T @ (wpf * rpf)
        lam = 1e-4 * jnp.trace(H) / 6.0 + 1e-6
        xi = -jnp.linalg.solve(H + lam * jnp.eye(6, dtype=H.dtype), b)
        # guard: a degenerate system (too few constraints) must not launch
        # the pose; cap the step instead of branching
        nrm = jnp.sqrt(jnp.sum(xi * xi))
        xi = xi * jnp.minimum(1.0, 0.5 / jnp.maximum(nrm, 1e-9))
        return se3_retract(T, xi), None

    T, _ = jax.lax.scan(gn_iter, T0, None, length=p.gn_iters)
    z6 = jnp.zeros((6,), jnp.float32)
    r = res_all(z6, T)
    rp = res_pts(z6, T) if hybrid else None
    return T, r, rp


def align_frame_body(
    img: jnp.ndarray,
    T_pred: jnp.ndarray,
    plucker: jnp.ndarray,
    tm: AlignTemplates,
    cam: Intrinsics,
    p: DirectAlignParams,
):
    """One semi-direct frame: template search + Gauss-Newton pose refine.

    img: (H, W) f32 in [0, 1] (LEFT image at coord_scale). T_pred: (4, 4)
    motion-model prediction. plucker: (A, 6) world Plucker of the SAME local
    lines the templates were built from. Returns
    (T_new, n_samples_good (f32), n_lines_good (f32))."""
    img255 = img * 255.0
    T = T_pred
    for _ in range(max(1, p.rounds)):
        m, ok = _search_templates(img255, T, tm, cam, p)
        T, r, _ = _gn_pose(T, plucker, m, ok, cam, p)
    good = ok * (jnp.abs(r) < p.max_res_px).astype(jnp.float32)  # (A, S)
    line_good = (jnp.sum(good, axis=-1) >= float(p.min_line_samples)).astype(
        jnp.float32
    )
    return T, jnp.sum(good), jnp.sum(line_good)


def align_frame_hybrid_body(
    img: jnp.ndarray,
    T_pred: jnp.ndarray,
    plucker: jnp.ndarray,
    tm: AlignTemplates,
    tm_p: PointAlignTemplates,
    cam: Intrinsics,
    p: DirectAlignParams,
):
    """Hybrid semi-direct frame: line + point template search, ONE joint
    Gauss-Newton per round. Returns (T_new, n_samples_good, n_units_good)
    where a unit is an aligned line OR an aligned point — the acceptance
    analog of a tracked inlier landmark (SURVEY §3.1 MapPoint in the
    headline chunk mode)."""
    img255 = img * 255.0
    T = T_pred
    for _ in range(max(1, p.rounds)):
        m, ok = _search_templates(img255, T, tm, cam, p)
        m_p, ok_p = _search_point_templates(img255, T, tm_p, cam, p)
        T, r, rp = _gn_pose(
            T, plucker, m, ok, cam, p, pts3d=tm_p.p3d, m_p=m_p, w_p=ok_p
        )
    good_l = ok * (jnp.abs(r) < p.max_res_px).astype(jnp.float32)  # (A, S)
    line_good = (jnp.sum(good_l, axis=-1) >= float(p.min_line_samples)).astype(
        jnp.float32
    )
    good_p = ok_p * jnp.all(jnp.abs(rp) < p.max_res_px, axis=-1).astype(jnp.float32)
    n_samp = jnp.sum(good_l) + 2.0 * jnp.sum(good_p)
    n_units = jnp.sum(line_good) + jnp.sum(good_p)
    return T, n_samp, n_units


@partial(jax.jit, static_argnums=(4, 5))
def anchor_templates(img, T_anchor, ep3d, validf, cam: Intrinsics, p: DirectAlignParams):
    return anchor_templates_body(img, T_anchor, ep3d, validf, cam, p)


@partial(jax.jit, static_argnums=(4, 5))
def align_frame(img, T_pred, plucker, tm: AlignTemplates, cam: Intrinsics, p: DirectAlignParams):
    return align_frame_body(img, T_pred, plucker, tm, cam, p)


def inject_coord_scale_align(p: DirectAlignParams, base_scale: float, prescaled: bool):
    """Adapt align params to prescaled host ingest (see stereo_direct's
    inject_coord_scale): images arrive at base_scale, geometry stays
    full-res. No-op if the config already set an explicit coord_scale."""
    if prescaled and base_scale != 1.0 and p.coord_scale == 1.0:
        return p._replace(coord_scale=base_scale)
    return p
