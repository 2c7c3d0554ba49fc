"""On-device (JAX) augmentation: batched mosaic + affine + HSV + flips under jit.

The BASELINE.json north star moves "letterbox resize, normalization, and
mosaic/aug preprocessing" on-device. Host-side parity semantics live in
skyeye_tpu/data/augment.py (cv2); this module re-expresses them as one fused,
fixed-shape XLA program:

  * `mosaic_affine_batch` — the 4-image mosaic (reference augmentation.py:208-271)
    and the random affine warp (augmentation.py:88-181) FUSED into a single bilinear
    gather: for every output pixel the inverse affine maps into the virtual 2s x 2s
    mosaic canvas, the canvas coordinate selects one of 4 batch images + local
    coordinates, and one gather samples it. The canvas never materializes — saving
    4x the pixel bandwidth of the host pipeline.
  * labels ride along as fixed-shape (B, 4M, 6) arrays transformed by the same
    matrices, with the reference's candidate filter (w/h > 2px, ar < 20,
    area ratio > 0.1; augmentation.py:314-337) applied as a mask.
  * `hsv_jitter_batch` — HSV gain jitter (augmentation.py:48-86) via an RGB<->HSV
    conversion written in pure jnp (VPU elementwise; fuses with the normalize).
  * `flip_batch` — random horizontal/vertical flips via `jnp.where` on reversed
    tensors (no data movement until fused).

Everything is vmapped/batched, keyed by `jax.random` PRNG keys, and shape-stable, so
the whole augmentation pipeline jit-compiles once and runs on the accelerator while
host threads only decode JPEGs.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DEFAULT_HYP

PAD = 114.0


# -- HSV ----------------------------------------------------------------------


def rgb_to_hsv(rgb):
    """(..., 3) float [0,1] RGB -> HSV with h in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter_batch(images, key, hgain=0.015, sgain=0.7, vgain=0.4):
    """images (B, H, W, 3) float [0,1]; per-image random HSV gains."""
    B = images.shape[0]
    r = jax.random.uniform(key, (B, 3), minval=-1.0, maxval=1.0)
    gains = r * jnp.array([hgain, sgain, vgain]) + 1.0
    hsv = rgb_to_hsv(images)
    h = (hsv[..., 0] * gains[:, None, None, 0]) % 1.0
    s = jnp.clip(hsv[..., 1] * gains[:, None, None, 1], 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * gains[:, None, None, 2], 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


# -- mosaic + affine (fused) ---------------------------------------------------


def _inverse_affine(key, s: int, degrees, translate, scale, shear,
                    center=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random forward matrix M mapping canvas->output (reference composition
    T*S*R*C, augmentation.py:102-140 with perspective=0), returned INVERTED so
    output pixels map back into the canvas. `center` is the canvas half-extent
    used by the C matrix (s for the 2s x 2s mosaic canvas, s/2 for a single
    s x s image — the reference's non-mosaic random_perspective). Also returns
    the scale factor."""
    if center is None:
        center = float(s)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    a = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees) * math.pi / 180.0
    sc = jax.random.uniform(k2, (), minval=1.0 - scale, maxval=1.0 + scale)
    shx = jnp.tan(jax.random.uniform(k3, (), minval=-shear, maxval=shear) * math.pi / 180.0)
    shy = jnp.tan(jax.random.uniform(k4, (), minval=-shear, maxval=shear) * math.pi / 180.0)
    tx = jax.random.uniform(k5, (), minval=0.5 - translate, maxval=0.5 + translate) * s
    ty = jax.random.uniform(jax.random.fold_in(k5, 1), (),
                            minval=0.5 - translate, maxval=0.5 + translate) * s

    cos_a, sin_a = jnp.cos(a) * sc, jnp.sin(a) * sc
    # C: center the canvas at origin
    C = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    C = C.at[0, 2].set(-center).at[1, 2].set(-center)
    R = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    R = R.at[0, 0].set(cos_a).at[0, 1].set(-sin_a).at[1, 0].set(sin_a).at[1, 1].set(cos_a)
    S = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    S = S.at[0, 1].set(shx).at[1, 0].set(shy)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 2].set(tx).at[1, 2].set(ty)
    M = T @ S @ R @ C
    return jnp.linalg.inv(M), sc


def _bilinear_gather(img, ys, xs, valid):
    """img (H, W, 3); ys/xs (h, w) float sample coords; invalid -> PAD."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[..., None]
    y0, y1, x0, x1 = (v.astype(jnp.int32) for v in (y0, y1, x0, x1))
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 + wx * (v01 - v00)
    bot = v10 + wx * (v11 - v10)
    out = top + wy * (bot - top)
    return jnp.where(valid[..., None], out, PAD / 255.0)


def _mosaic_one(images4, targets4, mask4, key, hyp,
                gate=True) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused mosaic+affine for one output image.

    images4: (4, s, s, 3) float [0,1]; targets4: (4, M, 6) [_, cls, xywh-norm];
    mask4: (4, M). Returns (out (s, s, 3), targets (4M, 6), mask (4M,)).

    `gate` (traced bool scalar) selects per-image between the 4-image mosaic and
    the reference's NON-mosaic branch — the same random affine applied to the
    single letterboxed image (dataset.py __getitem__ else-branch /
    augmentation.py random_perspective with border=0): the canvas degenerates to
    the s x s frame of images4[0] (mosaic center pinned to (s, s) so quadrant 0
    covers it with local == canvas coords), the affine recenters at s/2, and
    slots 1-3 are masked out of both pixels and labels.
    """
    s = images4.shape[1]
    M_t = targets4.shape[1]
    kc, km = jax.random.split(key)
    gate = jnp.asarray(gate)

    # random mosaic center on the 2s canvas (reference border convention:
    # yc, xc ~ U[s/2, 3s/2], augmentation.py:208-271); pinned to s when the
    # per-image mosaic gate is off (single-image branch)
    cyx = jax.random.uniform(kc, (2,), minval=0.5 * s, maxval=1.5 * s)
    cyx = jnp.where(gate, cyx, float(s))
    yc, xc = cyx[0], cyx[1]

    Minv, sc = _inverse_affine(
        km, s, hyp["degrees"], hyp["translate"], hyp["scale"], hyp["shear"],
        center=jnp.where(gate, float(s), s / 2.0),
    )

    # output pixel grid -> canvas coords
    oy = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    ox = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    ones = jnp.ones_like(ox)
    canvas = jnp.einsum("ij,jhw->ihw", Minv, jnp.stack([ox, oy, ones]))
    cx, cy = canvas[0], canvas[1]

    # canvas coord -> (quadrant image, local coords); quadrant corners anchored at
    # the center: TL image's bottom-right lands on (yc, xc), etc.
    right = cx >= xc
    bottom = cy >= yc
    quad = bottom.astype(jnp.int32) * 2 + right.astype(jnp.int32)  # 0 TL,1 TR,2 BL,3 BR
    lx = jnp.where(right, cx - xc, cx - (xc - s))
    ly = jnp.where(bottom, cy - yc, cy - (yc - s))
    in_canvas = (cx >= xc - s) & (cx < xc + s) & (cy >= yc - s) & (cy < yc + s)
    in_img = (lx >= -0.5) & (lx <= s - 0.5) & (ly >= -0.5) & (ly <= s - 0.5)
    valid = in_canvas & in_img
    # single-image branch: only quadrant 0 (= images4[0]) exists; without this,
    # canvas coords past (s, s) would leak pixels from the other batch images
    valid = valid & (gate | (quad == 0))

    # gather from all 4 images, select by quadrant (4 gathers, VPU select)
    samples = jnp.stack(
        [_bilinear_gather(images4[q], ly, lx, valid) for q in range(4)], axis=0
    )
    out = jnp.take_along_axis(
        samples, quad[None, :, :, None].astype(jnp.int32), axis=0
    )[0]
    out = jnp.where(valid[..., None], out, PAD / 255.0)

    # ---- labels: normalized xywh -> canvas xyxy -> affine -> filter ----
    offs = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])  # (dx, dy) in s units
    origin_x = (xc - s) + offs[:, 0] * s  # (4,)
    origin_y = (yc - s) + offs[:, 1] * s
    t = targets4  # (4, M, 6)
    bx = t[..., 2] * s + origin_x[:, None]
    by = t[..., 3] * s + origin_y[:, None]
    bw = t[..., 4] * s
    bh = t[..., 5] * s
    x1, y1 = bx - bw / 2, by - bh / 2
    x2, y2 = bx + bw / 2, by + bh / 2

    # forward matrix = inv(Minv)
    Mfwd = jnp.linalg.inv(Minv)

    def tx_pts(px, py):
        v = jnp.stack([px, py, jnp.ones_like(px)], axis=-1) @ Mfwd.T
        return v[..., 0], v[..., 1]

    cxs, cys = [], []
    for px, py in [(x1, y1), (x2, y1), (x1, y2), (x2, y2)]:
        qx, qy = tx_pts(px, py)
        cxs.append(qx)
        cys.append(qy)
    cxs = jnp.stack(cxs, -1)
    cys = jnp.stack(cys, -1)
    nx1 = jnp.clip(cxs.min(-1), 0, s)
    ny1 = jnp.clip(cys.min(-1), 0, s)
    nx2 = jnp.clip(cxs.max(-1), 0, s)
    ny2 = jnp.clip(cys.max(-1), 0, s)
    nw, nh = nx2 - nx1, ny2 - ny1

    # candidate filter (reference box_candidates semantics)
    w_orig = bw * sc
    h_orig = bh * sc
    ar = jnp.maximum(nw / (nh + 1e-16), nh / (nw + 1e-16))
    keep = (
        mask4
        & (nw > 2.0)
        & (nh > 2.0)
        & (nw * nh / (w_orig * h_orig + 1e-16) > 0.10)
        & (ar < 20.0)
    )
    # single-image branch: only slot 0's labels are real
    keep = keep & (gate | (jnp.arange(4) == 0)[:, None])

    out_targets = jnp.stack(
        [
            jnp.zeros_like(nx1),
            t[..., 1],
            (nx1 + nx2) / 2 / s,
            (ny1 + ny2) / 2 / s,
            nw / s,
            nh / s,
        ],
        axis=-1,
    ).reshape(4 * M_t, 6)
    return out, out_targets, keep.reshape(4 * M_t)


def mosaic_affine_batch(images, targets, mask, key, hyp: Optional[Dict] = None,
                        mosaic_p: Optional[float] = None):
    """Batched fused mosaic+affine.

    images: (B, s, s, 3) float [0,1] (letterboxed); targets: (B, M, 6); mask: (B, M).
    Each output image mosaics inputs [i, i+1, i+2, i+3 mod B]. Per-image, mosaic
    engages with probability `mosaic_p` (default hyp["mosaic"], the reference's
    per-sample gate, dataset.py:357); otherwise that image gets the reference's
    single-image random affine instead — the affine NEVER silently drops.
    Returns (images (B, s, s, 3), targets (B, 4M, 6), mask (B, 4M)).
    """
    hyp = {**DEFAULT_HYP, **(hyp or {})}
    if mosaic_p is None:
        mosaic_p = float(hyp.get("mosaic", 1.0))
    B = images.shape[0]
    idx = (jnp.arange(B)[:, None] + jnp.arange(4)[None, :]) % B  # (B, 4)
    images4 = images[idx]    # (B, 4, s, s, 3)
    targets4 = targets[idx]  # (B, 4, M, 6)
    mask4 = mask[idx]
    kg, key = jax.random.split(key)
    gates = jax.random.uniform(kg, (B,)) < mosaic_p
    keys = jax.random.split(key, B)
    return jax.vmap(lambda im, t, m, k, g: _mosaic_one(im, t, m, k, hyp, gate=g))(
        images4, targets4, mask4, keys, gates
    )


# -- mixup ----------------------------------------------------------------------


def mixup_batch(images, targets, mask, key, p: float = 1.0):
    """On-device mixup (reference augmentation.py:273-290): blend each image with a
    batch-rolled partner using Beta(8, 8) weights; targets concatenate (M -> 2M)."""
    B = images.shape[0]
    k1, k2 = jax.random.split(key)
    lam = jax.random.beta(k1, 8.0, 8.0, (B,))
    do = jax.random.uniform(k2, (B,)) < p
    lam = jnp.where(do, lam, 1.0)

    partner = jnp.roll(images, B // 2 or 1, axis=0)
    blended = images * lam[:, None, None, None] + partner * (1.0 - lam[:, None, None, None])

    t2 = jnp.roll(targets, B // 2 or 1, axis=0)
    m2 = jnp.roll(mask, B // 2 or 1, axis=0) & do[:, None]
    out_t = jnp.concatenate([targets, t2], axis=1)
    out_m = jnp.concatenate([mask, m2], axis=1)
    return blended, out_t, out_m


# -- flips ---------------------------------------------------------------------


def flip_batch(images, targets, key, p_lr: float = 0.5, p_ud: float = 0.0):
    """Random per-image horizontal/vertical flips; targets are [_, cls, xywh-norm]."""
    B = images.shape[0]
    k1, k2 = jax.random.split(key)
    do_lr = jax.random.uniform(k1, (B,)) < p_lr
    do_ud = jax.random.uniform(k2, (B,)) < p_ud
    imgs = jnp.where(do_lr[:, None, None, None], images[:, :, ::-1], images)
    imgs = jnp.where(do_ud[:, None, None, None], imgs[:, ::-1], imgs)
    tx = jnp.where(do_lr[:, None], 1.0 - targets[..., 2], targets[..., 2])
    ty = jnp.where(do_ud[:, None], 1.0 - targets[..., 3], targets[..., 3])
    targets = targets.at[..., 2].set(tx).at[..., 3].set(ty)
    return imgs, targets


# -- full pipeline ---------------------------------------------------------------


def augment_batch_device(images, targets, mask, key, hyp: Optional[Dict] = None,
                         use_mosaic: bool = True):
    """Full on-device train-time augmentation (jit-safe, fixed shapes).

    images (B, s, s, 3) float [0,1]; targets (B, M, 6); mask (B, M).
    Returns (images, targets (B, M' ,6), mask (B, M')) where M' = 4M with mosaic.
    """
    hyp = {**DEFAULT_HYP, **(hyp or {})}
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # the fused stage ALWAYS runs: per-image it is either mosaic+affine (prob
    # hyp["mosaic"]) or the reference's single-image random affine — matching
    # the host pipeline, where disabling mosaic does not disable the affine
    # (dataset.py __getitem__ else-branch). use_mosaic=False forces p=0.
    images, targets, mask = mosaic_affine_batch(
        images, targets, mask, k1, hyp,
        mosaic_p=float(hyp.get("mosaic", 1.0)) if use_mosaic else 0.0,
    )
    if hyp.get("mixup", 0.0) > 0:
        images, targets, mask = mixup_batch(images, targets, mask, k4,
                                            p=hyp["mixup"])
    images = hsv_jitter_batch(images, k2, hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"])
    images, targets = flip_batch(images, targets, k3, hyp["fliplr"], hyp["flipud"])
    return images, targets, mask
