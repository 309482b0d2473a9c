"""Chroma post-processing: sharpening, normalization, temporal smoothing.

Mirrors reference ``chroma/normalization.rs`` and ``chroma/smoothing.rs``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import masked

EPSILON = 1e-10


def l2_normalize_chroma(chroma: jax.Array) -> jax.Array:
    """Unit-L2 per frame; tiny-norm frames become uniform
    (normalization.rs:78-92)."""
    norm = jnp.sqrt(jnp.sum(chroma * chroma, axis=-1, keepdims=True))
    uniform = 1.0 / jnp.sqrt(jnp.float32(chroma.shape[-1]))
    return jnp.where(norm > EPSILON, chroma / jnp.maximum(norm, EPSILON), uniform)


def l2_normalize_zero(chroma: jax.Array) -> jax.Array:
    """Unit-L2 per frame; tiny-norm frames stay ZERO — the extraction-path
    normalization (extractor.rs:477-484, 672-677, 904-909, 1230-1234), unlike
    the uniform fallback of the normalization.rs util above."""
    norm = jnp.sqrt(jnp.sum(chroma * chroma, axis=-1, keepdims=True))
    return jnp.where(norm > EPSILON, chroma / jnp.maximum(norm, EPSILON), 0.0)


def sharpen_chroma(chroma: jax.Array, power: float) -> jax.Array:
    """Element-wise power + L2 renorm (normalization.rs:41-65)."""
    return l2_normalize_chroma(jnp.power(jnp.maximum(chroma, 0.0), power))


def smooth_chroma_median(chroma: jax.Array, n_frames: jax.Array, window: int) -> jax.Array:
    """Per-pitch-class temporal median filter (smoothing.rs:37-94): window
    forced odd, edges shrink to the valid frame range, median = sorted
    element at len/2 (no even averaging — the reference picks the single
    middle element of the collected window)."""
    if window <= 1:
        return chroma
    if window % 2 == 0:
        window += 1
    half = window // 2
    # time axis last for the masked filter
    x = jnp.swapaxes(chroma, -1, -2)  # [..., 12, F]
    nv = jnp.asarray(n_frames)[..., None]  # broadcast over pitch classes
    out = _median_select_nth_masked(x, nv, half)
    return jnp.swapaxes(out, -1, -2)


def smooth_chroma_average(chroma: jax.Array, n_frames: jax.Array, window: int) -> jax.Array:
    """Moving-average temporal smoothing variant (smoothing.rs:109-160):
    centered window clipped to the valid frame range."""
    if window <= 1:
        return chroma
    if window % 2 == 0:
        window += 1
    half = window // 2
    f = chroma.shape[-2]
    nv = jnp.asarray(n_frames)[..., None]
    fmask = jnp.arange(f)[None, :] < nv
    xm = jnp.where(fmask[..., None], chroma, 0.0)
    c = jnp.cumsum(xm, axis=-2)
    c0 = jnp.concatenate([jnp.zeros_like(c[..., :1, :]), c], axis=-2)
    idx = jnp.arange(f)
    lo = jnp.clip(idx - half, 0, f)
    hi = jnp.clip(idx + half + 1, 0, f)
    sums = jnp.take(c0, hi, axis=-2) - jnp.take(c0, lo, axis=-2)
    cm = jnp.cumsum(fmask.astype(chroma.dtype), axis=-1)
    cm0 = jnp.concatenate([jnp.zeros_like(cm[..., :1]), cm], axis=-1)
    cnt = jnp.take(cm0, hi, axis=-1) - jnp.take(cm0, lo, axis=-1)
    out = sums / jnp.maximum(cnt, 1.0)[..., None]
    return jnp.where(fmask[..., None], out, chroma)


def _median_select_nth_masked(x: jax.Array, n_valid: jax.Array, half: int) -> jax.Array:
    """select_nth-style median (index len/2) over windows clipped to
    [0, n_valid) per row."""
    n = x.shape[-1]
    nv = jnp.asarray(n_valid)[..., None]
    idx = jnp.arange(n)
    shifts = []
    for off in range(-half, half + 1):
        j = idx + off
        ok = (j >= 0) & (j[None, ...] < nv)
        g = jnp.take(x, jnp.clip(j, 0, n - 1), axis=-1)
        shifts.append(jnp.where(ok, g, jnp.inf))
    s = jnp.sort(jnp.stack(shifts, axis=-1), axis=-1)
    lo = jnp.maximum(idx - half, 0)
    hi = jnp.minimum(idx + half, nv - 1)
    cnt = jnp.maximum(hi - lo + 1, 1)
    mid = jnp.broadcast_to(cnt // 2, s.shape[:-1])
    # mid only ranges over [0, half] (full interior windows have exactly
    # 2*half+1 members), so a handful of selects beats a huge gather
    med = s[..., 0]
    for m in range(1, half + 1):
        med = jnp.where(mid == m, s[..., m], med)
    return jnp.where(idx < nv, med, x)
