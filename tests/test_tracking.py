"""Lucas-Kanade tracker: known-motion synthetic clips."""
import numpy as np
import jax
import jax.numpy as jnp

from egoscaler_tpu.ops.lucas_kanade import (
    lk_track_clip,
    lk_track_pair,
    mask_query_points,
)


def textured_image(rng, h=64, w=64):
    base = rng.normal(size=(h // 4, w // 4, 3))
    img = np.asarray(
        jax.image.resize(jnp.asarray(base), (h, w, 3), method="bicubic")
    )
    return (
        (img - img.min()) / (img.max() - img.min() + 1e-9) * 255
    ).astype(np.float32)


def shift_image(img, dx, dy):
    """Subpixel shift by bilinear resample."""
    h, w, _ = img.shape
    ys = np.clip(np.arange(h) - dy, 0, h - 1.001)
    xs = np.clip(np.arange(w) - dx, 0, w - 1.001)
    y0 = np.floor(ys).astype(int); x0 = np.floor(xs).astype(int)
    fy = (ys - y0)[:, None, None]; fx = (xs - x0)[None, :, None]
    return (
        img[y0][:, x0] * (1 - fy) * (1 - fx)
        + img[y0][:, x0 + 1] * (1 - fy) * fx
        + img[y0 + 1][:, x0] * fy * (1 - fx)
        + img[y0 + 1][:, x0 + 1] * fy * fx
    )


def test_lk_pair_integer_shift(rng):
    img = textured_image(rng)
    moved = shift_image(img, 3.0, -2.0)
    pts = np.array([[30.0, 30.0], [20.0, 40.0], [40.0, 25.0]], np.float32)
    out = np.asarray(lk_track_pair(jnp.asarray(img), jnp.asarray(moved), jnp.asarray(pts)))
    expected = pts + np.array([3.0, -2.0])
    np.testing.assert_allclose(out, expected, atol=0.3)


def test_lk_pair_subpixel(rng):
    img = textured_image(rng)
    moved = shift_image(img, 1.3, 0.7)
    pts = np.array([[32.0, 32.0], [25.0, 38.0]], np.float32)
    out = np.asarray(lk_track_pair(jnp.asarray(img), jnp.asarray(moved), jnp.asarray(pts)))
    np.testing.assert_allclose(out, pts + np.array([1.3, 0.7]), atol=0.25)


def test_lk_clip_accumulates(rng):
    img = textured_image(rng)
    clip = np.stack([shift_image(img, 0.8 * t, 0.4 * t) for t in range(5)])
    depths = np.full((5, 64, 64), 2.0, np.float32)
    q = np.array([[30.0, 30.0], [25.0, 35.0]], np.float32)
    tracks = np.asarray(
        lk_track_clip(jnp.asarray(clip), jnp.asarray(depths), jnp.asarray(q))
    )
    assert tracks.shape == (5, 2, 3)
    for t in range(5):
        np.testing.assert_allclose(
            tracks[t, :, :2], q + np.array([0.8 * t, 0.4 * t]), atol=0.6
        )
    np.testing.assert_allclose(tracks[..., 2], 2.0)


def test_mask_query_points(rng):
    mask = np.zeros((32, 32), bool)
    mask[10:20, 12:22] = True
    pts, valid = mask_query_points(jnp.asarray(mask), 50, jax.random.PRNGKey(0))
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) == 50  # 100 valid pixels > 50 budget
    assert (pts[:, 0] >= 12).all() and (pts[:, 0] < 22).all()
    assert (pts[:, 1] >= 10).all() and (pts[:, 1] < 20).all()
    # unique points
    assert len(np.unique(pts, axis=0)) == len(pts)
