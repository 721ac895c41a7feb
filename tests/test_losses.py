'''Loss tests: masked-mean semantics vs direct numpy transcriptions of the
reference equations, for all four color modes and all four loss heads.'''

import jax.numpy as jnp
import numpy as np
import pytest

from occlusions4d_tpu.losses import LossConfig, per_slice_losses, per_example_losses, total_loss
from occlusions4d_tpu.utils.colors import rgb_to_hsv


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _bce(logit, target):
    return np.maximum(logit, 0) - logit * target + np.log1p(np.exp(-np.abs(logit)))


def _make_data(rng, n_solid=60, n_air=40, d_out=5, with_segm=0):
    n = n_solid + n_air
    out = rng.randn(n, d_out + with_segm).astype(np.float32)
    tgt = np.zeros((n, 6), np.float32)
    tgt[:n_solid, 0] = 1.0
    tgt[:n_solid, 1:4] = rng.rand(n_solid, 3)
    tgt[:n_solid, 4] = (rng.rand(n_solid) > 0.5).astype(np.float32)
    tgt[:n_solid, 5] = rng.randint(0, with_segm if with_segm else 1, n_solid)
    tgt[n_solid:, 1:] = -1.0
    return out, tgt


def test_density_loss_matches_bce():
    rng = np.random.RandomState(0)
    out, tgt = _make_data(rng)
    cfg = LossConfig(color_mode='rgb')
    got = float(per_slice_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)['dens'])
    expect = _bce(out[:, 0], tgt[:, 0]).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_color_loss_rgb_masked_l1():
    rng = np.random.RandomState(1)
    out, tgt = _make_data(rng)
    cfg = LossConfig(color_mode='rgb', color_lw=1.0)
    got = float(per_slice_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)['rgb'])
    mask = (tgt[:, 0] >= 0.1) & (tgt[:, 1] >= 0.0)
    expect = np.abs(out[mask][:, 1:4] - tgt[mask][:, 1:4]).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_track_loss_masked_bce():
    rng = np.random.RandomState(2)
    out, tgt = _make_data(rng)
    cfg = LossConfig(color_mode='rgb', tracking_lw=1.0)
    got = float(per_slice_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)['track'])
    mask = (tgt[:, 0] >= 0.1) & (tgt[:, 4] >= 0.0)
    expect = _bce(out[mask][:, 4], tgt[mask][:, 4]).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_segm_loss_masked_ce():
    rng = np.random.RandomState(3)
    K = 13
    out, tgt = _make_data(rng, d_out=5, with_segm=K)
    cfg = LossConfig(color_mode='rgb', semantic_classes=K, segmentation_lw=1.0)
    got = float(per_slice_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)['segm'])
    mask = tgt[:, 5] >= 0
    logits = out[mask][:, -K:]
    labels = tgt[mask][:, 5].astype(int)
    logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) \
        + logits.max(-1)
    expect = (logz - logits[np.arange(len(labels)), labels]).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_color_loss_hsv_components():
    rng = np.random.RandomState(4)
    out, tgt = _make_data(rng, d_out=16)  # 1 + 14 + 1 track.
    cfg = LossConfig(color_mode='hsv', color_lw=1.0)
    got = float(per_slice_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)['rgb'])
    # Oracle: transcription of loss.py:85-115.
    mask = (tgt[:, 0] >= 0.1) & (tgt[:, 1] >= 0.0)
    o, t = out[mask], tgt[mask]
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(t[:, 1:4])))
    hue = np.round(hsv[:, 0] / 360.0 * 12).astype(int)
    hue[hue == 12] = 0
    sat, val = hsv[:, 1], hsv[:, 2]
    hmask = (sat >= 0.2) & (val >= 0.2)
    if hmask.sum() >= 16:
        logits = o[hmask][:, 1:13]
        logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) \
            + logits.max(-1)
        loss_hue = (logz - logits[np.arange(hmask.sum()), hue[hmask]]).mean() / 2
    else:
        loss_hue = 0.0
    loss_sat = np.abs(o[:, 13] - sat).mean()
    loss_val = np.abs(o[:, 14] - val).mean()
    expect = (loss_hue + loss_sat + loss_val) / 3
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_color_loss_bins_runs():
    rng = np.random.RandomState(5)
    out, tgt = _make_data(rng, d_out=11)  # 1 + 9 + 1.
    cfg = LossConfig(color_mode='bins', color_lw=1.0)
    got = float(per_slice_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)['rgb'])
    assert np.isfinite(got) and got > 0


def test_per_example_mean_of_slices():
    rng = np.random.RandomState(6)
    outs, tgts = [], []
    for _ in range(6):
        o, t = _make_data(rng)
        outs.append(o)
        tgts.append(t)
    out = np.stack(outs).reshape(2, 3, 100, 5)
    tgt = np.stack(tgts).reshape(2, 3, 100, 6)
    cfg = LossConfig(color_mode='rgb', color_lw=1.0, tracking_lw=1.0)
    got = per_example_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)
    slice_means = [float(per_slice_losses(jnp.asarray(outs[i]), jnp.asarray(tgts[i]),
                                          cfg)['dens']) for i in range(6)]
    np.testing.assert_allclose(float(got['dens']), np.mean(slice_means), rtol=1e-5)
    tot = float(total_loss(got, cfg))
    expect = float(got['rgb']) + float(got['dens']) + float(got['track'])
    np.testing.assert_allclose(tot, expect, rtol=1e-6)


def test_empty_mask_gives_zero_not_nan():
    out = np.zeros((10, 5), np.float32)
    tgt = np.zeros((10, 6), np.float32)
    tgt[:, 1:] = -1.0  # all air: no color/track/segm supervision anywhere.
    cfg = LossConfig(color_mode='rgb')
    losses = per_slice_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)
    for k in ('rgb', 'segm', 'track'):
        assert np.isfinite(float(losses[k])) and float(losses[k]) == 0.0


def test_rgb_to_hsv_matches_matplotlib():
    import matplotlib.colors
    rng = np.random.RandomState(7)
    rgb = rng.rand(200, 3).astype(np.float32)
    ours = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
    ref = matplotlib.colors.rgb_to_hsv(rgb)
    np.testing.assert_allclose(ours[:, 0] / 360.0, ref[:, 0], atol=1e-3)
    np.testing.assert_allclose(ours[:, 1:], ref[:, 1:], atol=1e-3)
