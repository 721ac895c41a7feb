'''
Torch-oracle forward-parity tests: the executable version of the "density/seg parity
vs PyTorch" north star (BASELINE.md) with the pretrained blobs stripped.

Imports the reference's OWN torch modules (/root/reference/model/model.py:12-233,
/root/reference/model/implicit.py:211-445, /root/reference/model/point_transformer_layer.py:116-183),
random-inits them, maps their state_dicts through checkpoint.import_torch_state_dict,
and asserts the flax modules produce the same forward outputs on fixed inputs with
deterministic FPS. Any drift in the math (softmax scale, norm eps placement, residual
order, key mapping) fails these tests.

Third-party deps the reference imports but this image lacks are stubbed:
  * open3d: dead import (point_transformer_layer.py:11; the o3d kNN path is unused).
  * torchvision / wandb: imported by the reference's shared __init__, unused here.
  * torch_cluster: fps/knn kernels (modules.py:133,142) backed by
    occlusions4d_tpu.native host ops, which pin the same semantics
    (per-batch FPS with ceil(N*ratio) picks, exact kNN sorted by distance).
'''

import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from occlusions4d_tpu import checkpoint  # noqa: E402
from occlusions4d_tpu.models import PointEncoder, LocalImplicitField  # noqa: E402
from occlusions4d_tpu.native import fps_host, knn_host  # noqa: E402

REF = '/root/reference'

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, 'model')),
                                reason='reference repo not mounted')


def _stub_module(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
    return sys.modules[name]


def _torch_cluster_fps(src, batch, ratio=0.5, random_start=True, **kwargs):
    '''torch_cluster.fps semantics (per-batch segment, ceil(N*ratio) picks); the
    deterministic mode starts at each segment's first point.'''
    assert not random_start, 'parity tests require fps_random_start=False'
    src_np = src.detach().cpu().numpy()
    b = batch.detach().cpu().numpy()
    out = []
    for seg_id in np.unique(b):
        seg = np.nonzero(b == seg_id)[0]
        n_out = int(math.ceil(len(seg) * float(ratio)))
        idx = fps_host(src_np[seg], n_out, start_idx=0, sort_result=False)
        out.append(seg[idx])
    return torch.from_numpy(np.concatenate(out).astype(np.int64))


def _torch_cluster_knn(x, y, k, batch_x=None, batch_y=None, **kwargs):
    '''torch_cluster.knn semantics: (2, E) edge index with row 0 = query (y) index,
    row 1 = key (x) index, grouped per query, nearest first.'''
    x_np = x.detach().cpu().numpy()
    y_np = y.detach().cpu().numpy()
    bx = np.zeros(len(x_np), np.int64) if batch_x is None \
        else batch_x.detach().cpu().numpy()
    by = np.zeros(len(y_np), np.int64) if batch_y is None \
        else batch_y.detach().cpu().numpy()
    rows, cols = [], []
    for seg_id in np.unique(by):
        qs = np.nonzero(by == seg_id)[0]
        ks = np.nonzero(bx == seg_id)[0]
        _, idx = knn_host(y_np[qs], x_np[ks], k)                      # (nq, k).
        rows.append(np.repeat(qs, idx.shape[1]))
        cols.append(ks[idx].reshape(-1))
    edges = np.stack([np.concatenate(rows), np.concatenate(cols)])
    return torch.from_numpy(edges.astype(np.int64))


@pytest.fixture(scope='module')
def ref():
    '''Import the reference's model/implicit modules with stubbed native deps.'''
    for name in ('torchvision', 'torchvision.datasets', 'torchvision.models',
                 'torchvision.transforms', 'torchvision.utils', 'wandb', 'open3d'):
        _stub_module(name)
    tc = _stub_module('torch_cluster')
    tc.fps = _torch_cluster_fps
    tc.knn = _torch_cluster_knn

    added = [REF, os.path.join(REF, 'model'), os.path.join(REF, 'utils')]
    sys.path[:0] = added
    try:
        import importlib
        out = types.SimpleNamespace(
            model=importlib.import_module('model'),
            implicit=importlib.import_module('implicit'),
            loss=importlib.import_module('loss'),
            geometry=importlib.import_module('geometry'),
        )
        yield out
    finally:
        for p in added:
            sys.path.remove(p)


RNG = np.random.RandomState(12)

ENC_ARGS = dict(n_input=512, n_output=512, d_in=8, d_out=1, d_feat=8,
                down_blocks=2, up_blocks=2, transition_factor=3,
                pt_num_neighbors=8, pt_norm_type='none', down_neighbors=6,
                abstract_levels=1, skip_connections=False, enable_decoder=False,
                output_featurized=True, output_global_emb=True, global_dim=32,
                fps_random_start=False)


def _encoder_pair(ref, **overrides):
    args = dict(ENC_ARGS, **overrides)
    torch.manual_seed(7)
    tnet = ref.model.PointCompletionNetV3(mixed_precision=False, **args).eval()
    variables = checkpoint.import_torch_state_dict(tnet.state_dict(), net='encoder')
    jnet = PointEncoder(dtype=jnp.float32, **args)
    return tnet, jnet, variables


@pytest.mark.parametrize('norm_type,abstract_levels',
                         [('none', 1), ('layer', 1), ('batch', 1), ('layer', 2)])
def test_encoder_forward_parity(ref, norm_type, abstract_levels):
    '''Abstract point cloud + global embedding match the reference encoder
    (/root/reference/model/model.py:148-233) within float32 tolerance.'''
    tnet, jnet, variables = _encoder_pair(ref, pt_norm_type=norm_type,
                                          abstract_levels=abstract_levels)
    pcl = (RNG.rand(1, 512, 8) * 2.0 - 1.0).astype(np.float32)
    with torch.no_grad():
        t_out, t_global, _ = tnet(torch.from_numpy(pcl), False)
    j_out, j_global, _ = jnet.apply(variables, jnp.asarray(pcl))

    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_global), t_global.numpy(),
                               atol=1e-4, rtol=1e-4)


DEC_ARGS = dict(d_in=4, d_hidden=64, d_out=12, d_latent=64, n_blocks=4,
                pos_encoding_freqs=8, activation='relu', num_local_features=4,
                local_mode='attention', d_latent_local=32, cross_attn_neighbors=6,
                cross_attn_layers=1, cr_attn_type='c')


def _decoder_pair(ref, **overrides):
    args = dict(DEC_ARGS, **overrides)
    torch.manual_seed(9)
    tnet = ref.implicit.LocalPclResnetFC(mixed_precision=False, **args).eval()
    variables = checkpoint.import_torch_state_dict(tnet.state_dict(), net='decoder')
    jnet = LocalImplicitField(dtype=jnp.float32, **args)
    return tnet, jnet, variables


def _decoder_inputs(m=64, n=256, d_local=32, d_global=32):
    pcl_abstract = np.concatenate([
        (RNG.rand(1, m, 3) * 4.0 - 2.0).astype(np.float32),
        RNG.randn(1, m, d_local).astype(np.float32)], axis=-1)
    features_global = RNG.randn(1, d_global).astype(np.float32)
    queries = np.concatenate([
        (RNG.rand(1, n, 3) * 4.0 - 2.0).astype(np.float32),
        RNG.randint(0, 4, (1, n, 1)).astype(np.float32)], axis=-1)
    return queries, pcl_abstract, features_global


@pytest.mark.parametrize('kwargs', [
    dict(),                                                  # shipped config shape.
    dict(activation='swish', cross_attn_layers=2, cr_attn_type='cc'),
    dict(local_mode='feature'),
    dict(num_local_features=0, d_hidden=32, d_latent=32),    # global-only.
])
def test_decoder_forward_parity(ref, kwargs):
    '''Field outputs + penultimate activations match LocalPclResnetFC
    (/root/reference/model/implicit.py:271-445) within float32 tolerance.'''
    tnet, jnet, variables = _decoder_pair(ref, **kwargs)
    d_latent = kwargs.get('d_latent', DEC_ARGS['d_latent'])
    d_local = kwargs.get('d_latent_local', DEC_ARGS['d_latent_local'])
    d_global = d_latent if kwargs.get('num_local_features', 1) == 0 \
        else d_latent - d_local
    queries, pcl_abstract, features_global = _decoder_inputs(
        d_local=d_local, d_global=d_global)

    with torch.no_grad():
        t_out, t_penult = tnet(torch.from_numpy(queries),
                               torch.from_numpy(pcl_abstract),
                               torch.from_numpy(features_global), None)
    j_out, j_penult = jnet.apply(variables, jnp.asarray(queries),
                                 jnp.asarray(pcl_abstract),
                                 jnp.asarray(features_global))

    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_penult), t_penult.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_end_to_end_field_parity(ref):
    '''Encoder -> decoder chain: the full eval-time field query path matches the
    reference stack end to end (abstract cloud produced by each framework's own
    encoder, decoded by its own decoder; cf. /root/reference/eval/inference.py:195-246).

    Runs at abstract_levels=1 (the gv1 flagship config, README.md:36). At
    abstract_levels>=2 the abstract cloud contains bit-identical duplicate
    coordinates (the final FPS level is a subset of the level-1 skip points), so the
    decoder's kNN gather depends on tie-breaking among exact duplicates -- which
    torch.topk/argsort leave implementation-defined (the reference's own outputs
    differ across torch devices there). Verified empirically: 57/228 duplicated
    coords at this scale; mismatches vanish at levels=1.'''
    enc_over = dict(pt_norm_type='layer', abstract_levels=1)
    tenc, jenc, enc_vars = _encoder_pair(ref, **enc_over)
    dec_over = dict(d_latent_local=32, d_hidden=64, d_latent=64)
    tdec, jdec, dec_vars = _decoder_pair(ref, **dec_over)

    pcl = (RNG.rand(1, 512, 8) * 2.0 - 1.0).astype(np.float32)
    queries, _, _ = _decoder_inputs()

    with torch.no_grad():
        t_abs, t_global, _ = tenc(torch.from_numpy(pcl), False)
        t_out, _ = tdec(torch.from_numpy(queries), t_abs, t_global, None)
    j_abs, j_global, _ = jenc.apply(enc_vars, jnp.asarray(pcl))
    j_out, _ = jdec.apply(dec_vars, jnp.asarray(queries), j_abs, j_global)

    np.testing.assert_allclose(np.asarray(j_abs), t_abs.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_end_to_end_field_parity_levels2(ref, monkeypatch):
    '''The chained encoder -> decoder parity at abstract_levels=2 (the cv1
    flagship shape, README.md:41). The multi-level abstract cloud contains
    bit-identical duplicate coordinates (the final FPS level is a subset of the
    level-1 skip points, /root/reference/model/model.py:224-228), so the
    decoder-side kNN gathers depend on tie-breaking among exact duplicates —
    which torch.topk/argsort leave implementation-defined. The repo's kNN
    paths all tie-break deterministically toward the lower key index
    (lax.top_k / strict-insertion kernels), so the torch oracle here runs
    through tie-stable kNN stubs with the same lowest-index rule (knn_host),
    making the comparison well-defined without touching the reference math.'''

    def _tie_stable_my_knn(pcl_query, pcl_key, num_neighbors, bidirectional=False,
                           return_inds=False, return_knn=True, return_dists=False):
        assert not bidirectional
        d, idx = knn_host(pcl_query.detach().cpu().numpy(),
                          pcl_key.detach().cpu().numpy(), num_neighbors)
        idx_t = torch.from_numpy(idx.astype(np.int64))
        result = ()
        if return_inds:
            result += (idx_t,)
        if return_knn:
            result += (pcl_key[idx_t],)
        if return_dists:
            result += (torch.from_numpy(d.astype(np.float32)),)
        return result

    def _tie_stable_kNN_torch(query, dataset, k):
        out = []
        for b in range(query.shape[0]):
            _, idx = knn_host(query[b].detach().cpu().numpy(),
                              dataset[b].detach().cpu().numpy(), k)
            out.append(idx.astype(np.int64))
        return torch.from_numpy(np.stack(out))

    monkeypatch.setattr(ref.geometry, 'my_knn_torch', _tie_stable_my_knn)
    monkeypatch.setattr(sys.modules['point_transformer_layer'], 'kNN_torch',
                        _tie_stable_kNN_torch)

    enc_over = dict(pt_norm_type='layer', abstract_levels=2)
    tenc, jenc, enc_vars = _encoder_pair(ref, **enc_over)
    dec_over = dict(d_latent_local=32, d_hidden=64, d_latent=64)
    tdec, jdec, dec_vars = _decoder_pair(ref, **dec_over)

    pcl = (RNG.rand(1, 512, 8) * 2.0 - 1.0).astype(np.float32)
    queries, _, _ = _decoder_inputs()

    with torch.no_grad():
        t_abs, t_global, _ = tenc(torch.from_numpy(pcl), False)
        t_out, _ = tdec(torch.from_numpy(queries), t_abs, t_global, None)
    j_abs, j_global, _ = jenc.apply(enc_vars, jnp.asarray(pcl))
    j_out, _ = jdec.apply(dec_vars, jnp.asarray(queries), j_abs, j_global)

    # The multi-level cloud really does contain duplicate coordinates (the
    # condition that made this test impossible without tie-stable kNN).
    abs_np = np.asarray(j_abs)[0, :, :3]
    uniq = np.unique(abs_np, axis=0)
    assert uniq.shape[0] < abs_np.shape[0], 'fixture lost its duplicate coords'

    np.testing.assert_allclose(np.asarray(j_abs), t_abs.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize('norm_type', ['none', 'layer'])
def test_up_transition_forward_parity(ref, norm_type):
    '''UpTransition (skip variant — the only live one, modules.py:190 asserts
    skip_connections) matches the reference: mlp1(x1) trilinear-interpolated
    onto p2 (knn_k inverse-distance weights, eps 1e-7,
    /root/reference/utils/geometry.py:506-559) + mlp2(x2). Dead in shipped
    configs (enable_decoder=False, train.py:223) but part of the public model
    surface.'''
    from occlusions4d_tpu.models import UpTransition as JUp
    ref_modules = sys.modules['modules']
    d_in, d_out, B, N1, N2 = 24, 16, 2, 40, 120
    torch.manual_seed(21)
    tnet = ref_modules.UpTransition(d_in, d_out, factor=3, knn_k=3,
                                    skip_connections=True,
                                    norm_type=norm_type).eval()
    variables = checkpoint.import_torch_state_dict(tnet.state_dict(),
                                                   net='encoder')
    jnet = JUp(d_in=d_in, d_out=d_out, factor=3, knn_k=3, norm_type=norm_type,
               dtype=jnp.float32)

    x1 = RNG.randn(B, N1, d_in).astype(np.float32)
    p1 = (RNG.rand(B, N1, 3) * 4.0 - 2.0).astype(np.float32)
    x2 = RNG.randn(B, N2, d_out).astype(np.float32)
    p2 = (RNG.rand(B, N2, 3) * 4.0 - 2.0).astype(np.float32)

    with torch.no_grad():
        t_y, t_p = tnet(torch.from_numpy(x1), torch.from_numpy(p1),
                        torch.from_numpy(x2), torch.from_numpy(p2))
    j_y, j_p = jnet.apply(variables, jnp.asarray(x1), jnp.asarray(p1),
                          jnp.asarray(x2), jnp.asarray(p2))

    np.testing.assert_allclose(np.asarray(j_y), t_y.numpy(), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_p), t_p.numpy(), atol=0, rtol=0)


# ------------------------------------------------------------------ loss parity --
# The loss layer is the subtlest math in the objective (blandness gates, the
# >= 16-point hue skip, /2 and /3 scalings, channel indexing); these tests feed
# the reference's OWN MyLosses (/root/reference/loss.py:50-253) and the repo's
# per_example_losses identical (output, target) tensors and assert every scalar.

from occlusions4d_tpu.losses import LossConfig, per_example_losses, total_loss  # noqa: E402
from occlusions4d_tpu.models.factory import decoder_out_channels  # noqa: E402


class _ScalarSink:
    def report_scalar(self, *a, **k):
        pass


def _loss_tensors(color_mode, semantic_classes, B=2, T=2, N=512, seed=5,
                  bland=False):
    '''Random (output, target) pair exercising every mask: mixed solid/air
    density, ~30% color-unavailable rows, track in {-1, 0, 1}, segm in
    [-1, S). bland=True makes almost every color desaturated so the per-slice
    supervisable-hue count drops below the reference's 16-point skip threshold
    (loss.py:105-111).'''
    rng = np.random.RandomState(seed)
    C = decoder_out_channels(color_mode, 1.0, semantic_classes)
    out = rng.randn(B, T, N, C).astype(np.float32)
    out[..., 1:4] = rng.rand(B, T, N, 3)  # post-squash color range.

    rgb = rng.rand(B, T, N, 3).astype(np.float32)
    if bland:
        gray = rng.rand(B, T, N) < 0.97
        level = rng.rand(B, T, N, 1).astype(np.float32)
        rgb = np.where(gray[..., None], np.repeat(level, 3, axis=-1), rgb)
    unavail = rng.rand(B, T, N) < 0.3
    rgb[unavail] = -1.0

    tgt = np.zeros((B, T, N, 6), np.float32)
    tgt[..., 0] = (rng.rand(B, T, N) < 0.5).astype(np.float32)
    tgt[..., 1:4] = rgb
    track = (rng.rand(B, T, N) < 0.5).astype(np.float32)
    tgt[..., 4] = np.where(rng.rand(B, T, N) < 0.25, -1.0, track)
    tgt[..., 5] = rng.randint(-1, semantic_classes, (B, T, N))
    return out, tgt


def _ref_per_example(ref, color_mode, semantic_classes, out, tgt):
    (B, T, N, C) = out.shape
    ml = ref.loss.MyLosses('train', _ScalarSink(), False, 1.0, 1.0, 1.0, 1.0,
                           color_mode, semantic_classes, T, 0)
    out_l = [torch.from_numpy(out[:, t]) for t in range(T)]
    tgt_l = [torch.from_numpy(tgt[:, t]) for t in range(T)]
    pcl_target = [torch.zeros(B, 8, 9) for _ in range(T)]
    pcl_target_size = [[4] * B for _ in range(T)]
    with torch.no_grad():
        (rgb, dens, segm, track) = ml.per_example(pcl_target, pcl_target_size,
                                                  out_l, tgt_l)
    return dict(rgb=float(rgb), dens=float(dens), segm=float(segm),
                track=float(track))


@pytest.mark.parametrize('color_mode', ['rgb', 'rgb_nosigmoid', 'hsv', 'bins'])
def test_loss_parity(ref, color_mode):
    '''density BCE, per-mode color loss, segm CE, track BCE all match the
    reference per_example scalars (loss.py:50-253) on identical inputs.'''
    S = 13
    out, tgt = _loss_tensors(color_mode, S)
    expect = _ref_per_example(ref, color_mode, S, out, tgt)
    cfg = LossConfig(color_mode=color_mode, semantic_classes=S, density_lw=1.0,
                     color_lw=1.0, segmentation_lw=1.0, tracking_lw=1.0)
    got = per_example_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)
    for key in ('dens', 'rgb', 'segm', 'track'):
        np.testing.assert_allclose(float(got[key]), expect[key], rtol=2e-5,
                                   atol=2e-6, err_msg=f'{color_mode}/{key}')
    # Lambda-weighted total (loss.py:277-278).
    w = dict(rgb=1.0, dens=1.0, segm=1.0, track=1.0)
    np.testing.assert_allclose(
        float(total_loss(got, cfg)),
        sum(expect[k] * w[k] for k in w), rtol=2e-5)


def test_loss_parity_hsv_hue_skip(ref):
    '''The hsv hue term is dropped per slice when fewer than 16 points pass the
    saturation/brightness gates (loss.py:103-111); bland inputs drive the count
    under the threshold and both sides must agree on the resulting scalars.'''
    S = 13
    out, tgt = _loss_tensors('hsv', S, bland=True, seed=11)
    # Sanity: at least one slice actually skips hue (and not all do).
    from occlusions4d_tpu.utils.colors import hue_bin_targets
    rgb = np.clip(tgt[..., 1:4], 0.0, 1.0)
    _, sat, val = hue_bin_targets(jnp.asarray(rgb))
    mask = ((tgt[..., 0] >= 0.1) & (tgt[..., 1] >= 0.0)
            & np.asarray(sat >= 0.2) & np.asarray(val >= 0.2))
    counts = mask.sum(axis=-1)
    assert (counts < 16).any(), counts

    expect = _ref_per_example(ref, 'hsv', S, out, tgt)
    cfg = LossConfig(color_mode='hsv', semantic_classes=S, density_lw=1.0,
                     color_lw=1.0, segmentation_lw=1.0, tracking_lw=1.0)
    got = per_example_losses(jnp.asarray(out), jnp.asarray(tgt), cfg)
    for key in ('dens', 'rgb', 'segm', 'track'):
        np.testing.assert_allclose(float(got[key]), expect[key], rtol=2e-5,
                                   atol=2e-6, err_msg=f'hsv-skip/{key}')


@pytest.mark.parametrize('bias', ['none', 'low_moving'])
def test_sampler_statistical_parity(ref, bias):
    '''The guided sampler vs the reference's OWN GuidedImplicitPointSampler
    (/root/reference/utils/geometry.py:578-762) on identical target frames.
    The reference's rejection loops make bitwise equality meaningless, so this
    pins the CONTRACTS both must satisfy and the sampling DISTRIBUTIONS:

      * solid queries within point_occupancy_radius/2 of a target point; air
        queries at least point_occupancy_radius from every target point;
      * solid targets are exact copies of ground-truth rows (density 1, the
        chosen point's colors/track mark); air targets are (0, -1, -1, -1, -1);
      * realized bias shares (solid_sbs / air_sbs) agree;
      * the 'low' bias pulls the solid z-distribution down comparably.
    '''
    import jax
    from occlusions4d_tpu.sampler import GuidedPointSampler, SamplerConfig

    rng = np.random.RandomState(3)
    M, S, A, r = 3000, 512, 768, 0.2

    def make_frame():
        p = np.zeros((M, 9), np.float32)
        p[:, :3] = rng.rand(M, 3) * [8, 8, 3] - [4, 4, 0.5]
        p[:, 3] = rng.randint(0, 5, M)                  # instance id.
        p[:, 4] = rng.randint(0, 2, M)                  # view idx.
        p[:, 5:8] = rng.rand(M, 3)                      # RGB.
        p[:, 8] = (rng.rand(M) < 0.2)                   # mark_track.
        return p

    frames = [make_frame(), make_frame()]
    t_idx = 0

    logger = types.SimpleNamespace(warning=lambda *a: None,
                                   info=lambda *a: None,
                                   error=lambda *a: None,
                                   debug=lambda *a: None)
    ref_sampler = ref.geometry.GuidedImplicitPointSampler(
        logger, min_z=-1.0, cube_bounds=5.0, point_occupancy_radius=r,
        num_solid=S, num_air=A, predict_segmentation=False,
        semantic_classes=13, predict_tracking=True, data_kind='greater',
        point_sample_bias=bias, cube_mode=4)
    tlist = [torch.from_numpy(f[None]) for f in frames]
    sizes = [torch.full((1,), M, dtype=torch.long) for _ in frames]
    valo = torch.zeros(1, 32, dtype=torch.long)
    np.random.seed(11)
    torch.manual_seed(11)
    (rsi, rai, rst, rat, rssb, rasb) = ref_sampler(
        tlist, sizes, valo, torch.zeros(1, dtype=torch.long), t_idx)
    rsi, rai = rsi[0].numpy(), rai[0].numpy()
    rst, rat = rst[0].numpy(), rat[0].numpy()
    rssb, rasb = rssb[0].numpy(), rasb[0].numpy()

    cfg = SamplerConfig(min_z=-1.0, cube_bounds=5.0, point_occupancy_radius=r,
                        num_solid=S, num_air=A, predict_segmentation=False,
                        semantic_classes=13, predict_tracking=True,
                        data_kind='greater', point_sample_bias=bias)
    ours = GuidedPointSampler(cfg)
    res = ours.sample_frame(
        jax.random.PRNGKey(5), jnp.asarray(frames[t_idx]),
        jnp.ones(M, bool), jnp.asarray(frames[1]), jnp.ones(M, bool),
        jnp.zeros(32, jnp.int32), jnp.asarray(0), t_idx)
    assert bool(res['ok'])
    osi = np.asarray(res['solid_input'])
    oai = np.asarray(res['air_input'])
    ost = np.asarray(res['solid_target'])
    oat = np.asarray(res['air_target'])
    ossb = np.asarray(res['solid_sbs'])
    oasb = np.asarray(res['air_sbs'])

    txyz = frames[t_idx][:, :3]

    def min_dists(q):
        return np.linalg.norm(q[:, None] - txyz[None], axis=-1).min(-1)

    for name, si, ai, st, at in [('reference', rsi, rai, rst, rat),
                                 ('ours', osi, oai, ost, oat)]:
        # Geometric contracts.
        assert si.shape == (S, 4) and ai.shape == (A, 4), name
        np.testing.assert_allclose(si[:, 3], t_idx, err_msg=name)
        np.testing.assert_allclose(ai[:, 3], t_idx, err_msg=name)
        assert min_dists(si[:, :3]).max() <= r / 2 + 1e-5, name
        assert min_dists(ai[:, :3]).min() >= r - 1e-5, name
        # Target contracts: solid rows copy GT rows exactly; air rows are the
        # (0, -1, -1, -1, -1) filler.
        np.testing.assert_allclose(st[:, 0], 1.0, err_msg=name)
        gt_colors = {tuple(np.round(c, 5)) for c in frames[t_idx][:, 5:8]}
        got = {tuple(np.round(c, 5)) for c in st[:, 1:4]}
        assert got <= gt_colors, name
        assert set(np.unique(st[:, 4])) <= {0.0, 1.0}, name
        np.testing.assert_allclose(at[:, 0], 0.0, err_msg=name)
        np.testing.assert_allclose(at[:, 1:5], -1.0, err_msg=name)

    # Realized bias shares agree (share-of-S counts; sigma ~ 0.02 at S=512).
    np.testing.assert_allclose(ossb, rssb, atol=0.1)
    np.testing.assert_allclose(oasb, rasb, atol=0.1)

    # Distributional agreement of the solid z profile (the 'low' bias pulls
    # both down the same way) and of the air hardness profile.
    assert abs(osi[:, 2].mean() - rsi[:, 2].mean()) < 0.3, (
        osi[:, 2].mean(), rsi[:, 2].mean())
    assert abs(np.median(min_dists(oai[:, :3]))
               - np.median(min_dists(rai[:, :3]))) < 0.3


@pytest.mark.parametrize('bias', ['vehped', 'low_moving_ivalo_sembal'])
def test_sampler_statistical_parity_carla(ref, bias):
    '''CARLA-kind sampler parity against the reference torch sampler: the
    E=11 channel layout, the cube_mode-4 output-cuboid filter, segmentation
    targets (with the >= semantic_classes -> 3 fold), and the vehped / ivalo /
    sembal share logic (geometry.py:810-856) - the cv1 production mixture.'''
    import jax
    from occlusions4d_tpu.ops.bounds import carla_output_bounds
    from occlusions4d_tpu.sampler import GuidedPointSampler, SamplerConfig

    rng = np.random.RandomState(4)
    M, S, A, r = 3000, 512, 768, 0.2
    cub = np.asarray(carla_output_bounds(16.0, -0.5, 4), np.float32).reshape(6)

    def make_frame():
        p = np.zeros((M, 11), np.float32)
        # Inside the cube_mode-4 output cuboid (with margin for the jitter).
        for d in range(3):
            lo, hi = cub[2 * d] + 0.3, cub[2 * d + 1] - 0.3
            p[:, d] = rng.rand(M) * (hi - lo) + lo
        p[:, 2] = np.abs(p[:, 2]) * 0.25                # mostly low points.
        p[:, 3] = rng.rand(M)                           # cosine angle.
        sem = rng.choice([1, 2, 3, 4, 10, 22], M,
                         p=[0.3, 0.2, 0.2, 0.08, 0.17, 0.05])
        inst = np.where(sem == 10, 6, np.where(sem == 4, 7, sem % 6))
        p[:, 4] = inst
        p[:, 5] = sem
        p[:, 6] = rng.randint(0, 2, M)                  # view idx.
        p[:, 7:10] = rng.rand(M, 3)
        p[:, 10] = 0.0
        return p

    frames = [make_frame(), make_frame()]
    valo_np = np.full(256, -1, np.int64)
    valo_np[:2] = [6, 7]                                # the vehped instances.

    logger = types.SimpleNamespace(warning=lambda *a: None,
                                   info=lambda *a: None,
                                   error=lambda *a: None,
                                   debug=lambda *a: None)
    ref_sampler = ref.geometry.GuidedImplicitPointSampler(
        logger, min_z=-0.5, cube_bounds=16.0, point_occupancy_radius=r,
        num_solid=S, num_air=A, predict_segmentation=True,
        semantic_classes=13, predict_tracking=False, data_kind='carla',
        point_sample_bias=bias, cube_mode=4)
    tlist = [torch.from_numpy(f[None]) for f in frames]
    sizes = [torch.full((1,), M, dtype=torch.long) for _ in frames]
    np.random.seed(21)
    torch.manual_seed(21)
    (rsi, rai, rst, rat, rssb, rasb) = ref_sampler(
        tlist, sizes, torch.from_numpy(valo_np[None]),
        torch.full((1,), 2, dtype=torch.long), 0)
    rsi, rst = rsi[0].numpy(), rst[0].numpy()
    rai, rat = rai[0].numpy(), rat[0].numpy()
    rssb, rasb = rssb[0].numpy(), rasb[0].numpy()

    cfg = SamplerConfig(min_z=-0.5, cube_bounds=16.0, point_occupancy_radius=r,
                        num_solid=S, num_air=A, predict_segmentation=True,
                        semantic_classes=13, predict_tracking=False,
                        data_kind='carla', point_sample_bias=bias, cube_mode=4)
    ours = GuidedPointSampler(cfg)
    res = ours.sample_frame(
        jax.random.PRNGKey(6), jnp.asarray(frames[0]), jnp.ones(M, bool),
        jnp.asarray(frames[1]), jnp.ones(M, bool),
        jnp.asarray(valo_np.astype(np.int32)), jnp.asarray(2), 0)
    assert bool(res['ok'])
    osi, ost = np.asarray(res['solid_input']), np.asarray(res['solid_target'])
    oai, oat = np.asarray(res['air_input']), np.asarray(res['air_target'])
    ossb, oasb = np.asarray(res['solid_sbs']), np.asarray(res['air_sbs'])

    txyz = frames[0][:, :3]

    def min_dists(q):
        return np.linalg.norm(q[:, None] - txyz[None], axis=-1).min(-1)

    for name, si, ai, st, at in [('reference', rsi, rai, rst, rat),
                                 ('ours', osi, oai, ost, oat)]:
        assert min_dists(si[:, :3]).max() <= r / 2 + 1e-5, name
        assert min_dists(ai[:, :3]).min() >= r - 1e-5, name
        np.testing.assert_allclose(st[:, 0], 1.0, err_msg=name)
        # Segmentation channel: GT tags with >= 13 folded to 3 ('Other').
        segm = st[:, 5]
        assert set(np.unique(segm)) <= {1., 2., 3., 4., 10.}, name
        np.testing.assert_allclose(at[:, 0], 0.0, err_msg=name)
        np.testing.assert_allclose(at[:, 1:], -1.0, err_msg=name)

    np.testing.assert_allclose(ossb, rssb, atol=0.1)
    np.testing.assert_allclose(oasb, rasb, atol=0.1)
    if 'vehped' in bias or 'ivalo' in bias:
        # The vehped/ivalo biases must enrich classes 4/10 comparably.
        f_ref = float(np.isin(rst[:, 5], (4, 10)).mean())
        f_our = float(np.isin(ost[:, 5], (4, 10)).mean())
        assert abs(f_ref - f_our) < 0.12, (f_ref, f_our)


# ------------------------------------------------------- lockstep training --
# The last unpinned correctness surface (round-4 verdict #1): forwards, losses
# and sampler distributions are oracle-tested above, but nothing asserted that
# a full backward + clip + AdamW step through THIS repo matches
# `loss.backward(); clip_grad_norm_(0.2); AdamW.step()` on the reference
# (/root/reference/train.py:103-122, 313-314) from identical weights and
# identical supervision. These tests bypass both samplers with the same fixed
# query/target tensors and run the repo's OWN production train step
# (train.build_optimizer + train.make_train_step, sampler stubbed) in lockstep
# with the reference's torch step for several iterations.

import jax  # noqa: E402

from occlusions4d_tpu.pipeline import PipelineConfig, TrainPipeline  # noqa: E402
from occlusions4d_tpu.sampler import SamplerConfig  # noqa: E402
from occlusions4d_tpu.train import build_optimizer, make_train_step  # noqa: E402
from occlusions4d_tpu.config import TrainConfig  # noqa: E402


class _FixedSampler:
    '''Drop-in for GuidedPointSampler.sample_frame returning fixed per-frame
    supervision (constants broadcast over the vmapped batch axis).'''

    def __init__(self, queries, targets, n_solid):
        self.q, self.t, self.n_solid = queries, targets, n_solid

    def sample_frame(self, key, tgt, tgt_valid, other, other_valid, valo_ids,
                     num_valo_ids, time_idx):
        t = int(time_idx)
        q = jnp.asarray(self.q[t])
        tg = jnp.asarray(self.t[t])
        S = self.n_solid
        return dict(solid_input=q[:S], air_input=q[S:],
                    solid_target=tg[:S], air_target=tg[S:],
                    solid_sbs=jnp.zeros((6,), jnp.float32),
                    air_sbs=jnp.zeros((4,), jnp.float32),
                    ok=jnp.asarray(True))


def _lockstep_supervision(T, n_q, color_mode, semantic_classes, seed=3):
    '''Fixed (queries, targets) per frame exercising every loss mask: mixed
    solid/air density, ~30% color-unavailable rows, track in {-1, 0, 1},
    segm in [-1, S).'''
    rng = np.random.RandomState(seed)
    q = np.concatenate([
        (rng.rand(T, n_q, 3) * 4.0 - 2.0).astype(np.float32),
        np.tile(np.arange(T, dtype=np.float32)[:, None, None], (1, n_q, 1))],
        axis=-1)
    tgt = np.zeros((T, n_q, 6), np.float32)
    tgt[..., 0] = (rng.rand(T, n_q) < 0.5).astype(np.float32)
    rgb = rng.rand(T, n_q, 3).astype(np.float32)
    rgb[rng.rand(T, n_q) < 0.3] = -1.0
    tgt[..., 1:4] = rgb
    track = (rng.rand(T, n_q) < 0.5).astype(np.float32)
    tgt[..., 4] = np.where(rng.rand(T, n_q) < 0.25, -1.0, track)
    tgt[..., 5] = rng.randint(-1, semantic_classes, (T, n_q))
    return q, tgt


def _torch_train_steps(ref, tenc, tdec, pcl, queries, targets, lws, color_mode,
                       semantic_classes, n_steps, lr):
    '''The reference's exact step: forward (pipeline.py:179-212 squash) ->
    MyLosses.per_example + lambda-weighted total (loss.py:196-294) ->
    backward -> clip_grad_norm_(0.2) -> AdamW(wd 1e-2, eps 1e-8)
    (train.py:103-122, 313-314).'''
    T, n_q = queries.shape[:2]
    B = pcl.shape[0]
    tenc.train()
    tdec.train()
    all_params = list(tenc.parameters()) + list(tdec.parameters())
    opt = torch.optim.AdamW(all_params, lr=lr, weight_decay=1e-2, eps=1e-8)
    ml = ref.loss.MyLosses('train', _ScalarSink(), False, lws['color'],
                           lws['density'], lws['segmentation'], lws['tracking'],
                           color_mode, semantic_classes, T, 0)
    stub_tgt = [torch.zeros(B, 8, 9) for _ in range(T)]
    stub_sz = [[4] * B for _ in range(T)]
    losses = []
    for _ in range(n_steps):
        opt.zero_grad()
        t_abs, t_global, _ = tenc(torch.from_numpy(pcl), False)
        outs, tgts = [], []
        for t in range(T):
            q = torch.from_numpy(np.repeat(queries[t][None], B, axis=0))
            o, _ = tdec(q, t_abs, t_global, None)
            # Reference squash (pipeline.py:199-212), replicated verbatim.
            if color_mode == 'rgb':
                o[..., 1:4] = torch.sigmoid(o[..., 1:4])
            elif color_mode == 'rgb_nosigmoid':
                o[..., 1:4] = torch.clamp(o[..., 1:4].clone(), min=0.0, max=1.0)
            elif color_mode == 'hsv':
                o[..., 13:15] = torch.clamp(o[..., 13:15].clone(), min=0.0,
                                            max=1.0)
            outs.append(o)
            tgts.append(torch.from_numpy(np.repeat(targets[t][None], B, axis=0)))
        l_rgb, l_dens, l_segm, l_track = ml.per_example(stub_tgt, stub_sz,
                                                        outs, tgts)
        total = torch.zeros(())
        for val, w in ((l_rgb, lws['color']), (l_dens, lws['density']),
                       (l_segm, lws['segmentation']), (l_track, lws['tracking'])):
            if torch.is_tensor(val):
                total = total + val * w
        total.backward()
        torch.nn.utils.clip_grad_norm_(all_params, 0.2)
        opt.step()
        losses.append(float(total.detach()))
    return losses


def _jax_train_steps(encoder, decoder, enc_vars, dec_vars, pcl, queries,
                     targets, lws, color_mode, semantic_classes, n_steps, lr,
                     n_solid):
    '''The repo's production step: TrainPipeline (sampler stubbed) +
    build_optimizer + make_train_step.'''
    T = queries.shape[0]
    pcfg = PipelineConfig(color_mode=color_mode,
                          semantic_classes=semantic_classes, past_frames=T,
                          future_frames=0, density_lw=lws['density'],
                          color_lw=lws['color'],
                          segmentation_lw=lws['segmentation'],
                          tracking_lw=lws['tracking'])
    pipeline = TrainPipeline(encoder, decoder, SamplerConfig(),
                             pcfg, remat=True, fused_decoder='off')
    pipeline.sampler = _FixedSampler(queries, targets, n_solid)
    cfg = TrainConfig(learn_rate=lr, num_epochs=20, lr_decay=0.5,
                      gradient_clip=0.2, mixed_precision=False)
    tx, _ = build_optimizer(cfg, steps_per_epoch=1000)
    params = dict(encoder=enc_vars, decoder=dec_vars)
    state = dict(params=params, opt_state=tx.init(params),
                 step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(pipeline, tx)
    B = pcl.shape[0]
    M = 8
    batch = dict(
        pcl_input=jnp.asarray(pcl),
        pcl_target=jnp.zeros((B, T, M, 9), jnp.float32),
        pcl_target_valid=jnp.ones((B, T, M), bool),
        valo_ids=jnp.zeros((B, 4), jnp.int32),
        num_valo_ids=jnp.zeros((B,), jnp.int32))
    losses = []
    for i in range(n_steps):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics['total_loss']))
    return losses, jax.tree_util.tree_map(np.asarray, state['params'])


def _delta_report(initial_sd, final_sd_torch, final_vars_jax, net):
    '''Per-layer (torch-keyed) deltas from both frameworks.'''
    j_sd = checkpoint.export_torch_state_dict(final_vars_jax, net=net)
    rows = {}
    for k, v0 in initial_sd.items():
        dt = final_sd_torch[k].detach().numpy() - v0
        dj = j_sd[k] - v0
        rows[k] = (dt, dj)
    return rows


def _run_lockstep(ref, enc_over, dec_over, lws, color_mode, S,
                  n_steps=3, lr=1e-3, seed=3):
    from occlusions4d_tpu.models.factory import decoder_out_channels
    d_out = decoder_out_channels(color_mode, lws['segmentation'], S)
    tenc, jenc, enc_vars = _encoder_pair(ref, **enc_over)
    tdec, jdec, dec_vars = _decoder_pair(ref, d_out=d_out, **dec_over)
    init_enc_sd = {k: v.detach().numpy().copy()
                   for k, v in tenc.state_dict().items()}
    init_dec_sd = {k: v.detach().numpy().copy()
                   for k, v in tdec.state_dict().items()}

    rng = np.random.RandomState(seed)
    pcl = (rng.rand(1, 512, 8) * 2.0 - 1.0).astype(np.float32)
    queries, targets = _lockstep_supervision(2, 256, color_mode, S, seed=seed)

    t_losses = _torch_train_steps(ref, tenc, tdec, pcl, queries, targets, lws,
                                  color_mode, S, n_steps, lr)
    j_losses, j_params = _jax_train_steps(jenc, jdec, enc_vars, dec_vars, pcl,
                                          queries, targets, lws, color_mode, S,
                                          n_steps, lr, n_solid=128)

    # Loss trajectories track within f32 forward tolerance.
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    assert t_losses[-1] < t_losses[0], \
        f'reference loss did not descend: {t_losses}'

    # Per-layer parameter deltas match. AdamW's step-1 update is ~sign(g)*lr
    # elementwise, so isolated near-zero-gradient elements are sign-unstable
    # under 1e-7-level f32 forward differences; the per-layer delta DIRECTION
    # and MAGNITUDE are the meaningful lockstep invariants.
    rows = {}
    rows.update(_delta_report(init_enc_sd, tenc.state_dict(),
                              {'params': j_params['encoder']['params']}, 'encoder'))
    rows.update(_delta_report(init_dec_sd, tdec.state_dict(),
                              {'params': j_params['decoder']['params']}, 'decoder'))
    worst = []
    for k, (dt, dj) in rows.items():
        nt = float(np.linalg.norm(dt))
        rel = float(np.linalg.norm(dj - dt) / max(nt, 1e-12))
        cos = float((dt * dj).sum() /
                    max(np.linalg.norm(dt) * np.linalg.norm(dj), 1e-24))
        worst.append((rel, 1.0 - cos, k, nt))
    worst.sort(reverse=True)
    all_t = np.concatenate([dt.ravel() for dt, _ in rows.values()])
    all_j = np.concatenate([dj.ravel() for _, dj in rows.values()])
    global_rel = float(np.linalg.norm(all_j - all_t) / np.linalg.norm(all_t))
    return worst, t_losses, j_losses, global_rel


def _assert_lockstep_deltas(worst, t_losses, j_losses, global_rel):
    '''Measured behavior (3 AdamW steps, f32): the whole-model delta vector
    matches to global rel ~1e-4; per layer, every real-gradient layer matches
    to rel < 4e-3 with 1-cos < 1e-5 (AdamW's step-1 update is ~sign(g)*lr
    elementwise, so isolated near-zero-gradient ELEMENTS are sign-unstable
    under 1e-7-level f32 forward differences — a few flips in a small bias
    show up as ~0.3% of its delta norm while the direction stays parallel).
    The only near-zero-delta LAYERS are the attention MLPs' final biases,
    whose gradient is EXACTLY zero (the per-channel softmax is
    shift-invariant in its logits' bias), so their delta is pure weight decay
    + Adam-eps-scale noise — compared absolutely (max observed 1.9e-6).'''
    assert global_rel < 5e-4, (global_rel, t_losses, j_losses)
    for rel, one_minus_cos, k, nt in worst:
        if nt < 5e-5:
            assert rel * nt < 5e-6, (k, rel, nt, t_losses, j_losses)
        else:
            assert rel < 5e-3 and one_minus_cos < 1e-4, \
                (k, rel, one_minus_cos, nt, t_losses, j_losses)


def test_lockstep_training_parity_gv1_shape(ref):
    '''2-3 full backward+clip+AdamW steps match the torch reference from a
    shared init on the gv1-shaped objective (rgb_nosigmoid, tracking on,
    segmentation off; /root/reference/train.py:103-122).'''
    lws = dict(density=1.0, color=1.0, segmentation=0.0, tracking=1.0)
    worst, t_losses, j_losses, global_rel = _run_lockstep(
        ref, dict(pt_norm_type='none', abstract_levels=1),
        dict(d_latent_local=32, d_hidden=64, d_latent=64), lws,
        'rgb_nosigmoid', 13)
    _assert_lockstep_deltas(worst, t_losses, j_losses, global_rel)


def test_lockstep_training_parity_cv1_shape(ref, monkeypatch):
    '''Same lockstep assertion on the cv1-shaped objective (layer norm,
    abstract_levels=2, hsv color, segmentation on). Tie-stable kNN stubs on
    the torch side as in test_end_to_end_field_parity_levels2 (duplicate
    abstract coords make torch.topk tie-breaks implementation-defined).'''

    def _tie_stable_my_knn(pcl_query, pcl_key, num_neighbors, bidirectional=False,
                           return_inds=False, return_knn=True, return_dists=False):
        assert not bidirectional
        d, idx = knn_host(pcl_query.detach().cpu().numpy(),
                          pcl_key.detach().cpu().numpy(), num_neighbors)
        idx_t = torch.from_numpy(idx.astype(np.int64))
        result = ()
        if return_inds:
            result += (idx_t,)
        if return_knn:
            result += (pcl_key[idx_t],)
        if return_dists:
            result += (torch.from_numpy(d.astype(np.float32)),)
        return result

    def _tie_stable_kNN_torch(query, dataset, k):
        out = []
        for b in range(query.shape[0]):
            _, idx = knn_host(query[b].detach().cpu().numpy(),
                              dataset[b].detach().cpu().numpy(), k)
            out.append(idx.astype(np.int64))
        return torch.from_numpy(np.stack(out))

    monkeypatch.setattr(ref.geometry, 'my_knn_torch', _tie_stable_my_knn)
    monkeypatch.setattr(sys.modules['point_transformer_layer'], 'kNN_torch',
                        _tie_stable_kNN_torch)

    lws = dict(density=1.0, color=1.0, segmentation=0.6, tracking=1.0)
    worst, t_losses, j_losses, global_rel = _run_lockstep(
        ref, dict(pt_norm_type='layer', abstract_levels=2),
        dict(d_latent_local=32, d_hidden=64, d_latent=64), lws, 'hsv', 13)
    _assert_lockstep_deltas(worst, t_losses, j_losses, global_rel)
