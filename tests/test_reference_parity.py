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
