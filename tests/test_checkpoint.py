'''Checkpoint bridge tests: torch-layout state dict <-> flax params round-trips,
key naming parity, legacy migrations, native save/load, resume resolution.'''

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occlusions4d_tpu import checkpoint as ckpt
from occlusions4d_tpu.config import TrainConfig, verify_args
from occlusions4d_tpu.models import factory


@pytest.fixture(scope='module')
def small_models():
    cfg = TrainConfig(n_points=256, pt_feat_dim=4, up_down_blocks=2,
                      transition_factor=4, pt_num_neighbors=4, down_neighbors=4,
                      global_size=8, implicit_mlp_blocks=6, cross_attn_layers=2,
                      cr_attn_type='c', color_mode='rgb_nosigmoid', tracking_lw=1.0,
                      pt_norm_type='layer', abstract_levels=2, segmentation_lw=0.6)
    verify_args(cfg, is_train=True)
    enc, dec, ea, da = factory.build_models(cfg, 'greater')
    rng = np.random.RandomState(0)
    pcl = jnp.asarray(rng.randn(1, 256, 8).astype(np.float32))
    ev = enc.init(jax.random.PRNGKey(0), pcl)
    abstract, fg, _ = enc.apply(ev, pcl)
    q = jnp.asarray(rng.randn(1, 50, 4).astype(np.float32))
    dv = dec.init(jax.random.PRNGKey(1), q, abstract, fg)
    return cfg, enc, dec, ev, dv, pcl, q


def _trees_equal(a, b):
    return jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda x, y: np.allclose(x, y), a, b))


def test_roundtrip_encoder(small_models):
    _, _, _, ev, _, _, _ = small_models
    sd = ckpt.export_torch_state_dict(ev, net='encoder')
    back = ckpt.import_torch_state_dict(sd, net='encoder')
    assert _trees_equal(ev['params'], back['params'])


def test_roundtrip_decoder(small_models):
    _, _, _, _, dv, _, _ = small_models
    sd = ckpt.export_torch_state_dict(dv, net='decoder')
    back = ckpt.import_torch_state_dict(sd, net='decoder')
    assert _trees_equal(dv['params'], back['params'])


def test_exported_keys_match_reference_layout(small_models):
    '''Key names must match the reference torch modules exactly (parity oracle).'''
    _, _, _, ev, dv, _, _ = small_models
    enc_keys = set(ckpt.export_torch_state_dict(ev, net='encoder'))
    # PointCompletionNetV3 attribute paths (model.py:78-122; modules.py:35-43,94-108).
    for k in ['pre_mlp.0.weight', 'pre_mlp.2.bias',
              'blocks.0.layer1.weight', 'blocks.0.layer2.to_q.weight',
              'blocks.0.layer2.pos_mlp.0.weight', 'blocks.0.layer2.attn_mlp.2.bias',
              'blocks.1.mlp.0.weight', 'blocks.1.mlp.1.weight', 'blocks.1.mlp.1.bias',
              'global_mlp.0.weight', 'global_mlp.2.bias',
              'abstract_skip_mlps.0.weight']:
        assert k in enc_keys, k
    # Attention q/k/v have no bias (point_transformer_layer.py:128-130).
    assert 'blocks.0.layer2.to_q.bias' not in enc_keys

    dec_keys = set(ckpt.export_torch_state_dict(dv, net='decoder'))
    # LocalPclResnetFC paths (implicit.py:138-148, 239-268; ResnetBlockFC fc_0/fc_1).
    for k in ['lin_in.weight', 'lin_out.bias', 'blocks.0.fc_0.weight',
              'blocks.5.fc_1.bias', 'lin_z.0.weight', 'lin_z.5.bias',
              'pt_blocks.0.layer1.weight', 'pt_blocks.1.layer2.to_k.weight']:
        assert k in dec_keys, k


def test_legacy_pt_block_rename():
    path, kind = ckpt.torch_key_to_flax('pt_block.layer1.weight', net='decoder')
    assert path == ('pt_blocks_0', 'layer1') and kind == 'weight'


def test_imported_params_drive_forward(small_models):
    '''Import from torch layout and run the models with the imported params.'''
    _, enc, dec, ev, dv, pcl, q = small_models
    sd_e = ckpt.export_torch_state_dict(ev, net='encoder')
    sd_d = ckpt.export_torch_state_dict(dv, net='decoder')
    # Simulate a foreign checkpoint: plain numpy arrays with torch-layout keys.
    ev2 = ckpt.import_torch_state_dict({k: np.asarray(v) for k, v in sd_e.items()},
                                       net='encoder')
    dv2 = ckpt.import_torch_state_dict({k: np.asarray(v) for k, v in sd_d.items()},
                                       net='decoder')
    a1, g1, _ = enc.apply(ev, pcl)
    a2, g2, _ = enc.apply(ev2, pcl)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    o1, _ = dec.apply(dv, q, a1, g1)
    o2, _ = dec.apply(dv2, q, a2, g2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)


def test_batchnorm_running_stats_roundtrip():
    '''BatchNorm variant carries running stats through the bridge.'''
    from occlusions4d_tpu.models import DownTransition
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 4).astype(np.float32))
    p = jnp.asarray(rng.randn(1, 16, 3).astype(np.float32))
    mod = DownTransition(d_in=4, d_out=6, factor=2, knn_k=3, norm_type='batch',
                         fps_random_start=False)
    v = mod.init(jax.random.PRNGKey(0), x, p)
    assert 'batch_stats' in v
    # Wrap as an encoder-like tree under blocks_1 to exercise nested paths.
    wrapped = {'params': {'blocks_1': v['params']},
               'batch_stats': {'blocks_1': v['batch_stats']}}
    sd = ckpt.export_torch_state_dict(wrapped, net='encoder')
    assert 'blocks.1.mlp.1.running_mean' in sd and 'blocks.1.mlp.1.running_var' in sd
    back = ckpt.import_torch_state_dict(sd, net='encoder')
    assert _trees_equal(wrapped['params'], back['params'])
    assert _trees_equal(wrapped['batch_stats'], back['batch_stats'])


def test_native_save_load_and_resume_resolution(tmp_path, small_models):
    _, _, _, ev, _, _, _ = small_models
    out_dir = tmp_path / 'checkpoints' / 'v7_np256_test'
    ckpt.save_checkpoint(str(out_dir), 3, {'params': ev['params'], 'step': 42},
                         meta={'n_points': 256})
    assert (out_dir / 'model_3.pkl').exists() and (out_dir / 'checkpoint.pkl').exists()
    loaded = ckpt.load_checkpoint(str(out_dir))
    assert loaded['epoch'] == 3 and loaded['meta']['n_points'] == 256
    assert _trees_equal(loaded['state']['params'], ev['params'])
    loaded_e = ckpt.load_checkpoint(str(out_dir), epoch=3)
    assert loaded_e['epoch'] == 3
    # `--resume v7` resolves to the unique folder (args.py:20-36).
    assert ckpt.resolve_resume_path('v7', str(tmp_path / 'checkpoints')) == str(out_dir)


def test_checkpoint_integrity_and_back_compat(tmp_path, small_models):
    import pickle
    import pytest
    _, _, _, ev, _, _, _ = small_models
    out_dir = tmp_path / 'ck'
    ckpt.save_checkpoint(str(out_dir), 0, {'params': ev['params']}, meta={'v': 1})
    fp = out_dir / 'checkpoint.pkl'

    # Truncation fails fast with a clear error, not an opaque unpickle error.
    data = fp.read_bytes()
    fp.write_bytes(data[:len(data) // 2])
    with pytest.raises(ValueError, match='[Cc]orrupt|integrity'):
        ckpt.load_checkpoint(str(fp))

    # A flipped payload byte fails the crc32 integrity check.
    corrupt = bytearray(data)
    corrupt[-100] ^= 0xFF
    fp.write_bytes(bytes(corrupt))
    with pytest.raises(ValueError, match='integrity|[Cc]orrupt'):
        ckpt.load_checkpoint(str(fp))

    # Legacy bare-pickle checkpoints (pre-envelope anchors) still load.
    legacy = {'epoch': 7, 'state': {'x': 1}, 'meta': {}}
    with open(fp, 'wb') as f:
        pickle.dump(legacy, f, protocol=4)
    assert ckpt.load_checkpoint(str(fp))['epoch'] == 7

    # A future schema version is refused, not misread.
    fp.write_bytes(data)
    env = pickle.loads(data)
    env['version'] = 99
    with open(fp, 'wb') as f:
        pickle.dump(env, f, protocol=4)
    with pytest.raises(ValueError, match='schema version'):
        ckpt.load_checkpoint(str(fp))


def test_orbax_save_load_exact_structure(tmp_path, small_models):
    '''The orbax backend round-trips the EXACT train-state pytree — including
    optax namedtuple state classes (via the treedef side payload embedded in
    the array store, so metadata and arrays finalize as one atomic unit) and
    tuple-valued meta entries (SURVEY §7 step 6; the pkl format's logical
    contents, different store).'''
    import optax
    _, _, _, ev, _, _, _ = small_models
    params = {'encoder': ev['params']}
    tx = optax.adamw(1e-3)
    state = dict(params=params, opt_state=tx.init(params),
                 step=jnp.asarray(5, jnp.int32))
    out = tmp_path / 'ck_orbax'
    ckpt.save_checkpoint(str(out), 2, state,
                         meta={'shape': (3, 4), 'tag': 'v9'}, format='orbax')
    ckpt.wait_for_async_saves()
    assert (out / 'model_2.orbax').is_dir()
    assert not (out / 'checkpoint.pkl').exists()

    loaded = ckpt.load_checkpoint(str(out))
    assert loaded['epoch'] == 2
    assert loaded['meta']['shape'] == (3, 4)  # pickle side file keeps tuples.
    assert (jax.tree_util.tree_structure(loaded['state'])
            == jax.tree_util.tree_structure(state))
    for a, b in zip(jax.tree_util.tree_leaves(loaded['state']),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_latest_epoch_resolution(tmp_path, small_models):
    '''No rolling pointer file: "latest" is the max FINALIZED model_*.orbax
    epoch; an explicit epoch or a direct .orbax dir path also load.'''
    _, _, _, ev, _, _, _ = small_models
    out = tmp_path / 'ck'
    for e in (0, 2):
        ckpt.save_checkpoint(str(out), e,
                             {'params': ev['params'],
                              'step': jnp.asarray(e, jnp.int32)},
                             meta={'e': e}, format='orbax')
    ckpt.wait_for_async_saves()
    assert ckpt.load_checkpoint(str(out))['epoch'] == 2
    assert ckpt.load_checkpoint(str(out), epoch=0)['meta']['e'] == 0
    direct = ckpt.load_checkpoint(str(out / 'model_0.orbax'))
    assert direct['epoch'] == 0
    # An unfinalized (tmp) array dir must not be picked up as "latest".
    os.makedirs(out / 'model_9.orbax.orbax-checkpoint-tmp-123', exist_ok=True)
    assert ckpt.load_checkpoint(str(out))['epoch'] == 2


def test_resume_resolution_orbax_layout(tmp_path, small_models):
    '''`--resume v8` on an orbax-format run resolves to the checkpoint DIR
    (no rolling pkl exists); the pkl layout keeps resolving to checkpoint.pkl
    (config.py train_args; reference args.py:20-36 semantics).'''
    from occlusions4d_tpu.config import train_args
    _, _, _, ev, _, _, _ = small_models
    root = tmp_path / 'checkpoints'
    d = root / 'v8_np256'
    ckpt.save_checkpoint(str(d), 1, {'params': ev['params']}, meta={},
                         format='orbax')
    ckpt.wait_for_async_saves()
    cfg = train_args(['--resume', 'v8', '--checkpoint_root', str(root),
                      '--data_path', str(tmp_path), '--name', 'v8'])
    assert cfg.resume == str(d)

    d2 = root / 'v9_np256'
    ckpt.save_checkpoint(str(d2), 1, {'params': ev['params']}, meta={})
    cfg = train_args(['--resume', 'v9', '--checkpoint_root', str(root),
                      '--data_path', str(tmp_path), '--name', 'v9'])
    assert cfg.resume == os.path.join(str(d2), 'checkpoint.pkl')


def test_orbax_resave_preserves_old_copy_and_layout_arbitration(
        tmp_path, small_models):
    '''(a) Re-saving an existing epoch must never destroy the only finalized
    copy before its replacement exists (the old store is parked as .prev and
    the replacement written synchronously). (b) When BOTH native layouts
    coexist in one dir (a --checkpoint_format switch mid-experiment), the
    layout holding the NEWEST epoch wins everywhere — a stale rolling
    checkpoint.pkl must not shadow newer orbax epochs, and vice versa.'''
    _, _, _, ev, _, _, _ = small_models
    out = tmp_path / 'ck'

    # (a) re-save epoch 1 with different step values; latest content wins,
    # no .prev residue after a clean re-save.
    for step in (10, 20):
        ckpt.save_checkpoint(str(out), 1,
                             {'params': ev['params'],
                              'step': jnp.asarray(step, jnp.int32)},
                             meta={'step': step}, format='orbax')
    ckpt.wait_for_async_saves()
    assert not (out / 'model_1.orbax.prev').exists()
    assert ckpt.load_checkpoint(str(out))['meta']['step'] == 20

    # (b1) pkl epochs 0-2 (rolling at 2) + orbax epoch 3 -> orbax wins.
    for e in (0, 1, 2):
        ckpt.save_checkpoint(str(out), e, {'params': ev['params']},
                             meta={'fmt': 'pkl', 'e': e})
    ckpt.save_checkpoint(str(out), 3, {'params': ev['params']},
                         meta={'fmt': 'orbax', 'e': 3}, format='orbax')
    ckpt.wait_for_async_saves()
    assert ckpt.newest_native_layout(str(out)) == ('orbax', 3)
    assert ckpt.load_checkpoint(str(out))['meta'] == {'fmt': 'orbax', 'e': 3}
    # Explicit epochs still route to the format that holds them.
    assert ckpt.load_checkpoint(str(out), epoch=2)['meta']['fmt'] == 'pkl'
    assert ckpt.load_checkpoint(str(out), epoch=1)['meta']['fmt'] == 'pkl'

    # (b2) a newer pkl epoch flips the arbitration back.
    ckpt.save_checkpoint(str(out), 4, {'params': ev['params']},
                         meta={'fmt': 'pkl', 'e': 4})
    assert ckpt.newest_native_layout(str(out)) == ('pkl', 4)
    assert ckpt.load_checkpoint(str(out))['meta'] == {'fmt': 'pkl', 'e': 4}


def test_orbax_restore_into_target_decoupled_from_import_paths(
        tmp_path, small_models, monkeypatch):
    '''make_state_target restores must rebuild the state from the declarative
    leaf-path record + a caller-built template (params from pure dicts,
    optimizer state from a fresh tx.init) and must NEVER unpickle the stored
    treedef — so moving/renaming the optimizer or module classes between save
    and load cannot brick a checkpoint (round-4 verdict weak #4).'''
    import optax
    _, _, _, ev, _, _, _ = small_models
    params = {'encoder': ev['params']}
    tx = optax.adamw(1e-3)
    state = dict(params=params, opt_state=tx.init(params),
                 step=jnp.asarray(7, jnp.int32))
    out = tmp_path / 'ck'
    ckpt.save_checkpoint(str(out), 1, state, meta={'tag': 'x'}, format='orbax')
    ckpt.wait_for_async_saves()

    # Simulate the import-path refactor: the pickled treedef is unloadable.
    def _boom(_):
        raise ModuleNotFoundError('optimizer class moved between versions')
    monkeypatch.setattr(ckpt, '_UNPICKLE_TREEDEF', _boom)

    # Targetless load depends on the pickle and fails...
    with pytest.raises(ModuleNotFoundError):
        ckpt.load_checkpoint(str(out))

    # ...restore-into-target succeeds: exact leaves, live optax classes.
    def target(pure):
        return dict(params=pure['params'], opt_state=tx.init(pure['params']),
                    step=jnp.zeros((), jnp.int32))
    loaded = ckpt.load_checkpoint(str(out), make_state_target=target)
    assert loaded['epoch'] == 1 and loaded['meta']['tag'] == 'x'
    assert (jax.tree_util.tree_structure(loaded['state'])
            == jax.tree_util.tree_structure(state))
    for a, b in zip(jax.tree_util.tree_leaves(loaded['state']),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(loaded['state']['step']) == 7  # filled from the store.

    # A read-only consumer can target just the pure-dict subtrees (inference
    # needs only params): subset templates are valid.
    sub = ckpt.load_checkpoint(str(out), make_state_target=lambda pure: pure)
    assert _trees_equal(sub['state']['params'], params)

    # Targeting a leaf the store lacks is a clear error, not a silent zero.
    def bad(pure):
        return dict(params=pure['params'], extra=jnp.zeros((2,)))
    with pytest.raises(ValueError, match='does not hold'):
        ckpt.load_checkpoint(str(out), make_state_target=bad)


def test_orbax_orphaned_prev_recovered_on_load(tmp_path, small_models):
    '''A crash between parking model_{e}.orbax as .prev and finalizing its
    replacement leaves the .prev as the ONLY copy of that epoch; load must
    restore it (rename back) instead of silently resuming from an older epoch
    (round-4 advisor). An in-flight orbax tmp dir suppresses recovery.'''
    _, _, _, ev, _, _, _ = small_models
    out = tmp_path / 'ck'
    for e in (0, 1):
        ckpt.save_checkpoint(str(out), e, {'params': ev['params']},
                             meta={'e': e}, format='orbax')
    ckpt.wait_for_async_saves()
    # Simulate the crash window of a re-save of epoch 1.
    os.replace(out / 'model_1.orbax', out / 'model_1.orbax.prev')
    assert ckpt.load_checkpoint(str(out))['meta']['e'] == 1  # recovered.
    assert (out / 'model_1.orbax').is_dir()
    assert not (out / 'model_1.orbax.prev').exists()

    # A .prev whose replacement save is still in flight is left alone.
    os.replace(out / 'model_1.orbax', out / 'model_1.orbax.prev')
    os.makedirs(out / 'model_1.orbax.orbax-checkpoint-tmp-42')
    assert ckpt.load_checkpoint(str(out))['meta']['e'] == 0
    assert (out / 'model_1.orbax.prev').is_dir()


def test_cross_format_resume_legs(tmp_path, small_models):
    '''Cross-format resume through one run dir: a pkl run continued under
    --checkpoint_format orbax resumes from the orbax epoch, and vice versa,
    with the SAME make_state_target call the trainer uses (ignored by pkl,
    treedef-free for orbax).'''
    import optax
    _, _, _, ev, _, _, _ = small_models
    params = {'encoder': ev['params']}
    tx = optax.adamw(1e-3)

    def target(pure):
        return dict(params=pure['params'], opt_state=tx.init(pure['params']),
                    step=jnp.zeros((), jnp.int32))

    def mk_state(step):
        return dict(params=params, opt_state=tx.init(params),
                    step=jnp.asarray(step, jnp.int32))

    # pkl epoch 0 -> orbax epoch 1: resume picks orbax, template-restored.
    out = tmp_path / 'a'
    ckpt.save_checkpoint(str(out), 0, mk_state(10), meta={'e': 0})
    ckpt.save_checkpoint(str(out), 1, mk_state(20), meta={'e': 1},
                         format='orbax')
    ckpt.wait_for_async_saves()
    loaded = ckpt.load_checkpoint(str(out), make_state_target=target)
    assert loaded['epoch'] == 1 and int(loaded['state']['step']) == 20
    assert (jax.tree_util.tree_structure(loaded['state'])
            == jax.tree_util.tree_structure(mk_state(20)))

    # orbax epoch 0 -> pkl epoch 1: resume picks the pkl (target ignored).
    out2 = tmp_path / 'b'
    ckpt.save_checkpoint(str(out2), 0, mk_state(30), meta={'e': 0},
                         format='orbax')
    ckpt.wait_for_async_saves()
    ckpt.save_checkpoint(str(out2), 1, mk_state(40), meta={'e': 1})
    loaded = ckpt.load_checkpoint(str(out2), make_state_target=target)
    assert loaded['epoch'] == 1 and int(loaded['state']['step']) == 40
