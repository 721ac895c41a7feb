'''
Training pipeline: one functional forward = encode input video -> per predicted frame:
guided query sampling -> field evaluation -> masked losses.

Capability parity with MyTrainPipeline (/root/reference/pipeline.py:20-234). The
reference wraps this in torch.nn.DataParallel and splits loss work into
per_example (scattered) vs entire_batch (gathered on GPU 0); here the whole step is
one pure function of (params, batch, rng) - vmapped over examples where the reference
relied on per-GPU scatter, jitted once, and batch-sharded over the mesh by the caller.

Color squash/clamp semantics follow pipeline.py:199-212: density stays a logit for the
BCE; rgb gets sigmoid, rgb_nosigmoid/hsv get clamps, bins stays logits.
'''

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .losses import LossConfig, per_example_losses, total_loss
from .sampler import GuidedPointSampler, SamplerConfig

__all__ = ['PipelineConfig', 'TrainPipeline', 'squash_colors']


def squash_colors(out, color_mode):
    '''Train-time squash (pipeline.py:199-212); density left as logit.'''
    if color_mode == 'rgb':
        return out.at[..., 1:4].set(jax.nn.sigmoid(out[..., 1:4]))
    if color_mode == 'rgb_nosigmoid':
        return out.at[..., 1:4].set(jnp.clip(out[..., 1:4], 0.0, 1.0))
    if color_mode == 'hsv':
        return out.at[..., 13:15].set(jnp.clip(out[..., 13:15], 0.0, 1.0))
    if color_mode == 'bins':
        return out
    raise ValueError(color_mode)


def _numerics_probe(name, x):
    '''Explicit NaN/Inf probe at a named tensor boundary — the TPU analogue of
    the reference's compile-out debug detectors (_CHECK_NAN_INF,
    /root/reference/pipeline.py:17,113; _CHECK_NAN, /root/reference/loss.py:12,
    61,151). Only traced when the pipeline was built with debug_checks=True,
    and only functionalized when the caller wraps the step in
    checkify.checkify(..., errors=user_checks) (train.py --check_numerics);
    tensor-level probes keep the checkify graph small where op-level
    float_checks made compilation intractable.'''
    from jax.experimental import checkify
    ok = jnp.all(jnp.isfinite(x.astype(jnp.float32)))
    checkify.check(ok, 'NaN/Inf detected in ' + name)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    color_mode: str = 'rgb'
    semantic_classes: int = 13
    past_frames: int = 2
    future_frames: int = 0
    density_lw: float = 1.0
    color_lw: float = 0.0
    segmentation_lw: float = 0.0
    tracking_lw: float = 0.0

    @property
    def num_frames(self):
        return self.past_frames + self.future_frames

    @property
    def loss_config(self):
        return LossConfig(color_mode=self.color_mode,
                          semantic_classes=self.semantic_classes,
                          density_lw=self.density_lw, color_lw=self.color_lw,
                          segmentation_lw=self.segmentation_lw,
                          tracking_lw=self.tracking_lw)


class TrainPipeline:
    '''Pure-function training forward. Construct once; call .loss / .forward in jit.'''

    def __init__(self, encoder, decoder, sampler_cfg: SamplerConfig,
                 cfg: PipelineConfig, remat=True, fused_decoder='auto',
                 fused_decoder_dtype='auto', debug_checks=False):
        '''
        :param fused_decoder ('auto'|'on'|'off'): run the per-frame field
            evaluation through the fused Pallas kernels with their custom-VJP
            backward kernels (ops/pallas_attention.py) instead of the XLA
            module path. The decoder's XLA fwd+bwd is 63% of the gv1 train
            step; the fused kernels recompute flash-attention-style per query
            tile, so the (N, K, D) neighbor tensors never reach HBM in either
            direction. 'auto' = on for TPU backends when the configuration is
            covered (supports_fused). Gradient parity vs the module path is
            asserted by tests/test_pallas_ops.py::test_fused_field_grads_*.
        :param fused_decoder_dtype ('auto'|'bf16'|'f32'): compute dtype inside
            the fused kernels. 'auto' = bf16 on TPU, f32 elsewhere. When the
            fused path is active this governs the decoder's train numerics
            regardless of any model-level mixed_precision setting (see
            config.py TrainConfig.fused_decoder).
        '''
        from .models.fused import fused_field_apply, supports_fused
        self.debug_checks = debug_checks
        self.encoder = encoder
        self.decoder = decoder
        self.sampler = GuidedPointSampler(sampler_cfg)
        self.cfg = cfg
        use_fused = (fused_decoder == 'on'
                     or (fused_decoder == 'auto'
                         and jax.default_backend() == 'tpu'))
        use_fused = use_fused and supports_fused(decoder)
        self.fused_decoder = use_fused
        if use_fused:
            cd = {'bf16': jnp.bfloat16, 'f32': jnp.float32}.get(
                fused_decoder_dtype,
                jnp.bfloat16 if jax.default_backend() == 'tpu'
                else jnp.float32)
            # No outer remat: the custom backward kernels recompute the
            # forward per query tile internally (VMEM-bounded), and the saved
            # residuals are just the kernel inputs.
            self._decode_frame = lambda p, q, a, g: fused_field_apply(
                decoder, p, q, a, g, compute_dtype=cd)[0]
        else:
            # Rematerialize each frame's field evaluation in the backward pass:
            # the decoder's (N, K, D) attention intermediates across
            # past_frames frames are the peak-memory driver (a gv1 step
            # otherwise needs ~23 GB, past the 16 GB v5e HBM; the reference
            # needed 48 GB across 3 GPUs for the same reason,
            # /root/reference/README.md:46).
            dec_fwd = lambda p, q, a, g: self.decoder.apply(p, q, a, g)[0]
            self._decode_frame = jax.checkpoint(dec_fwd) if remat else dec_fwd

    def forward(self, params, batch, rng, return_intermediate=False):
        '''
        :param params: {'encoder': variables, 'decoder': variables}.
        :param batch: dict of device arrays:
            pcl_input (B, N, 8) - (x, y, z, R, G, B, t, mark_track);
            pcl_target (B, T, M, E) padded; pcl_target_valid (B, T, M) bool;
            valo_ids (B, R) int32; num_valo_ids (B,) int32.
        :param rng: PRNG key (fps randomness + query sampling).
        :return (losses dict, aux dict).
        '''
        cfg = self.cfg
        T = cfg.num_frames
        pcl_input = batch['pcl_input']
        pcl_target = batch['pcl_target']
        tgt_valid = batch['pcl_target_valid']
        (B, T_data, M, E) = pcl_target.shape
        assert T_data == T, (T_data, T)

        rng, k_fps = jax.random.split(rng)
        bn_updates = None
        if 'batch_stats' in params['encoder']:
            # pt_norm_type='batch': run in train mode and surface the updated
            # running statistics (merged into the state by the train step; they
            # carry no gradient and are masked out of the optimizer).
            (abstract, feats_global, layer_coords), mut = self.encoder.apply(
                params['encoder'], pcl_input, return_intermediate, True,
                rngs={'fps': k_fps}, mutable=['batch_stats'])
            bn_updates = mut['batch_stats']
        else:
            abstract, feats_global, layer_coords = self.encoder.apply(
                params['encoder'], pcl_input, return_intermediate,
                rngs={'fps': k_fps})

        if self.debug_checks:
            _numerics_probe('pcl_input', pcl_input)
            _numerics_probe('encoder_abstract', abstract)
            _numerics_probe('encoder_global', feats_global)

        outputs, targets, queries = [], [], []
        solid_sbs, air_sbs, oks = [], [], []
        for t in range(T):
            rng, k_other, k_sample = jax.random.split(rng, 3)
            # Random *other* frame for dynamic-region supervision, drawn per
            # example like the reference's per-example sampler loop
            # (geometry.py:651-659): a batch-shared draw would narrow the
            # 'moving'-bias supervision distribution at larger batch sizes.
            if T > 1:
                other_t = jax.random.randint(k_other, (B,), 0, T - 1)
                other_t = jnp.where(other_t == t, other_t + 1, other_t)
            else:
                other_t = jnp.zeros((B,), jnp.int32)
            tgt_t = pcl_target[:, t]
            val_t = tgt_valid[:, t]
            tgt_o = jnp.take_along_axis(
                pcl_target, other_t[:, None, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            val_o = jnp.take_along_axis(
                tgt_valid, other_t[:, None, None].astype(jnp.int32), axis=1)[:, 0]

            keys = jax.random.split(k_sample, B)
            sample = jax.vmap(
                lambda k, tt, vt, to, vo, vi, nv: self.sampler.sample_frame(
                    k, tt, vt, to, vo, vi, nv, t)
            )(keys, tgt_t, val_t, tgt_o, val_o, batch['valo_ids'],
              batch['num_valo_ids'])

            # Forward all solid + air points of the frame at once (pipeline.py:179-182).
            # stop_gradient: queries/targets are sampled data, as in the reference
            # (leaf tensors, requires_grad=False) - pins the semantics rather than
            # relying on XLA to dead-code the sampler transpose.
            points_query = jax.lax.stop_gradient(jnp.concatenate(
                [sample['solid_input'], sample['air_input']], axis=1))   # (B, S+A, 4).
            implicit_target = jax.lax.stop_gradient(jnp.concatenate(
                [sample['solid_target'], sample['air_target']], axis=1))  # (B, S+A, 6).

            out = self._decode_frame(params['decoder'], points_query, abstract,
                                     feats_global)
            out = squash_colors(out, cfg.color_mode)
            if self.debug_checks:
                _numerics_probe(f'decoder_output_frame{t}', out)

            outputs.append(out)
            targets.append(implicit_target)
            queries.append(points_query)
            solid_sbs.append(sample['solid_sbs'])
            air_sbs.append(sample['air_sbs'])
            oks.append(sample['ok'])

        output = jnp.stack(outputs, axis=1)     # (B, T, S+A, C).
        target = jnp.stack(targets, axis=1)     # (B, T, S+A, 6).
        ok_bt = jnp.stack(oks, axis=1)          # (B, T) sampler validity.

        losses = per_example_losses(output, target, cfg.loss_config,
                                    frame_weight=ok_bt)
        if self.debug_checks:
            for k in sorted(losses):
                _numerics_probe('loss_' + k, losses[k])
        aux = dict(
            abstract=abstract, features_global=feats_global,
            points_query=jnp.stack(queries, axis=1), implicit_output=output,
            implicit_target=target,
            solid_sbs=jnp.stack(solid_sbs, 1).mean(axis=(0, 1)),
            air_sbs=jnp.stack(air_sbs, 1).mean(axis=(0, 1)),
            sample_ok=ok_bt.all(),
            sample_ok_frac=ok_bt.mean(),
            layer_coords=layer_coords,
            batch_stats=bn_updates,
        )
        return losses, aux

    def loss(self, params, batch, rng):
        '''Scalar objective for jax.grad.'''
        losses, aux = self.forward(params, batch, rng)
        return total_loss(losses, self.cfg.loss_config), (losses, aux)
