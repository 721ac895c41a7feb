'''
Pallas TPU kernel for farthest point sampling.

FPS is inherently sequential (each pick is an argmax over a running min-distance
field, /root/reference/model/modules.py:133-134 via torch_cluster's CUDA kernel), so
the XLA `fori_loop` version in ops/fps.py pays per-iteration dispatch overhead for
thousands of tiny steps (~40 us/step, ~280 ms of a 360 ms encoder forward at
n_points=14336). This kernel runs the whole loop on-core: coordinates, the running
min-distance field, and the validity penalty stay resident in VMEM, and each
iteration is a handful of (R, 128) VPU passes:

    d      = (x - px)^2 + (y - py)^2 + (z - pz)^2     # distance to last pick
    min_d  = min(min_d, d)                            # running field update
    scores = min_d + penalty                          # -inf at invalid/padded slots
    next   = first index attaining max(scores)        # two VPU reductions

Semantics are identical to ops.fps.fps (same picks, including first-index tie
breaking), verified by tests/test_pallas_ops.py.
'''

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fps_pallas', 'fps_pallas_batched', 'pallas_supported']

_LANES = 128


def pallas_supported():
    '''Mosaic-compiled kernels need a real TPU backend.'''
    return jax.default_backend() == 'tpu'


def _fps_kernel(start_ref, xyz_ref, penalty_ref, out_ref, mind_ref, *, n_out, n_pad):
    '''
    Block shapes carry a leading per-example dim of 1 from the (B,) grid:
    :param start_ref (B, 1) SMEM int32: per-example first selected point (whole
        array; indexed with program_id since SMEM blocks cannot split a dim of B).
    :param xyz_ref (1, 3, R, 128) VMEM f32: padded coordinates, channel-major.
    :param penalty_ref (1, R, 128) VMEM f32: 0 at valid points, -inf at invalid/pad.
    :param out_ref (1, ceil(n_out/128), 128) VMEM int32: selected indices
        (row-major flat order, unsorted; tail of the last row is undefined).
    :param mind_ref (R, 128) VMEM f32 scratch: running min squared distance.
    '''
    (R, C) = mind_ref.shape
    mind_ref[:] = jnp.full((R, C), jnp.inf, jnp.float32)
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
                + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

    start = start_ref[pl.program_id(0), 0]
    # Scalar stores to VMEM are not supported: picks accumulate in a (1, C)
    # register row, flushed to the output whenever a row fills (or at the end).
    buf0 = jnp.where(lane == 0, start, 0)

    def body(i, carry):
        last, buf = carry
        r = last // C
        c = last % C
        # Mosaic cannot load a scalar at a dynamic lane offset: slice the pick's
        # row (dynamic sublane index) and reduce over a lane mask instead.
        sel = (lane == c).astype(jnp.float32)                          # (1, C).
        px = jnp.sum(xyz_ref[0, 0, pl.ds(r, 1), :] * sel)
        py = jnp.sum(xyz_ref[0, 1, pl.ds(r, 1), :] * sel)
        pz = jnp.sum(xyz_ref[0, 2, pl.ds(r, 1), :] * sel)
        d = (jnp.square(xyz_ref[0, 0] - px) + jnp.square(xyz_ref[0, 1] - py)
             + jnp.square(xyz_ref[0, 2] - pz))
        md = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = md
        scores = md + penalty_ref[0]
        m = jnp.max(scores)
        # First index attaining the max (mirrors jnp.argmax tie behavior).
        nxt = jnp.min(jnp.where(scores >= m, flat_idx, n_pad)).astype(jnp.int32)
        buf = jnp.where(lane == i % C, nxt, buf)

        @pl.when((i % C == C - 1) | (i == n_out - 1))
        def _():
            out_ref[0, pl.ds(i // C, 1)] = buf

        return (nxt, buf)

    if n_out == 1:  # static: the loop below never runs, flush the start pick.
        out_ref[0, pl.ds(0, 1)] = buf0
    jax.lax.fori_loop(1, n_out, body, (start, buf0))


@functools.partial(jax.jit, static_argnums=(1,))
def _fps_pallas_call(xyz_pad, n_out, penalty, start_idx):
    '''
    :param xyz_pad (B, 3, R, 128) f32; penalty (B, R, 128) f32; start_idx (B,) int32.
    :return (B, n_out) int32 flat indices.
    '''
    (B, _, R, C) = xyz_pad.shape
    n_out_rows = -(-n_out // C)
    kern = functools.partial(_fps_kernel, n_out=n_out, n_pad=R * C)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, R, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_out_rows, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out_rows, C), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, C), jnp.float32)],
        interpret=jax.default_backend() != 'tpu',
    )(start_idx[:, None], xyz_pad, penalty)
    return out.reshape(B, n_out_rows * C)[:, :n_out]


def fps_pallas_batched(xyz, n_out, *, valid=None, start_idx=None, sort_result=True):
    '''
    Batched farthest point sampling via the Pallas kernel.
    :param xyz (B, N, C>=3) array.
    :param n_out (int, static).
    :param valid (B, N) bool or None.
    :param start_idx (B,) int32 or None (deterministic start 0).
    :return (B, n_out) int32 indices into N, sorted ascending when sort_result.
    '''
    xyz = jnp.asarray(xyz)[..., :3].astype(jnp.float32)
    (B, N, _) = xyz.shape
    R = -(-N // _LANES)
    n_pad = R * _LANES

    xyz_p = jnp.pad(xyz, ((0, 0), (0, n_pad - N), (0, 0)))
    xyz_p = jnp.transpose(xyz_p, (0, 2, 1)).reshape(B, 3, R, _LANES)
    in_play = jnp.arange(n_pad) < N
    if valid is not None:
        valid_p = jnp.pad(jnp.asarray(valid), ((0, 0), (0, n_pad - N)))
        in_play = in_play[None, :] & valid_p
    in_play = jnp.broadcast_to(in_play, (B, n_pad))
    penalty = jnp.where(in_play, 0.0, -jnp.inf).astype(jnp.float32)
    penalty = penalty.reshape(B, R, _LANES)
    if start_idx is None:
        start_idx = jnp.zeros((B,), jnp.int32)
    else:
        start_idx = jnp.asarray(start_idx, jnp.int32)

    sel = _fps_pallas_call(xyz_p, int(n_out), penalty, start_idx)
    return jnp.sort(sel, axis=-1) if sort_result else sel


def fps_pallas(xyz, n_out, *, valid=None, start_idx=0, sort_result=True):
    '''Single-cloud variant; see fps_pallas_batched.'''
    out = fps_pallas_batched(
        jnp.asarray(xyz)[None], n_out,
        valid=None if valid is None else jnp.asarray(valid)[None],
        start_idx=jnp.asarray([start_idx], jnp.int32), sort_result=sort_result)
    return out[0]
