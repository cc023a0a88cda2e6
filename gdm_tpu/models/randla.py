"""RandLA-Net point branch (flax, channels-last).

Mirrors reference ``models/RandLA/RandLANet.py``: fc0 + 4 dilated residual
blocks (Dilated_res_block :674-688, Building_block :691-738, Att_pooling
:741-754) and the decoder 1x1 blocks (:31-39).  Feature tensors are
[B, N, C]; neighbour gathers are [B, N, K, C] — XLA lowers the take +
reduce patterns onto the VPU, and all 1x1 convs are Dense (MXU).

The reference's random-sampling pooling keeps the first N/4 points of a
pre-shuffled cloud (linemod_pbr.py:538); the neighbour/pool/interp index
pyramid arrives precomputed in the input dict (built on device by
gdm_tpu.data.pipeline rather than by a CPU KD-tree per sample).

Activation/BN conventions follow models/RandLA/pytorch_utils.py, which
differs from the CNN-side models/pytorch_utils.py: the default conv
activation is LeakyReLU(0.2) (pytorch_utils.py:135,170 vs nn.ReLU on the
CNN side) and BN eps is 1e-6 (:108).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gdm_tpu.models.layers import DenseBNAct, leaky_relu02

# one-hot-matmul backward beats XLA's scatter-add only when the source
# point count is large (measured on v5e: 2.6x at N=4096, tie at N<=256)
_ONEHOT_BWD_MIN_N = 512

# trace-time switch for the one-hot backward contraction dtype.  None =
# exact (HIGHEST-precision f32, grads bit-match scatter-add).  'bfloat16'
# runs the MXU contraction in bf16 with f32 accumulation — ~2x faster on
# the gather-bound RandLA backward at the cost of ~0.4% relative gradient
# noise.  Read when the train step is TRACED: call before the first jit
# execution (cli wires ModelConfig.gather_bwd_dtype through this).
_GATHER_BWD_DTYPE = None


def set_gather_bwd_dtype(dtype) -> None:
    """Set the neighbour-gather backward dtype ('bfloat16'/'float32'/None)."""
    global _GATHER_BWD_DTYPE
    _GATHER_BWD_DTYPE = (None if dtype in (None, "float32")
                         else jnp.dtype(dtype))


@jax.custom_vjp
def gather_neighbours_b(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched neighbour gather: [B,N,C] by [B,M,K] -> [B,M,K,C].

    Functional equivalent of Building_block.gather_neighbour
    (RandLANet.py:729-738).  TPU tuning (both measured ~1.5-2.6x faster
    than the naive vmap(take) / its scatter-add VJP at N=4096):
      * forward: one flat row gather over [B*N, C] with batch offsets;
      * backward: cotangent scatter-add expressed as a one-hot
        contraction — XLA fuses the one-hot into the MXU matmul, so the
        [M*K, N] matrix never materialises.
    """
    return _gather_fwd_impl(feats, idx)


def _gather_fwd_impl(feats, idx):
    b, n, c = feats.shape
    off = (jnp.arange(b, dtype=idx.dtype) * n).reshape(
        (b,) + (1,) * (idx.ndim - 1))
    flat = jnp.take(feats.reshape(b * n, c), (idx + off).reshape(-1),
                    axis=0)
    return flat.reshape(idx.shape + (c,))


def _gather_fwd(feats, idx):
    return _gather_fwd_impl(feats, idx), (idx, feats.shape)


def _gather_bwd(res, ct):
    idx, (b, n, c) = res
    rows = int(np.prod(idx.shape[1:]))
    ct2 = ct.reshape(b, rows, c)
    idx2 = idx.reshape(b, rows)
    if n >= _ONEHOT_BWD_MIN_N:
        bwd_dtype = _GATHER_BWD_DTYPE

        def one(c1, i1):
            dt = bwd_dtype or c1.dtype
            oh = jax.nn.one_hot(i1, n, dtype=dt)           # fused, [rows,n]
            # default (bwd_dtype None): HIGHEST so grads match scatter-add
            # exactly (with one-hot operands the f32 passes add no
            # measurable cost); bf16 mode trades ~0.4% grad noise for ~2x
            return jax.lax.dot_general(
                c1.astype(dt), oh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.DEFAULT if bwd_dtype
                           else jax.lax.Precision.HIGHEST)).T   # [n, c]
        dfeats = jax.vmap(one)(ct2, idx2)
    else:
        dfeats = jax.vmap(lambda c1, i1: jax.ops.segment_sum(
            c1, i1, num_segments=n))(ct2, idx2)
    return dfeats.astype(ct.dtype), np.zeros(idx.shape, jax.dtypes.float0)


gather_neighbours_b.defvjp(_gather_fwd, _gather_bwd)


def max_pool_neighbours(feats: jax.Array, pool_idx: jax.Array) -> jax.Array:
    """random_sample parity (RandLANet.py:90-105): gather [B,M,K] neighbour
    features and max over K -> [B,M,C].

    TRIED AND REJECTED (2026-08-17): a fused custom VJP that scatters
    only the argmax row per (point, channel) — M*C updates instead of
    the composed VJP's M*K-row one-hot contraction.  Numerically exact,
    but the per-channel scatter-add measured 562-640 ms/step vs 193-290
    for the composed path at b=24: TPU scatters with channel-varying
    rows serialize, while XLA turns the composed max-grad + one-hot into
    fused MXU work.  Keep the composed form.
    """
    return jnp.max(gather_neighbours_b(feats, pool_idx), axis=2)


def nearest_upsample(feats: jax.Array, interp_idx: jax.Array) -> jax.Array:
    """nearest_interpolation parity (RandLANet.py:107-120): [B,M,1] or
    [B,M] nearest-neighbour index gather -> [B,M,C]."""
    if interp_idx.ndim == 3:
        interp_idx = interp_idx[..., 0]
    return gather_neighbours_b(feats, interp_idx)


class AttPooling(nn.Module):
    """Attentive pooling over the K neighbour axis (RandLANet.py:741-754)."""

    d_out: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        # x: [B, N, K, C]
        att = nn.Dense(x.shape[-1], use_bias=False, name="fc",
                       dtype=self.dtype)(x)
        scores = jax.nn.softmax(att, axis=2)
        agg = jnp.sum(x * scores, axis=2)                 # [B, N, C]
        return DenseBNAct(self.d_out, name="mlp", act=leaky_relu02, bn_eps=1e-6,
                          dtype=self.dtype)(agg, train, momentum)


class BuildingBlock(nn.Module):
    """Local feature aggregation (RandLANet.py:691-738)."""

    d_out: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, neigh_idx, train: bool, momentum=0.1):
        # xyz and feats share neigh_idx, so gather them as ONE wide row
        # gather: on the v5e a [8x4096,16] gather is row-count-bound, not
        # width-bound (C=3: 4.9 ms, C=35: 3.5 ms; 3-wide + 32-wide pair
        # 4.9 ms vs 2.5 ms fused, 2026-08-18) — the (8,128) layout pads
        # narrow rows to full lanes either way.  Numerics are unchanged
        # (the gather is exact; feats round-trip through f32 losslessly).
        # Under compute_dtype=bfloat16 the f32 concat widens this one
        # gather's cotangent to f32, but the bwd one-hot contraction is
        # row-count bound too: bf16 train throughput measured unchanged
        # (122.2 vs 123 samples/s at b=24).  Do NOT cast xyz to bf16
        # instead — neighbour deltas of ~1 mm on ~0.1 m coordinates
        # would lose ~40% relative accuracy to bf16 rounding.
        both = gather_neighbours_b(
            jnp.concatenate([xyz, feats.astype(jnp.float32)], axis=-1),
            neigh_idx)
        neigh_xyz = both[..., :3]
        f_neigh = both[..., 3:].astype(feats.dtype)

        # relative position encoding: [B, N, K, 10] (RandLANet.py:720-727)
        xyz_tile = jnp.broadcast_to(
            xyz[:, :, None, :], neigh_xyz.shape)
        rel = xyz_tile - neigh_xyz
        dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
        f_xyz = jnp.concatenate([dist, rel, xyz_tile, neigh_xyz], axis=-1)
        f_xyz = f_xyz.astype(self.dtype)

        f_xyz1 = DenseBNAct(self.d_out // 2, name="mlp1", act=leaky_relu02,
                            bn_eps=1e-6, dtype=self.dtype)(f_xyz, train, momentum)
        agg1 = AttPooling(self.d_out // 2, name="att_pooling_1",
                          dtype=self.dtype)(
            jnp.concatenate([f_neigh, f_xyz1], axis=-1), train, momentum)

        f_xyz2 = DenseBNAct(self.d_out // 2, name="mlp2", act=leaky_relu02,
                            bn_eps=1e-6, dtype=self.dtype)(f_xyz1, train, momentum)
        f_neigh2 = gather_neighbours_b(agg1, neigh_idx)
        return AttPooling(self.d_out, name="att_pooling_2",
                          dtype=self.dtype)(
            jnp.concatenate([f_neigh2, f_xyz2], axis=-1), train, momentum)


class DilatedResBlock(nn.Module):
    """RandLANet.py:674-688."""

    d_out: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, feats, xyz, neigh_idx, train: bool, momentum=0.1):
        f = DenseBNAct(self.d_out // 2, name="mlp1", act=leaky_relu02,
                       bn_eps=1e-6, dtype=self.dtype)(feats, train, momentum)
        f = BuildingBlock(self.d_out, name="lfa", dtype=self.dtype)(
            xyz, f, neigh_idx, train, momentum)
        f = DenseBNAct(2 * self.d_out, act=None, name="mlp2", bn_eps=1e-6,
                       dtype=self.dtype)(f, train, momentum)
        sc = DenseBNAct(2 * self.d_out, act=None, name="shortcut", bn_eps=1e-6,
                        dtype=self.dtype)(feats, train, momentum)
        return leaky_relu02(f + sc)


class RandLAEncoder(nn.Module):
    """fc0 + the dilated residual block stack, exposed stage-wise so the
    FFB6D fusion can interleave (the reference reuses rndla.fc0 /
    rndla.dilated_res_blocks / rndla.decoder_blocks directly,
    ffb6d.py:28,40,90)."""

    d_out: tuple = (32, 64, 128, 256)
    dtype: object = jnp.float32

    def setup(self):
        self.fc0 = DenseBNAct(8, name="fc0", act=leaky_relu02, bn_eps=1e-6,
                             dtype=self.dtype)
        self.ds_blocks = [
            DilatedResBlock(d, name=f"ds_{i}", dtype=self.dtype)
            for i, d in enumerate(self.d_out)
        ]
        # decoder widths per RandLANet.py:31-39 given d_out=(32,64,128,256)
        dec_widths = []
        d_prev = 2 * self.d_out[-1]
        for j in range(len(self.d_out)):
            if j < 3:
                w = 2 * self.d_out[-j - 2]
            else:
                w = 2 * self.d_out[0]
            dec_widths.append(w)
            d_prev = w
        self.up_blocks = [
            DenseBNAct(w, name=f"up_{j}", act=leaky_relu02, bn_eps=1e-6,
                       dtype=self.dtype)
            for j, w in enumerate(dec_widths)
        ]
