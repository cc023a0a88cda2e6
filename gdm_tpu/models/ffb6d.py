"""FFB6D dual-branch encoder with bidirectional pixel<->point fusion.

Mirrors reference ``models/ffb6d.py`` (FFB6DEmb.forward :172-285): four
CNN/RandLA downsample stages with r2p/p2r fusion at each, three fused
upsample stages, a final upsample on both branches, and gather-at-`choose`
concatenation into the 128-d rgbd embedding.

TPU re-design notes:
  * NHWC images / [B,N,C] points; every fusion gather is a batched take,
    every 1x1 conv a Dense — no reshape/permute churn.
  * All KNN index pyramids arrive as inputs (built on device inside the
    same jit by gdm_tpu.data.pipeline.build_pyramid — the reference built
    them with a CPU KD-tree in Dataset.__getitem__, its largest CPU cost).
  * `choose` indexes into the final 256x256 CNN map exactly like
    torch.gather(rgb_emb_c, 2, choose) at ffb6d.py:278-281.

Input dict keys match the reference dataset contract (linemod_pbr.py:543-569):
  rgb [B,H,W,3], cld_rgb_nrm [B,N,9], choose [B,N],
  cld_xyz{0..3} [B,Ni,3], cld_nei_idx{0..3} [B,Ni,16],
  cld_sub_idx{0..3} [B,Ni/4,16], cld_interp_idx{0..3} [B,Ni,1],
  r2p_ds_nei_idx{0..3} [B,Ni/4,16], p2r_ds_nei_idx{0..3} [B,hw_i,1],
  r2p_up_nei_idx{0..2} [B,Nj,16], p2r_up_nei_idx{0..2} [B,hw_j,1]
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gdm_tpu.models.layers import DenseBNAct
from gdm_tpu.models.pspnet import PSPNetFeats
from gdm_tpu.models.randla import (
    RandLAEncoder,
    max_pool_neighbours,
    nearest_upsample,
    gather_neighbours_b,
)


class FFB6DEmb(nn.Module):
    d_out: tuple = (32, 64, 128, 256)
    dtype: object = jnp.float32

    def setup(self):
        self.cnn = PSPNetFeats(name="cnn", dtype=self.dtype)
        self.rndla = RandLAEncoder(self.d_out, name="rndla",
                                   dtype=self.dtype)

        ds_rgb_oc = (64, 128, 512, 1024)
        ds_rndla_oc = tuple(2 * d for d in self.d_out)    # (64,128,256,512)
        self.ds_rgb_oc = ds_rgb_oc
        self.ds_rndla_oc = ds_rndla_oc

        self.ds_r2p_pre = [
            DenseBNAct(ds_rndla_oc[i], name=f"ds_r2p_pre_{i}",
                       dtype=self.dtype)
            for i in range(4)]
        self.ds_r2p_fuse = [
            DenseBNAct(ds_rndla_oc[i], name=f"ds_r2p_fuse_{i}",
                       dtype=self.dtype)
            for i in range(4)]
        self.ds_p2r_pre = [
            DenseBNAct(ds_rgb_oc[i], name=f"ds_p2r_pre_{i}",
                       dtype=self.dtype)
            for i in range(4)]
        self.ds_p2r_fuse = [
            DenseBNAct(ds_rgb_oc[i], name=f"ds_p2r_fuse_{i}",
                       dtype=self.dtype)
            for i in range(4)]

        up_rgb_oc = (256, 64, 64)
        up_rndla_oc = (ds_rndla_oc[-2], ds_rndla_oc[-3], ds_rndla_oc[-4])
        self.up_rgb_oc = up_rgb_oc
        self.up_rndla_oc = up_rndla_oc
        self.up_r2p_pre = [
            DenseBNAct(up_rndla_oc[i], name=f"up_r2p_pre_{i}",
                       dtype=self.dtype)
            for i in range(3)]
        self.up_r2p_fuse = [
            DenseBNAct(up_rndla_oc[i], name=f"up_r2p_fuse_{i}",
                       dtype=self.dtype)
            for i in range(3)]
        self.up_p2r_pre = [
            DenseBNAct(up_rgb_oc[i], name=f"up_p2r_pre_{i}",
                       dtype=self.dtype)
            for i in range(3)]
        self.up_p2r_fuse = [
            DenseBNAct(up_rgb_oc[i], name=f"up_p2r_fuse_{i}",
                       dtype=self.dtype)
            for i in range(3)]
        self.drop_psp = nn.Dropout(0.3, name="drop_psp")
        self.drop_up = [nn.Dropout(0.15, name=f"drop_up_{i}")
                        for i in range(2)]

    def _cnn_ds_stage(self, i, x, train, momentum):
        """cnn_ds_stages parity (ffb6d.py:31-37)."""
        if i == 0:
            return self.cnn.feats.stage(0, x, train, momentum)
        if i == 1:
            return self.cnn.feats.stage(1, x, train, momentum)
        if i == 2:
            y = self.cnn.feats.stage(2, x, train, momentum)
            return self.cnn.feats.stage(3, y, train, momentum)
        y = self.cnn.psp(x, train, momentum)
        return self.drop_psp(y, deterministic=not train)

    def _cnn_up_stage(self, i, x, train, momentum):
        """cnn_up_stages parity (ffb6d.py:76-81)."""
        if i == 0:
            return self.drop_up[0](self.cnn.up_1(x, train, momentum),
                                   deterministic=not train)
        if i == 1:
            return self.drop_up[1](self.cnn.up_2(x, train, momentum),
                                   deterministic=not train)
        if i == 2:
            return self.cnn.final(x)
        return self.cnn.final(self.cnn.up_3(x, train, momentum))

    def __call__(self, inputs, train: bool = False, momentum=0.1):
        bs, h, w, _ = inputs["rgb"].shape

        # pre stages (cast activations to the compute dtype once here;
        # BatchNorm keeps statistics in f32 internally)
        rgb = self.cnn.feats.stem(
            inputs["rgb"].astype(self.dtype), train, momentum)
        p = self.rndla.fc0(
            inputs["cld_rgb_nrm"].astype(self.dtype), train, momentum)

        # ----------------- encoding -----------------
        ds_emb = []
        for i in range(4):
            rgb0 = self._cnn_ds_stage(i, rgb, train, momentum)
            hr, wr = rgb0.shape[1], rgb0.shape[2]

            f_enc = self.rndla.ds_blocks[i](
                p, inputs[f"cld_xyz{i}"], inputs[f"cld_nei_idx{i}"],
                train, momentum)
            p0 = max_pool_neighbours(f_enc, inputs[f"cld_sub_idx{i}"])
            if i == 0:
                ds_emb.append(f_enc)

            # point -> rgb
            p2r = self.ds_p2r_pre[i](p0, train, momentum)
            p2r = nearest_upsample(p2r, inputs[f"p2r_ds_nei_idx{i}"])
            p2r = p2r.reshape(bs, hr, wr, -1)
            rgb = self.ds_p2r_fuse[i](
                jnp.concatenate([rgb0, p2r], axis=-1), train, momentum)

            # rgb -> point
            rgb_flat = rgb0.reshape(bs, hr * wr, -1)
            r2p = max_pool_neighbours(rgb_flat, inputs[f"r2p_ds_nei_idx{i}"])
            r2p = self.ds_r2p_pre[i](r2p, train, momentum)
            p = self.ds_r2p_fuse[i](
                jnp.concatenate([p0, r2p], axis=-1), train, momentum)
            ds_emb.append(p)

        # ----------------- decoding -----------------
        for i in range(3):
            rgb0 = self._cnn_up_stage(i, rgb, train, momentum)
            hr, wr = rgb0.shape[1], rgb0.shape[2]

            f_interp = nearest_upsample(p, inputs[f"cld_interp_idx{3 - i}"])
            p0 = self.rndla.up_blocks[i](
                jnp.concatenate([ds_emb[-i - 2], f_interp], axis=-1),
                train, momentum)

            p2r = self.up_p2r_pre[i](p0, train, momentum)
            p2r = nearest_upsample(p2r, inputs[f"p2r_up_nei_idx{i}"])
            p2r = p2r.reshape(bs, hr, wr, -1)
            rgb = self.up_p2r_fuse[i](
                jnp.concatenate([rgb0, p2r], axis=-1), train, momentum)

            rgb_flat = rgb0.reshape(bs, hr * wr, -1)
            r2p = max_pool_neighbours(rgb_flat, inputs[f"r2p_up_nei_idx{i}"])
            r2p = self.up_r2p_pre[i](r2p, train, momentum)
            p = self.up_r2p_fuse[i](
                jnp.concatenate([p0, r2p], axis=-1), train, momentum)

        # final upsample on both branches (ffb6d.py:269-276)
        rgb = self._cnn_up_stage(3, rgb, train, momentum)
        f_interp = nearest_upsample(p, inputs["cld_interp_idx0"])
        p = self.rndla.up_blocks[3](
            jnp.concatenate([ds_emb[0], f_interp], axis=-1), train, momentum)

        # gather CNN features at the chosen pixels (ffb6d.py:278-281)
        rgb_flat = rgb.reshape(bs, rgb.shape[1] * rgb.shape[2], -1)
        choose = inputs["choose"]
        if choose.ndim == 3:                              # [B,1,N] legacy
            choose = choose[:, 0, :]
        rgb_c = gather_neighbours_b(rgb_flat, choose)     # [B, N, 64]

        return jnp.concatenate([rgb_c, p], axis=-1)       # [B, N, 128]
