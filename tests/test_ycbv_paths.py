"""YCBV-specific dataset behaviours: depth hole filling, real/pbr
sampling mix, fill-aware device finalize."""

import numpy as np
import pytest

import conftest  # noqa: F401
from gdm_tpu.data.augment import fill_depth_fast
from gdm_tpu.data.dataset import PoseDataset


class TestFillDepth:
    def test_fills_interior_holes(self):
        d = np.full((64, 64), 0.8, np.float32)
        d[30:34, 30:34] = 0.0                     # hole
        filled = fill_depth_fast(d)
        assert (filled[31:33, 31:33] > 0.5).all()
        # existing valid depth stays in range
        assert abs(float(filled[5, 5]) - 0.8) < 0.1

    def test_leaves_empty_map_empty_enough(self):
        d = np.zeros((64, 64), np.float32)
        filled = fill_depth_fast(d)
        assert float(np.abs(filled).max()) < 3.1   # bounded by max_depth


class TestRealPbrMix:
    def _dataset_with_mix(self, mix):
        ds = object.__new__(PoseDataset)
        ds.mode = "train"
        ds.mix_real = mix
        ds.rng = np.random.RandomState(0)
        ds.real_annos = ["real"] * 10
        ds.pbr_annos = ["pbr"] * 10
        ds.annos = ds.real_annos + ds.pbr_annos
        return ds

    def test_mix_ratio(self):
        """~80% of picked records are real (ycbv_pbr.py:682-690)."""
        ds = self._dataset_with_mix(0.8)
        picks = [ds._pick_record(i % 20) for i in range(2000)]
        frac_real = np.mean([p == "real" for p in picks])
        assert 0.75 < frac_real < 0.85

    def test_no_mix_uses_index(self):
        ds = self._dataset_with_mix(None)
        assert ds._pick_record(3) == "real"
        assert ds._pick_record(13) == "pbr"


class TestFinalizeFill:
    def test_normals_from_filled_depth(self):
        """finalize_batch(fill_depth=True) computes normals on the filled
        plane (ycbv_pbr.py:477-486) — hole pixels get nonzero normals."""
        import jax.numpy as jnp

        from gdm_tpu.data.pipeline import finalize_batch

        S, N = 32, 64
        K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
        dpt = np.full((S, S), 0.5, np.float32)
        dpt[10:14, 10:14] = 0.0
        filled = fill_depth_fast(dpt)
        choose = np.arange(N).astype(np.int32) + 10 * S + 8
        batch = {
            "rgb_u8": jnp.zeros((1, S, S, 3), jnp.uint8),
            "dpt_m": jnp.asarray(dpt[None]),
            "dpt_filled": jnp.asarray(filled[None]),
            "K_crop": jnp.asarray(K[None]),
            "choose": jnp.asarray(choose[None]),
        }
        out_fill = finalize_batch(batch, fill_depth=True)
        out_raw = finalize_batch(batch, fill_depth=False)
        nrm_fill = np.asarray(out_fill["cld_rgb_nrm"][0, :, 6:9])
        nrm_raw = np.asarray(out_raw["cld_rgb_nrm"][0, :, 6:9])
        hole_rows = [i for i, c in enumerate(choose)
                     if 10 <= (c // S) < 14 and 10 <= (c % S) < 14]
        assert hole_rows
        # raw depth: hole pixels have no normals; filled: they do
        assert np.linalg.norm(nrm_raw[hole_rows], axis=1).max() < 1e-6
        assert np.linalg.norm(nrm_fill[hole_rows], axis=1).min() > 0.9
        # xyz still comes from the RAW depth in both (ycbv_pbr.py:506)
        np.testing.assert_allclose(
            np.asarray(out_fill["cld_rgb_nrm"][0, :, :3]),
            np.asarray(out_raw["cld_rgb_nrm"][0, :, :3]))
