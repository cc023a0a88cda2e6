"""Pose-error metric tests (reference lib/pysixd/pose_error.py formulas)."""

import numpy as np
import pytest

import conftest  # noqa: F401

from gdm_tpu.eval.metrics import (
    add_err,
    adi_err,
    mspd_err,
    mssd_err,
    voc_auc,
)

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
rng = np.random.RandomState(0)
PTS = rng.randn(200, 3) * 0.05
I3 = np.eye(3)
T = np.array([0.0, 0.0, 1.0])


def rot_z(deg):
    th = np.deg2rad(deg)
    return np.array([[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])


class TestMSSD:
    def test_identity_zero(self):
        assert mssd_err(I3, T, I3, T, PTS) == 0.0

    def test_translation_is_max_norm(self):
        off = np.array([0.01, 0, 0])
        assert mssd_err(I3, T + off, I3, T, PTS) == pytest.approx(0.01)

    def test_symmetry_rescues_rotation(self):
        # square-symmetric object: 90-deg rotation is exact under syms
        syms = [(I3, np.zeros(3)), (rot_z(90), np.zeros(3)),
                (rot_z(180), np.zeros(3)), (rot_z(270), np.zeros(3))]
        e_nosym = mssd_err(rot_z(90), T, I3, T, PTS)
        e_sym = mssd_err(rot_z(90), T, I3, T, PTS, syms=syms)
        assert e_nosym > 0.01
        assert e_sym == pytest.approx(0.0, abs=1e-12)

    def test_max_not_mean(self):
        # one far outlier point dominates MSSD but not ADD
        pts = np.concatenate([PTS, [[1.0, 0, 0]]])
        e_mssd = mssd_err(rot_z(1), T, I3, T, pts)
        e_add = add_err(rot_z(1), T, I3, T, pts)
        assert e_mssd > 3 * e_add


class TestMSPD:
    def test_identity_zero(self):
        assert mspd_err(I3, T, I3, T, PTS, K) == 0.0

    def test_depth_translation_small(self):
        # pure z-shift changes projections little for centred objects;
        # lateral shift of the same size changes them a lot
        ez = mspd_err(I3, T + [0, 0, 0.05], I3, T, PTS, K)
        ex = mspd_err(I3, T + [0.05, 0, 0], I3, T, PTS, K)
        assert ex > 3 * ez

    def test_symmetry_min(self):
        syms = [(I3, np.zeros(3)), (rot_z(180), np.zeros(3))]
        assert mspd_err(rot_z(180), T, I3, T, PTS, K,
                        syms=syms) == pytest.approx(0.0, abs=1e-9)

    def test_dict_sym_format(self):
        syms = [{"R": I3, "t": np.zeros(3)},
                {"R": rot_z(180), "t": np.zeros((3, 1))}]
        assert mspd_err(rot_z(180), T, I3, T, PTS, K,
                        syms=syms) == pytest.approx(0.0, abs=1e-9)


class TestAuxMetrics:
    def test_adi_leq_add(self):
        e_add = add_err(rot_z(10), T, I3, T, PTS)
        e_adi = adi_err(rot_z(10), T, I3, T, PTS)
        assert e_adi <= e_add + 1e-12

    def test_voc_auc_extremes(self):
        assert voc_auc([0.0] * 10) == pytest.approx(100.0)
        assert voc_auc([1.0] * 10) == 0.0
        assert voc_auc([]) == 0.0


class TestSymAwareErrors:
    """re_sym/te_sym/proj_sym vs the reference's per-sym loop semantics
    (lib/pysixd/pose_error.py:184-259)."""

    def _syms(self):
        return [{"R": np.eye(3), "t": np.zeros(3)},
                {"R": rot_z(180), "t": np.array([0.0, 0.002, 0.0])}]

    def test_re_sym_picks_best_equivalent(self):
        from gdm_tpu.eval.metrics import re_err, re_sym_err

        R_est = rot_z(178)
        # plain re: 178 deg off identity GT; the 180-deg sym rescues it
        assert re_err(R_est, I3) == pytest.approx(178.0)
        assert re_sym_err(R_est, I3, self._syms()) == pytest.approx(2.0)
        # identity-only syms degrade to plain re
        assert re_sym_err(R_est, I3, None) == pytest.approx(178.0)

    def test_te_sym_uses_rotated_sym_offset(self):
        from gdm_tpu.eval.metrics import te_sym_err

        R_gt = rot_z(90)
        syms = self._syms()
        # reference: t_gt_sym = R_gt @ sym_t + t_gt
        want = min(np.linalg.norm(R_gt @ s["t"] + T - (T + 0.001))
                   for s in [{"t": np.zeros(3)},
                             {"t": np.array([0.0, 0.002, 0.0])}])
        got = te_sym_err(T + 0.001, T, R_gt, syms)
        assert got == pytest.approx(want)

    def test_proj_sym_matches_loop(self):
        from gdm_tpu.eval.metrics import proj_sym_err, transform_pts

        R_est, t_est = rot_z(5), T + np.array([0.003, 0, 0])
        syms = self._syms()

        def proj(pts, R, t):
            pc = transform_pts(pts, R, t) @ K.T
            return pc[:, :2] / pc[:, 2:3]

        pe = proj(PTS, R_est, t_est)
        want = min(
            np.linalg.norm(
                pe - proj(PTS, I3 @ s["R"], I3 @ s["t"] + T), axis=1
            ).mean()
            for s in syms)
        got = proj_sym_err(R_est, t_est, I3, T, PTS, K, syms)
        assert got == pytest.approx(want)
