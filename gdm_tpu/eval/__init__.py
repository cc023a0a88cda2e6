"""Eval layer: jitted on-device inference + pose recovery, host metric
bookkeeping (reference evaluator.py + utils/pvn3d_eval_utils_kpls.py +
lib/pysixd/pose_error.py main-path subset)."""

from gdm_tpu.eval.multimodel import make_multi_model_infer, select_tree, \
    stack_trees
from gdm_tpu.eval.pose_fit import fit_poses_from_outputs, icp_refine
from gdm_tpu.eval.metrics import (
    add_err,
    adi_err,
    re_err,
    te_err,
    proj_err,
    mssd_err,
    mspd_err,
    re_sym_err,
    te_sym_err,
    proj_sym_err,
    get_closest_rot,
    voc_auc,
)
from gdm_tpu.eval.evaluator import Evaluator
from gdm_tpu.eval.vsd import vsd_err, vsd_err_batch, vsd_recall
