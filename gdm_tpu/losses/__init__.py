"""Loss functions: focal segmentation, masked circle matching, uncertainty
multitask weighting (reference models/loss.py)."""

from gdm_tpu.losses.focal import focal_loss
from gdm_tpu.losses.circle import circle_loss, masked_logsumexp
from gdm_tpu.losses.matching import (
    matching_positive_mask,
    matching_positive_mask_sym,
    pointwise_matching_loss,
)
from gdm_tpu.losses.awl import AutomaticWeightedLoss
