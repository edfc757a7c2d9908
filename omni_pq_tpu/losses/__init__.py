from .supervised import (get_loss, compute_vote_loss, weighted_ce,
                         compute_physical_constraints_loss, get_2d_box_corners,
                         prefixes_for)
from .consistency import get_consistency_loss
from .gamma import (gamma_mixture_guide_criterion, gamma_mixture_em,
                    mixture_keep_mask, masked_quantile, gamma_logpdf)
from .arkit import get_arkit_pc_loss
from .teacher import get_loss_teacher, get_loss_mean_teacher
from .primitives import sigmoid_focal_loss
from .distance import calc_distance_vertically, distance_loss_gamma_mixture

__all__ = [
    "get_loss", "compute_vote_loss", "weighted_ce",
    "compute_physical_constraints_loss", "get_2d_box_corners", "prefixes_for",
    "get_consistency_loss", "gamma_mixture_guide_criterion",
    "gamma_mixture_em", "mixture_keep_mask", "masked_quantile",
    "gamma_logpdf", "get_arkit_pc_loss", "get_loss_teacher",
    "get_loss_mean_teacher", "sigmoid_focal_loss",
    "calc_distance_vertically", "distance_loss_gamma_mixture",
]
