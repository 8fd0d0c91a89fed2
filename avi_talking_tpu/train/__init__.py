from .losses import soft_clip_loss, cosine_anneal, batchwise_cosine_similarity, topk_accuracy
from .prior import PriorTrainState, PriorTrainer, make_prior_optimizer, one_cycle_schedule
from .talking_head import TalkingHeadTrainer
from .landmark_losses import (
    eyed_loss,
    lipd_loss,
    mouth_corner_loss,
    landmark_loss,
    weighted_landmark_loss,
)
from .perceptual import PerceptualLoss, Vgg19Features, vgg19_params_from_torch
from .eval_metrics import style_diversity, vertex_l2, lip_vertex_error, condition_exchange
