from .losses import soft_clip_loss, cosine_anneal, batchwise_cosine_similarity, topk_accuracy
from .prior import PriorTrainState, PriorTrainer, make_prior_optimizer, one_cycle_schedule
from .talking_head import TalkingHeadTrainer
