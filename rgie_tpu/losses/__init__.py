"""Loss library: emotion/VA losses, guidance scores, GAN losses, CLIP recon."""

from rgie_tpu.losses.emotion_loss import (
    ValenceArousalLoss,
    condition_from_alpha,
    default_target,
)
from rgie_tpu.losses.guidance_scores import (
    arousal_score,
    valence_arousal_score,
    valence_score,
)
