"""Model zoo: frozen regressors, CLIP, MUNIT, midu CNNs, diffusion backbones."""

from rgie_tpu.models.emotion import EmotionRegressor, create_regressor
from rgie_tpu.models.resnet import ResNet, init_resnet50, resnet50
