from .brain import BrainNetwork
from .prior_transformer import PriorTransformerNetwork
from .diffusion import NoiseScheduler, DiffusionPrior
from .conditioning import EmotionStyleEncoder, StyleCondition
from .flint import FlintDecoder, FlintConfig
from .emote import EmoteConfig, EmoteTalkingHead
from .faceformer import FaceFormerConfig, FaceFormerCoeff
from .faceformer_vert import (
    FaceFormerVert,
    FaceFormerVertConfig,
    FlameRegionSelector,
    convert_coeff2verts,
    disentangle_losses,
)
from .fan_encoder import FanEncoder, fan_encoder_params_from_torch, mask_lip
from .pirender import FaceGenerator, PIRenderConfig, pirender_params_from_torch
from .clip_text import ClipTextConfig, ClipTextModel, clip_text_params_from_torch
from .resnet import ResNet50, resnet50_params_from_torch
from .emoca import (
    DecaEncoder,
    EmocaEncoder,
    EmoNetLoss,
    EmotionRecognitionModule,
    deca_encoder_params_from_torch,
    emoca_encoder_params_from_torch,
    emoca_pseudo_gt,
    split_deca_code,
)
from .flint_vae import (
    FlintEncoder,
    FlintVAE,
    FlintVQVAE,
    GumbelVectorQuantizer,
    VectorQuantizer,
)
from .decoders import DecoderConfig, FeedForwardDecoder
from .sequence_encoders import sequence_encoder_from_name
from .resnet_se import ResNetSE, resnet_se_params_from_torch
from .discriminator import (
    ImageDiscriminator,
    MultiscaleDiscriminator,
    NLayerDiscriminator,
)
