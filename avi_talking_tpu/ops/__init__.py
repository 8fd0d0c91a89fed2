from .resample import linear_interpolate, resample_features
from .positional import (
    alibi_slopes,
    faceformer_bias,
    enc_dec_alignment_bias,
    periodic_positional_encoding,
    sinusoidal_positional_encoding,
    t5_relative_position_bucket,
)
from .transformer import (
    MultiHeadAttention,
    TransformerEncoderLayer,
    TransformerDecoderLayer,
    TransformerEncoder,
    TransformerDecoder,
)
