from .attention import fused_bias_attention, pallas_available
