from .attention import fused_bias_attention, pallas_available
from .rasterize import rasterize_tiles_visibility
