from .postprocess import Intervals, apply_jaw_intervals, butter_lowpass_filtfilt
from .generate import AviTalkingPipeline, PipelineConfig
from .server import InferenceServer, ServingConfig
