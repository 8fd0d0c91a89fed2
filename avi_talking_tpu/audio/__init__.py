from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from .import_hf import wav2vec2_params_from_torch
from .frontend import frame_audio, normalize_audio, read_wav, load_audio_frames
from .specaugment import compute_mask_indices
