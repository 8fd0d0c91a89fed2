"""Full-size smoke: real-dims stack through generate() once on CPU.

Closes the tiny-config blind spot (verdict weak #5): the default
PipelineConfig (wav2vec2-base 12x768, CLIP-base text tower, 128-d prior,
FLAME at 5023 vertices via synthetic assets) must trace, compile and produce
finite outputs end to end — catching shape/dtype drift the tiny configs
hide. Weights are random; only shapes/finiteness are asserted.
"""

import numpy as np
import pytest

import jax

from avi_talking_tpu.core import synthetic_assets
from avi_talking_tpu.pipeline.generate import AviTalkingPipeline, PipelineConfig


@pytest.mark.slow
def test_fullsize_generate_smoke():
    cfg = PipelineConfig()  # real dims everywhere
    assets = synthetic_assets(
        num_vertices=5023, num_faces=9976,
        n_shape=cfg.emote.n_shape, n_exp=cfg.emote.n_exp,
    )
    pipe = AviTalkingPipeline.random_init(cfg, flame_assets=assets)

    sr = 16_000
    t = np.linspace(0, 1.0, sr, endpoint=False)
    wav = (0.25 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    out = pipe.generate(wav, "a happy person speaks with raised brow", seed=0)
    T = out["exp"].shape[0]
    lfs = cfg.emote.flint.latent_frame_size
    assert T % lfs == 0 and T >= 25  # ~1s @25fps, padded to FLINT multiple
    assert out["exp"].shape == (T, cfg.emote.n_exp)
    assert out["jaw"].shape == (T, 3)
    assert out["style_emb"].shape == (cfg.clip_size,)
    assert out["vertices"].shape == (T, 5023, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # vertices move over time (audio actually drives the face)
    motion = np.abs(np.diff(np.asarray(out["vertices"]), axis=0)).max()
    assert motion > 0
