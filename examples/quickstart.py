"""Quickstart: instruction-driven talking-head synthesis end to end.

Runs with random weights out of the box (tiny config on CPU); switch to the
full-size config + imported checkpoints for real outputs. Usage:

    python examples/quickstart.py [--full]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="full-size models")
    ap.add_argument("--wav", default=None, help="wav path (default: synthetic tone)")
    args = ap.parse_args()

    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.pipeline import AviTalkingPipeline, PipelineConfig

    cfg = PipelineConfig() if args.full else PipelineConfig.tiny()
    assets = synthetic_assets(n_shape=cfg.emote.n_shape, n_exp=cfg.emote.n_exp)
    pipe = AviTalkingPipeline.random_init(cfg, flame_assets=assets)

    if args.wav:
        wav = args.wav
    else:
        t = np.linspace(0, 2.0, 32000, endpoint=False)
        wav = (np.sin(2 * np.pi * 180 * t) * 0.4).astype(np.float32)

    out = pipe.generate(wav, "A fairly angry man speaks with brow fairly down")
    print("frames:", out["exp"].shape[0])
    print("exp:", out["exp"].shape, "jaw:", out["jaw"].shape)
    print("vertices:", out["vertices"].shape)
    print("style embedding head:", np.round(out["style_emb"][:6], 4))

    # batched serving
    outs = pipe.generate_batch([wav, wav], ["an angry face", "a happy face"])
    print("batched:", [o["exp"].shape for o in outs])

    # render a short normal-map video (PNG frames without ffmpeg)
    from avi_talking_tpu.viz import FlameVisualizer

    viz = FlameVisualizer(np.asarray(assets.faces), image_size=128)
    path = viz.visualize_verts(out["vertices"][:16], "quickstart_out.mp4")
    print("video/frames at:", path)


if __name__ == "__main__":
    main()
